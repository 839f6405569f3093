"""Distributed generation equals local generation — the coordination-free
property that makes in-place corpus generation valid at any scale."""

from __future__ import annotations

from engine.fixtures import corpus_rows, spark_corpus


def test_spark_corpus_matches_local(spark):
    spans_df, blobs_df = spark_corpus(spark, 25, seed=9, partitions=5)
    local_spans, local_blobs = corpus_rows(25, seed=9)

    got_spans = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in spans_df.collect()
    }
    want_spans = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in local_spans
    }
    assert got_spans == want_spans

    got_blobs = {r["media_ref"]: bytes(r["payload"]) for r in blobs_df.collect()}
    want_blobs = {b["media_ref"]: b["payload"] for b in local_blobs}
    assert got_blobs == want_blobs
