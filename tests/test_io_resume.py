"""Checkpoint/resume tests (S4/S5, X5): the spine is written once, outputs are
derived from the written copy, and a restart only processes unfinished docs."""

from __future__ import annotations

import pyspark.sql.functions as F

from engine.io import materialize_run
from engine.schema import MEDIA_BLOBS_SCHEMA, SPANS_SCHEMA


def _corpus_half(spark, corpus, lo, hi):
    spans_rows, blob_rows = corpus
    spans = spark.createDataFrame(spans_rows[lo:hi], SPANS_SCHEMA)
    blobs = spark.createDataFrame(blob_rows, MEDIA_BLOBS_SCHEMA)
    return spans, blobs


def test_materialize_and_resume(spark, corpus, tmp_path):
    out = str(tmp_path / "run")
    spans_rows, _ = corpus

    # first run: only the first 30 docs arrive
    spans1, blobs = _corpus_half(spark, corpus, 0, 30)
    r1 = materialize_run(spark, spans1, blobs, out, run_id="r1")
    assert r1["spans_out"].count() == 30

    # restart with the FULL input: only the remaining 30 docs are processed
    spans_all, _ = _corpus_half(spark, corpus, 0, 60)
    r2 = materialize_run(spark, spans_all, blobs, out, run_id="r2")
    assert r2["spans_out"].count() == 60

    # lineage still accounts for every input span exactly once
    total_spans = sum(len(r["spans"]) for r in spans_rows)
    assert r2["lineage"].count() == total_spans
    assert r2["lineage"].select("doc_id", "offset").distinct().count() == total_spans

    # outputs equal a from-scratch single-shot run (resume is invisible)
    from engine.pipeline import run_extraction

    single = run_extraction(spark, spans_all, blobs, run_id="one")
    a = {
        (r["doc_id"]): [(s["kind"], s["text"], s["media_ref"]) for s in r["spans_out"]]
        for r in r2["spans_out"].collect()
    }
    b = {
        (r["doc_id"]): [(s["kind"], s["text"], s["media_ref"]) for s in r["spans_out"]]
        for r in single.spans_out.collect()
    }
    assert a == b
