"""Streaming-mode test: micro-batched file stream produces exactly the batch
outputs (same code path, ordering from offset, lineage complete); restart with
a checkpoint does not duplicate."""

from __future__ import annotations

from engine.fixtures import write_corpus
from engine.streaming import stream_extraction


def test_stream_matches_batch(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    # many small files → several micro-batches
    write_corpus(corpus_dir, n_docs=40, seed=21, docs_per_file=5)
    blobs = spark.read.parquet(f"{corpus_dir}/media_blobs")

    q = stream_extraction(
        spark, f"{corpus_dir}/spans", blobs, out_dir, run_id="s1", max_files_per_trigger=2
    )
    q.awaitTermination(180)

    got = spark.read.parquet(f"{out_dir}/spans_out")
    assert got.count() == 40

    # identical to the batch run, doc by doc
    from engine.pipeline import run_extraction

    batch = run_extraction(
        spark, spark.read.parquet(f"{corpus_dir}/spans"), blobs, run_id="b1"
    )
    def as_map(df):
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans_out"]]
            for r in df.collect()
        }

    assert as_map(got) == as_map(batch.spans_out)

    lineage = spark.read.parquet(f"{out_dir}/lineage")
    spans_total = (
        spark.read.parquet(f"{corpus_dir}/spans")
        .selectExpr("sum(size(spans)) s")
        .collect()[0]["s"]
    )
    assert lineage.count() == spans_total

    # restart over the same checkpoint: backlog already consumed → no dupes
    q2 = stream_extraction(
        spark, f"{corpus_dir}/spans", blobs, out_dir, run_id="s2", max_files_per_trigger=2
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out_dir}/spans_out").count() == 40
