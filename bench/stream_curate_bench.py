#!/usr/bin/env python
"""Streaming curation front bench: docs/s through ``stream_curate``
(row-local quality/repetition verdicts + watermarked exact dedup) on a
file-source micro-batched drain, next to the batch equivalent (same verdict
filter + batch exact dedup) over the IDENTICAL corpus in the same process —
the delta is micro-batch orchestration + state-store cost, the regression
this bench exists to catch.  Standard receipts: md5 burns, best-of-N with
fresh checkpoints.  Writes BENCH/stream_curate_r5.json."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from engine.session import get_spark  # noqa: E402

TILES = 20
N_FILES = 16
REPEATS = 2


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_PIN_HEAP", "1")
    spark = get_spark("stream-curate-bench", cores=32)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    tiled = None
    for t in range(TILES):
        tile = base.select(
            (F.col("doc_id") + F.lit(t * 1_000_000)).alias("doc_id"), "text"
        )
        tiled = tile if tiled is None else tiled.unionByName(tile)
    # deterministic event time inside one watermark hour
    tiled = tiled.withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-01-01 10:00:00"))
        + F.make_interval(secs=F.col("doc_id") % 3000),
    )
    cdir = tempfile.mkdtemp(prefix="stream-curate-corpus-")
    tiled.repartition(N_FILES).write.mode("overwrite").parquet(cdir)
    n_docs = spark.read.parquet(cdir).count()

    from engine.streaming import stream_curate
    from engine.trainops import quality_flag_col, repetition_flag_col

    def batch_arm(tag):
        # SYMMETRIC with the stream arm: same verdict filter + exact dedup,
        # AND the same parquet sink + read-back count — so the measured
        # delta is micro-batch orchestration + state-store cost, not
        # unmatched sink I/O (the first cut of this bench charged the
        # write only to the stream arm and overstated the overhead)
        d = spark.read.parquet(cdir)
        lab = d.withColumn(
            "pre",
            F.coalesce(
                F.when(quality_flag_col(), "quality"),
                F.when(repetition_flag_col(), "repetition"),
            ),
        )
        kept = lab.filter(F.col("pre").isNull()).drop("pre")
        out = tempfile.mkdtemp(prefix=f"batch-curate-out-{tag}-")
        kept.dropDuplicates(["text"]).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        fps = {r["fp"] for r in spark.read.parquet(out)
               .select(F.md5("text").alias("fp")).collect()}
        shutil.rmtree(out, ignore_errors=True)
        return n, fps

    def stream_arm(tag):
        schema = spark.read.parquet(cdir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(cdir)
        )
        out = tempfile.mkdtemp(prefix=f"stream-curate-out-{tag}-")
        ck = tempfile.mkdtemp(prefix=f"stream-curate-ck-{tag}-")
        q = (
            stream_curate(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        n = spark.read.parquet(out).count()
        fps = {r["fp"] for r in spark.read.parquet(out)
               .select(F.md5("text").alias("fp")).collect()}
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        return n, fps

    b0 = burn()
    best = {}
    kept_counts = {}
    fp_sets = {}
    for r in range(REPEATS):
        t0 = time.time()
        n_stream, fp_s = stream_arm(f"r{r}")
        dt = time.time() - t0
        if "stream" not in best or dt < best["stream"]:
            best["stream"] = round(dt, 2)
        kept_counts["stream"] = n_stream
        fp_sets["stream"] = fp_s

        t0 = time.time()
        n_batch, fp_b = batch_arm(f"r{r}")
        dt = time.time() - t0
        if "batch" not in best or dt < best["batch"]:
            best["batch"] = round(dt, 2)
        kept_counts["batch"] = n_batch
        fp_sets["batch"] = fp_b

    # survivor-set equivalence: the actual kept FINGERPRINT SETS must be
    # identical (a count compare certifies much less)
    assert fp_sets["stream"] == fp_sets["batch"], kept_counts
    res = {
        "docs": n_docs,
        "kept": kept_counts["stream"],
        "best_seconds": best,
        "docs_per_sec": {k: round(n_docs / v, 1) for k, v in best.items()},
        "overhead_x": round(best["stream"] / best["batch"], 2),
        "files": N_FILES,
        "max_files_per_trigger": 4,
        "burns": [b0, burn()],
        "repeats": REPEATS,
    }
    shutil.rmtree(cdir, ignore_errors=True)
    (REPO / "BENCH" / "stream_curate_r5.json").write_text(json.dumps(res, indent=1))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
