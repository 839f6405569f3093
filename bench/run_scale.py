#!/usr/bin/env python
"""One scaling-run: extraction pipeline at a given parallelism, JSON to stdout.

Invoked by bench/scaling.py in a fresh process per parallelism level (Spark
master can't change within a JVM).  Timing excludes session startup, corpus
generation, and plan warm-up: it measures the extraction job only.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from engine.pipeline import run_extraction  # noqa: E402
from engine.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--arrow-batch",
        type=int,
        default=None,
        help="override arrow.maxRecordsPerBatch (raster corpora: ~120 KB/payload "
        "→ cap the batch so a task never pins hundreds of MB)",
    )
    args = ap.parse_args()

    extra = (
        {"spark.sql.execution.arrow.maxRecordsPerBatch": str(args.arrow_batch)}
        if args.arrow_batch
        else None
    )
    import os

    os.environ.setdefault("SPARK_GRAFT_PIN_HEAP", "1")  # steady-state bench heap
    spark = get_spark(
        f"scale-{args.cores}",
        cores=args.cores,
        extra_conf=extra,
    )
    spans = spark.read.parquet(f"{args.corpus}/spans")
    blobs = spark.read.parquet(f"{args.corpus}/media_blobs")
    n_docs = spans.count()
    # Full untimed warm-up run: a bare count() warms only the spans scan —
    # the first extraction still pays Python worker spawn + numpy import +
    # codegen/JIT of the decode path, which dominates a SHORT job at high
    # core counts and fakes sub-linear scaling (measured: bitmap local[8]
    # 49.7 s cold-per-process vs 17.1 s with a warm first run).
    warm = run_extraction(spark, spans, blobs, run_id=f"warm-{args.cores}")
    warm.spans_out.write.format("noop").mode("overwrite").save()
    warm.unpersist()

    best = None
    for _ in range(args.runs):
        t0 = time.time()
        res = run_extraction(spark, spans, blobs, run_id=f"scale-{args.cores}")
        row = res.spans_out.agg(
            F.count("*").alias("docs"), F.sum(F.size("spans_out")).alias("spans")
        ).collect()[0]
        dt = time.time() - t0
        res.unpersist()
        assert row["docs"] == n_docs
        if best is None or dt < best:
            best = dt
    print(
        json.dumps(
            {
                "cores": args.cores,
                "docs": n_docs,
                "seconds": round(best, 2),
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
