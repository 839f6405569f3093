#!/usr/bin/env python
"""spark-submit entry point: run the extraction pipeline from engine.zip.

Usage:
  spark-submit --master local[8] --py-files dist/engine.zip \\
      bench/submit_job.py <corpus_dir> <out_dir>

Imports engine ONLY from --py-files (no repo path inserted) — proves the
packaging is self-contained for a real cluster submit.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from engine.io import materialize_run  # resolved from --py-files zip


def main() -> None:
    corpus_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spans = spark.read.parquet(f"{corpus_dir}/spans")
    blobs = spark.read.parquet(f"{corpus_dir}/media_blobs")
    t0 = time.time()
    out = materialize_run(spark, spans, blobs, out_dir, run_id="submit")
    n = out["spans_out"].count()
    kept = out["metrics"].agg(F.sum("spans_kept")).collect()[0][0]
    print(json.dumps({"docs": n, "spans_kept": int(kept), "seconds": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
