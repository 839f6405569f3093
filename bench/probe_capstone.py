#!/usr/bin/env python
"""Instrumented probe for the capstone's in-bench inflation (VERDICT r5 #1).

Replays bench.py's interleaved headline loop EXACTLY (same session settings,
same noop sink, same query order) but records, before/after every
x_curate_interleaved_spans run:

  - persistent-RDD count and total cached memory/disk bytes (storage
    accumulation hypothesis — the judge's suspect), via the JVM
    sc.getRDDStorageInfo;
  - the CodeGenerator class-cache stats hit/miss counts if reachable
    (codegen-eviction hypothesis: 16 intervening queries evict the
    capstone's ~dozens of generated classes from the 100-entry cache so
    every in-bench repeat recompiles them);
  - wall seconds.

Modes (argv[1]):
  interleaved  - bench.py-identical round-robin over HEADLINE (default)
  solo         - capstone back-to-back x REPEATS (the §4p steady-state probe)

Prints one JSON line; does not touch bench.py (frozen).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import engine.entry  # noqa: E402,F401
import engine.trainops  # noqa: E402,F401
from engine.relational import registry  # noqa: E402
from engine.session import get_spark  # noqa: E402

HEADLINE = [
    "a1_hash_agg_pricing",
    "x_table_parse_service",
    "dedup_embedding_cosine",
    "j1_join_broadcast_dims",
    "w1_lag_dedup",
    "a6_value_histogram",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "text_tokens_bpe",
    "x_text_branch_extraction",
    "train_corpus_filtered",
    "x_curate_interleaved_spans",
    "text_dsir_select",
]

CAPSTONE = "x_curate_interleaved_spans"


def storage_stats(spark) -> dict:
    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    n = len(infos)
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    return {"persistent_rdds": n, "mem_bytes": int(mem), "disk_bytes": int(disk)}


def codegen_stats(spark) -> dict:
    """CodeGenerator's class cache + compilation-time accumulator (public
    object fields, reached through the py4j JVM view)."""
    jvm = spark.sparkContext._jvm
    out = {}
    try:
        cg = jvm.org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        st = cg.cache().stats()
        out["codegen_hits"] = int(st.hitCount())
        out["codegen_misses"] = int(st.missCount())
        out["codegen_evictions"] = int(st.evictionCount())
        out["compile_time_ms"] = int(cg.compileTime().sum() / 1_000_000)
    except Exception as e:  # cache field may be private in this build
        out["codegen_err"] = str(e)[:120]
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "interleaved"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    os.environ.setdefault("SPARK_GRAFT_PIN_HEAP", "1")
    spark = get_spark("probe-capstone", cores=cpus)
    builders = {q.name: q.build for q in registry()}

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    builders["a6_value_histogram"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    samples = []
    names = HEADLINE if mode == "interleaved" else [CAPSTONE]
    for rnd in range(repeats):
        for name in names:
            pre = {}
            if name == CAPSTONE:
                pre = {**storage_stats(spark), **codegen_stats(spark)}
            t0 = time.time()
            df = builders[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name == CAPSTONE:
                post = {**storage_stats(spark), **codegen_stats(spark)}
                samples.append(
                    {"round": rnd, "seconds": dt, "pre": pre, "post": post}
                )
    print(json.dumps({"mode": mode, "capstone_samples": samples}))


if __name__ == "__main__":
    main()
