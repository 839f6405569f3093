#!/usr/bin/env python
"""Interleaved A/B: dedup_simhash vs dedup_minhash_lsh (VERDICT r4 ask #5).

Round-4 bench read dedup_simhash at 2.38 s vs its r2 best of 1.54 s (1.54x)
against only a ~1.2x host burn factor, while dedup_minhash_lsh returned to
band — so the question is whether the simhash/minhash RATIO moved (engine
regression) or both numbers rode the same host window (noise).

Protocol per the repo's bench discipline (BENCH/BASELINE.md §4): both queries
run interleaved A/B/A/B... in ONE process on one SparkSession, best-of-N,
single-core md5 burn receipts before/after.  Also dumps whether the simhash
aggregate stage fell out of whole-stage codegen (the r4 hypothesis: the
16-term signed-bit-sum expression tree is wide).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import engine.trainops  # noqa: E402,F401
from engine.relational import registry  # noqa: E402
from engine.session import get_spark  # noqa: E402


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    spark = get_spark("ab-simhash", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    by_name = {q.name: q.build for q in registry()}
    qs = {name: by_name[name] for name in ("dedup_simhash", "dedup_minhash_lsh")}

    # warm both paths once (JIT, file listing, broadcast) outside timing
    for fn in qs.values():
        fn(spark, sf_dir).count()

    b0 = burn()
    walls: dict[str, list[float]] = {k: [] for k in qs}
    for r in range(rounds):
        for name, fn in qs.items():
            t0 = time.time()
            fn(spark, sf_dir).count()
            walls[name].append(round(time.time() - t0, 3))
    b1 = burn()

    best = {k: min(v) for k, v in walls.items()}
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "walls": walls,
        "best": best,
        "ratio_simhash_over_minhash": round(
            best["dedup_simhash"] / best["dedup_minhash_lsh"], 3
        ),
        "host_burn_seconds": {"before": b0, "after": b1},
        "r2_best": {"dedup_simhash": 1.539, "dedup_minhash_lsh": 2.178, "ratio": 0.707},
        "r4_best": {"dedup_simhash": 2.376, "dedup_minhash_lsh": 2.548, "ratio": 0.933},
    }
    print(json.dumps(out))

    # codegen check: did the wide 16-sum aggregate fall back to interpreted?
    # Two traps: executedPlan().toString() under AQE prints the initial plan
    # with no WSCG markers, and even explain mode "codegen" reports
    # "Found 0 subtrees" while AdaptiveSparkPlan wraps the query — so probe
    # with AQE off (plan shape is identical; AQE only re-plans at runtime).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = qs["dedup_simhash"](spark, sf_dir)
        ex = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
        head = ex.splitlines()[0] if ex else "no explain output"
        sys.stderr.write(f"simhash codegen (AQE off): {head}\n")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
