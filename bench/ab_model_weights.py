#!/usr/bin/env python
"""Interleaved A/B: model-quality scorer — closed-form expression vs the
broadcast (bucket → weight) join a LEARNED model deploys as (round-5 close).

A = quality_model_score: the shipped row-local expression — per-token weight
    computed inline (md5 → 16-bit bucket → Knuth mix), zero exchanges.
B = quality_model_score_join: explode tokens → broadcast hash join against a
    65,536-row weight table → per-doc integer sum; the corpus side is
    exchange-free up to the join, then ONE (doc_id, partial_sum) exchange.
    Equality to A is pinned by
    tests/test_trainops_plans.py::test_quality_model_join_matches_closed_form.

One process, one SparkSession, A/B/A/B best-of-R, md5 burn receipts
(BENCH/BASELINE.md discipline).  The question this answers (PLANS.md §5a):
what does shipping the model as DATA instead of an EXPRESSION cost — i.e.
is the expression form a real optimization or just a sandbox artifact?"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import engine.trainops as trainops  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-model-weights", cores=32, shuffle_partitions=32)
    b0 = burn()
    # 32-split copy: the documents table is one parquet file, which would cap
    # BOTH variants' scan stage at 1 task and hide the shapes' real relative
    # cost (PLANS.md §4 "input split granularity" lesson).
    docs_dir = "/tmp/ab_model_docs"
    trainops.load(spark, SF_DIR, "documents").repartition(32).write.mode(
        "overwrite"
    ).parquet(docs_dir)
    docs = spark.read.parquet(docs_dir)
    weights = trainops.quality_model_weights(spark)

    variants = {
        "closed_form": lambda: trainops.quality_model_score(docs),
        "broadcast_join": lambda: trainops.quality_model_score_join(docs, weights),
    }

    def run(mk) -> float:
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for mk in variants.values():  # warm both plan shapes
        run(mk)
    walls: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(rounds):
        for vname, mk in variants.items():
            walls[vname].append(run(mk))

    best = {k: min(w) for k, w in walls.items()}
    out = {
        "sf_dir": SF_DIR,
        "rounds": rounds,
        "walls": walls,
        "best": best,
        "join_over_closed": round(best["broadcast_join"] / best["closed_form"], 3),
        "host_burn_seconds": {"before": b0, "after": burn()},
    }
    print(json.dumps(out))
    (REPO / "BENCH" / "ab_model_weights_r5.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
