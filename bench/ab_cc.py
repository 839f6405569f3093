#!/usr/bin/env python
"""Interleaved A/B: connected_components convergence protocols (round 5).

A = r4 protocol: per-hop neighbor-min propagation, convergence detected by a
    STATIC WINDOW (comp unchanged vs the previous cadence checkpoint) — needs
    one full extra no-change window to fire.
B = r5 protocol: neighbor-min + pointer jumping per iteration, convergence
    detected by a DIRECT FIXPOINT TEST (count of docs a neighbor still
    improves) at each cadence checkpoint.

Both run the real downstream queries (`train_corpus_filtered` flagship and
`dedup_components`) in ONE process on one SparkSession, interleaved
A/B/A/B..., best-of-N, with single-core md5 burn receipts — per the repo
bench discipline (BENCH/BASELINE.md §4).  A is reproduced here verbatim from
the r4 engine code and monkeypatched over trainops.connected_components; the
engine itself ships only B.  Structural receipts (iterations / checkpoint
jobs / convergence checks) come from the stats dict and are host-noise
immune.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

import engine.trainops as trainops  # noqa: E402
from engine.relational import registry  # noqa: E402
from engine.session import get_spark  # noqa: E402


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


CC_STATS: dict = {}


def cc_window(
    edges: DataFrame,
    max_iterations: int = 24,
    check_every: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """The r4 loop, verbatim semantics: per-hop propagation + static-window
    change detection (no pointer jump, no fixpoint test)."""
    if stats is None:
        stats = {}
    spark = edges.sparkSession
    sc = spark.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def truncate(df: DataFrame) -> DataFrame:
        if not reliable:
            return df.localCheckpoint(eager=True)
        return trainops._reliable_checkpoint(df)

    edges = truncate(edges)
    comp = truncate(
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
    )
    last_checked = comp
    iterations = checks = 0
    converged = False
    for it in range(1, max_iterations + 1):
        nb = (
            edges.join(
                comp.select(
                    F.col("doc_id").alias("nb_id"), F.col("comp").alias("nb_comp")
                ),
                edges["doc_b"] == F.col("nb_id"),
            )
            .groupBy("doc_a")
            .agg(F.min("nb_comp").alias("nb_comp"))
        )
        comp = comp.join(nb, comp["doc_id"] == nb["doc_a"], "left").select(
            "doc_id",
            F.least(F.col("comp"), F.coalesce(F.col("nb_comp"), F.col("comp"))).alias(
                "comp"
            ),
        )
        iterations = it
        if it % check_every == 0 or it == max_iterations:
            comp = truncate(comp)
            checks += 1
            changed = (
                comp.alias("n")
                .join(last_checked.alias("o"), "doc_id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            if changed == 0:
                converged = True
                break
            last_checked = comp
    stats.update(iterations=iterations, convergence_checks=checks, converged=converged)
    CC_STATS.update(stats)
    if not converged:
        raise RuntimeError("did not converge")
    return comp


def cc_fixpoint_wrapped(edges, **kw):
    stats = kw.pop("stats", None) or {}
    out = _REAL_CC(edges, stats=stats, **kw)
    CC_STATS.update(stats)
    return out


_REAL_CC = trainops.connected_components


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    spark = get_spark("ab-cc", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    by_name = {q.name: q.build for q in registry()}
    queries = ["train_corpus_filtered", "dedup_components"]
    modes = {"window_r4": cc_window, "fixpoint_r5": cc_fixpoint_wrapped}

    # warm both query paths once (JIT, file listing) outside timing
    for q in queries:
        by_name[q](spark, sf_dir).count()

    b0 = burn()
    walls: dict[str, list[float]] = {}
    structure: dict[str, dict] = {}
    for _ in range(rounds):
        for mode_name, cc in modes.items():
            trainops.connected_components = cc
            try:
                for q in queries:
                    CC_STATS.clear()
                    t0 = time.time()
                    by_name[q](spark, sf_dir).count()
                    walls.setdefault(f"{q}/{mode_name}", []).append(
                        round(time.time() - t0, 3)
                    )
                    structure[f"{q}/{mode_name}"] = dict(CC_STATS)
            finally:
                trainops.connected_components = _REAL_CC
    b1 = burn()

    best = {k: min(v) for k, v in walls.items()}
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "walls": walls,
        "best": best,
        "speedup": {
            q: round(best[f"{q}/window_r4"] / best[f"{q}/fixpoint_r5"], 3)
            for q in queries
        },
        "cc_structure": structure,
        "host_burn_seconds": {"before": b0, "after": b1},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
