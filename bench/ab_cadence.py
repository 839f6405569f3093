#!/usr/bin/env python
"""Interleaved A/B: CC convergence-test cadence — fixed vs exponential (r5).

The PLANS.md §5a round-6 candidate: double the check interval after each
failed check (3, 6, 12, ...) to save test-join jobs on deep graphs.

Probing it naively (``check_every=6``) is NOT the experiment: truncation and
testing share the cadence in the shipped loop, and ``comp`` is referenced
2-3× per iteration (neighbor join + pointer jump), so the unmaterialized
plan GROWS GEOMETRICALLY with the window — ``check_every=6`` hit Catalyst
analysis blowup (multi-minute planning, killed) before any execution cost
could even be measured.  Truncation cadence is therefore pinned at 3 in BOTH
arms; the exponential schedule applies to the CONVERGENCE TEST only:

A = shipped loop (engine/trainops.connected_components): truncate every 3
    iterations, fixpoint-test at every truncation.
B = exponential-test variant: truncate every 3 iterations, fixpoint-test at
    iterations 3, 9, 21, ... (gap doubles after each failed test).

Cost model being tested: B saves one edges×labels count job per skipped
test, but pays overshoot — a graph converging at iteration k in
(last_test, next_test) keeps iterating (nb join + jump join + truncation
checkpoints) until the next scheduled test.  The chainy interleaved-capstone
graph converges at 12 (detected at 12 by A; B's tests land at 3, 9, 21 → 9
wasted iterations + 3 wasted checkpoints).  The flagship LSH-clique graph
converges at 3, where both arms are identical.

Same discipline as ab_cc.py: one process, one SparkSession, interleaved
rounds, best-of-N, md5 burn receipts, structural stats host-noise-immune.
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

import engine.entry  # noqa: E402,F401  (populates the local registry)
import engine.trainops as trainops  # noqa: E402
from engine.relational import local_registry, registry  # noqa: E402
from engine.session import get_spark  # noqa: E402


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


CC_STATS: dict = {}

_REAL_CC = trainops.connected_components


def cc_exponential_test(
    edges: DataFrame,
    max_iterations: int = 48,
    check_every: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Shipped semantics, exponential TEST schedule, fixed truncation cadence.

    Truncates every ``check_every`` iterations (plan-size control — not
    optional, see module docstring); runs the fixpoint test only when the
    iteration hits the exponential schedule 3, 9, 21, ... (gap doubles after
    each failed test).  Higher max_iterations than the shipped default: the
    schedule itself overshoots, and hitting the cap forces a test anyway.
    """
    if stats is None:
        stats = {}
    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def truncate(df: DataFrame) -> DataFrame:
        if not reliable:
            return df.localCheckpoint(eager=True)
        return trainops._reliable_checkpoint(df)

    def nb_min(frontier: DataFrame) -> DataFrame:
        return (
            edges.join(
                frontier.select(
                    F.col("doc_id").alias("nb_id"), F.col("comp").alias("nb_comp")
                ),
                edges["doc_b"] == F.col("nb_id"),
            )
            .groupBy("doc_a")
            .agg(F.min("nb_comp").alias("nb_comp"))
        )

    edges = truncate(edges)
    comp = truncate(
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
    )
    iterations = checks = truncations = 0
    converged = False
    jump = False
    test_gap = check_every
    next_test = check_every
    for it in range(1, max_iterations + 1):
        nb = nb_min(comp)
        comp = comp.join(nb, comp["doc_id"] == nb["doc_a"], "left").select(
            "doc_id",
            F.least(F.col("comp"), F.coalesce(F.col("nb_comp"), F.col("comp"))).alias(
                "comp"
            ),
        )
        if jump:
            ptr = comp.select(
                F.col("doc_id").alias("p_id"), F.col("comp").alias("p_comp")
            )
            comp = (
                comp.alias("c")
                .join(ptr, F.col("c.comp") == F.col("p_id"), "left")
                .select(
                    F.col("c.doc_id").alias("doc_id"),
                    F.least(
                        F.col("c.comp"), F.coalesce(F.col("p_comp"), F.col("c.comp"))
                    ).alias("comp"),
                )
            )
        iterations = it
        if it % check_every == 0 or it == max_iterations:
            comp = truncate(comp)
            truncations += 1
            if it >= next_test or it == max_iterations:
                checks += 1
                cur = comp.select(
                    F.col("doc_id").alias("fx_id"), F.col("comp").alias("fx_comp")
                )
                improving = (
                    nb_min(comp)
                    .join(cur, F.col("doc_a") == F.col("fx_id"))
                    .filter(F.col("nb_comp") < F.col("fx_comp"))
                    .count()
                )
                if improving == 0:
                    converged = True
                    break
                jump = True
                test_gap *= 2
                next_test = it + test_gap
    stats.update(
        iterations=iterations,
        convergence_checks=checks,
        truncations=truncations,
        converged=converged,
        pointer_jump_engaged=jump,
    )
    CC_STATS.update(stats)
    if not converged:
        raise RuntimeError("did not converge")
    return comp


def cc_shipped_wrapped(edges, **kw):
    stats = kw.pop("stats", None) or {}
    out = _REAL_CC(edges, stats=stats, **kw)
    CC_STATS.update(stats)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    spark = get_spark("ab-cadence", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    by_name = {q.name: q.build for q in list(registry()) + list(local_registry())}
    # chainy organic graph (12 iters) + flagship clique graph (3 iters)
    queries = ["train_curate_interleaved", "train_corpus_filtered"]
    modes = {"fixed_test": cc_shipped_wrapped, "exp_test": cc_exponential_test}

    for q in queries:
        by_name[q](spark, sf_dir).count()  # warm

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
        "exp_over_fixed": {
            q: round(best[f"{q}/exp_test"] / best[f"{q}/fixed_test"], 3)
            for q in queries
        },
        "cc_structure": structure,
        "host_burn_seconds": {"before": b0, "after": b1},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
