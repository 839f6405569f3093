#!/usr/bin/env python
"""Interleaved A/B: PQ codebook FIT cost at production K=256 — full-corpus
fit vs deterministic 25% sampled fit (pq_fit_sampled), each followed by the
same fused encode of the FULL frame.  The published method fits on a sample
(codebooks describe the space, not the corpus); this receipt prices what
that saves.  One process, A/B/A/B best-of-R, md5 burn receipts."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

import engine.trainops as trainops  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TILES = 64
K = 256
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
    spark = get_spark("ab-pq-k256", cores=32)
    emb = trainops._emb(spark, SF_DIR)
    big = None
    for t in range(TILES):
        # jitter one dim per tile so tiles aren't exact copies (a degenerate
        # fit input); arithmetic stays deterministic
        tile = emb.select(
            (F.col("vec_id") + F.lit(t * 1_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(float(t)) * F.lit(1e-4)
            ).alias("embedding"),
        )
        big = tile if big is None else big.unionByName(tile)
    big = trainops._truncate_lineage(
        big.repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))
    )
    n0 = big.count()

    def run(fitter):
        cents = fitter(big)
        codes = trainops.pq_encode_fused(big, cents, m=trainops._PQ_M)
        out = codes.agg(
            F.count("*").alias("n"),
            F.sum(
                F.col("code_0") + F.col("code_1") + F.col("code_2") + F.col("code_3")
            ).alias("s"),
        ).collect()[0]
        return int(out["n"])

    def fit_full(frame):
        d_sub = trainops._PQ_DIMS // trainops._PQ_M
        cents = []
        for i in range(trainops._PQ_M):
            sub = frame.select(
                "vec_id",
                F.slice("embedding", i * d_sub + 1, d_sub).alias("embedding"),
            )
            _, c = trainops.kmeans_fit(sub, k=K)
            cents.append(c)
        return cents

    def fit_sampled(frame):
        return trainops.pq_fit_sampled(frame, k=K)

    arms = {"a_fit_full": fit_full, "b_fit_sampled_25pct": fit_sampled}
    best, counts = {}, {}
    b0 = burn()
    for _ in range(REPEATS):
        for name, fitter in arms.items():
            t0 = time.time()
            counts[name] = run(fitter)
            dt = time.time() - t0
            if name not in best or dt < best[name]:
                best[name] = round(dt, 2)
    assert counts["a_fit_full"] == counts["b_fit_sampled_25pct"] == n0
    res = {
        "rows": n0,
        "k": K,
        "best_fit_plus_encode": best,
        "speedup_sampled": round(best["a_fit_full"] / best["b_fit_sampled_25pct"], 2),
        "burns": [b0, burn()],
        "repeats": REPEATS,
    }
    (REPO / "BENCH" / "ab_pq_k256_r5.json").write_text(json.dumps(res, indent=1))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
