#!/usr/bin/env python
"""Interleaved A/B + k-sweep: k-means assignment cost vs k (round-5 close).

Answers the two PLANS.md §5a questions at once, on a 200k-vector frame
(sf0.1 embeddings replicated 100× with distinct vec_ids, 32 splits):

1. Assignment SHAPE: the shipped row-local argmin (centroids packed into
   ONE broadcast array row → per-point array_min over (score, cluster)
   structs; zero exchange) vs the rejected crossJoin→groupBy(vec_id) argmin
   (reproduced verbatim below), which shuffles one min-struct row PER POINT
   — with the embedding inside — and plans as SortAggregate (min over a
   struct containing an array is sort-based).
2. Assignment cost vs k (4 → 256): the broadcast pass is k× dot products
   per point; where does it cross the 8-hyperplane LSH bucket front's cost
   (the dedup_embedding_cosine candidate generator — its per-point compute
   is ~k=8 worth of dot products)?

One process, one SparkSession, arms interleaved per k, best-of-R, md5 burn
receipts (BENCH/BASELINE.md discipline)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import engine.trainops as t  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
KS = (4, 16, 64, 256)


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


def kmeans_assign_groupby(emb: DataFrame, k: int) -> DataFrame:
    """The REJECTED r5-mid assignment (one iteration), reproduced for the
    A/B: crossJoin against a broadcast k-row centroid frame, then
    groupBy(vec_id) min-struct argmin — shuffles every point's embedding."""
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    w = Window.orderBy("vec_id")
    cents = (
        e.orderBy("vec_id")
        .limit(k)
        .select((F.row_number().over(w) - 1).alias("cluster"), "emb")
    )
    c = F.broadcast(cents.select("cluster", F.col("emb").alias("c_emb")))
    score = t._dot(F.col("c_emb"), F.col("c_emb")) - F.lit(2.0) * t._dot(
        F.col("emb"), F.col("c_emb")
    )
    return (
        e.crossJoin(c)
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    score.alias("s"),
                    F.col("cluster").alias("cluster"),
                    F.col("emb").alias("emb"),
                )
            ).alias("m")
        )
        .select("vec_id", F.col("m.cluster").alias("cluster"), F.col("m.emb").alias("emb"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-kmeans-k", cores=32, shuffle_partitions=32)
    b0 = burn()

    # 200k-vector frame: 100 replicas of the sf0.1 embeddings, vec_ids kept
    # distinct and deterministic (id = vec_id * 1000 + replica).
    emb_dir = "/tmp/ab_kmeans_emb"
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    reps = spark.range(100).select(F.col("id").alias("rep"))
    base.crossJoin(reps).select(
        (F.col("vec_id") * 1000 + F.col("rep")).alias("vec_id"), "embedding"
    ).repartition(32).write.mode("overwrite").parquet(emb_dir)
    emb = spark.read.parquet(emb_dir)
    n_vecs = emb.count()

    def run(df: DataFrame) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    arms: dict[str, object] = {}
    for k in KS:
        arms[f"rowlocal/k{k}"] = lambda k=k: t.kmeans_assign(emb, k=k, iters=1)
        arms[f"groupby/k{k}"] = lambda k=k: kmeans_assign_groupby(emb, k)
    arms["lsh_front"] = lambda: emb.select(
        "vec_id", t._lsh_bucket_col(F.col("embedding")).alias("bucket")
    )

    for mk in arms.values():  # warm every plan shape once
        run(mk())
    walls: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(rounds):
        for name, mk in arms.items():
            walls[name].append(run(mk()))

    best = {a: min(w) for a, w in walls.items()}
    out = {
        "sf_dir": SF_DIR,
        "n_vectors": n_vecs,
        "rounds": rounds,
        "walls": walls,
        "best": best,
        "rowlocal_over_groupby": {
            f"k{k}": round(best[f"rowlocal/k{k}"] / best[f"groupby/k{k}"], 3)
            for k in KS
        },
        "rowlocal_over_lsh_front": {
            f"k{k}": round(best[f"rowlocal/k{k}"] / best["lsh_front"], 3) for k in KS
        },
        "host_burn_seconds": {"before": b0, "after": burn()},
    }
    print(json.dumps(out))
    (REPO / "BENCH" / "ab_kmeans_k_r5.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
