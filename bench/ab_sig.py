#!/usr/bin/env python
"""Interleaved A/B: MinHash band-signature hash family (round-5 close).

A = 4 bands from FOUR md5 calls per shingle (min(md5('i:'||shingle)) per
    band, 128-bit sigs) — the r5-mid family, reproduced verbatim below and
    monkeypatched over trainops.minhash_signatures.
B = 4 bands from TWO md5 calls, each digest split into two 64-bit hex
    slices — the shipped family (engine/trainops.py band_mins; collision
    math in its docstring).

One process, one SparkSession, A/B/A/B best-of-R, md5 burn receipts
(BENCH/BASELINE.md discipline).  Timed units: dedup_minhash_lsh (the pure
signature workload) and train_corpus_filtered (the flagship — signatures
over quality/repetition survivors + LSH + CC)."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

import engine.trainops as trainops  # noqa: E402
from engine.session import get_spark  # noqa: E402
from engine.trainops import _let  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


def minhash_signatures_4md5(docs: DataFrame) -> DataFrame:
    """The r5-mid family: one md5 per (band, shingle)."""

    def band_mins(toks):
        tri = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]),
            )
        )
        return _let(
            tri,
            lambda t: F.array(
                *[
                    F.array_min(
                        F.transform(t, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
                    )
                    for i in range(4)
                ]
            ),
        )

    sigs = _let(F.split(F.col("text"), " "), band_mins)
    return docs.filter(F.size(F.split(F.col("text"), " ")) >= 3).select(
        "doc_id", F.posexplode(sigs).alias("band", "sig")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-sig", cores=32, shuffle_partitions=32)
    b0 = burn()
    shipped = trainops.minhash_signatures

    def run(q: str) -> None:
        fn = {
            "dedup_minhash_lsh": trainops.dedup_minhash_lsh,
            "train_corpus_filtered": trainops.train_corpus_filtered,
        }[q]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    variants = {"4md5": minhash_signatures_4md5, "2md5_sliced": shipped}
    units = ("dedup_minhash_lsh", "train_corpus_filtered")
    walls: dict[str, list[float]] = {f"{q}/{v}": [] for q in units for v in variants}
    for v in variants.values():  # warm both expression shapes
        trainops.minhash_signatures = v
        run("dedup_minhash_lsh")
    for _ in range(rounds):
        for vname, v in variants.items():
            trainops.minhash_signatures = v
            for q in units:
                t0 = time.time()
                run(q)
                walls[f"{q}/{vname}"].append(round(time.time() - t0, 3))
    trainops.minhash_signatures = shipped

    best = {k: min(w) for k, w in walls.items()}
    out = {
        "sf_dir": SF_DIR,
        "rounds": rounds,
        "walls": walls,
        "best": best,
        "speedup": {
            q: round(best[f"{q}/4md5"] / best[f"{q}/2md5_sliced"], 3) for q in units
        },
        "host_burn_seconds": {"before": b0, "after": burn()},
    }
    print(json.dumps(out))
    (REPO / "BENCH" / "ab_sig_r5.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
