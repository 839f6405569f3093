#!/usr/bin/env python
"""Interleaved A/B: row-path vs distinct-payload decode (round-5 close).

A = engine.layout.decode_blobs           — decode every blob ROW
B = engine.layout.decode_blobs_distinct  — one groupBy(md5(payload)) with
    refs collect_list'ed alongside the surviving copy, decode the grouped
    frame with refs carried through the Arrow batch, one explode back
    (PLANS.md §4m; the one documented exception to the
    payload-never-shuffles invariant).

Corpus: N refs whose payload is the real rendered bitmap page of class
ref % C — exact byte duplication factor N/C, the recurrence shape
media_dedup_exact measures on receipt corpora (same logo/stamp behind
thousands of refs).  Three factors are timed so the docstring's guidance
(win at high duplication, row path at ~1) is receipt-backed, not asserted.

One process, one SparkSession, A/B/A/B best-of-R, md5 burn receipts
(BENCH/BASELINE.md discipline).  The timed action drains the full feature
frame through an aggregate (count + non-null page_kind) so neither path
can skip decode work.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import BinaryType  # noqa: E402

from engine.layout import decode_blobs, decode_blobs_distinct  # noqa: E402
from engine.session import get_spark  # noqa: E402

N_REFS = 24000
# classes C → duplication N/C.  Decode always drops d×; the partial-first
# floor (one payload copy per (fp, input partition)) caps only the shuffle
# savings, which kick in once d exceeds the partition count (32 here):
# dup400 is the corpus-wide-logo regime the op exists for, dup10 the
# decode-savings-vs-full-shuffle middle, dup1 the pure overhead.
FACTORS = {"dup400": 60, "dup10": 2400, "dup1": 24000}


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


@F.pandas_udf(BinaryType())
def _class_payload(cls: pd.Series) -> pd.Series:
    from engine.bitmap import encode_bitmap_page
    from engine.entry import flagship_spec

    return cls.map(lambda c: encode_bitmap_page(flagship_spec(int(c))))


def corpus(spark, n_classes: int) -> str:
    d = REPO / ".bench_cache" / f"decode-ab-{N_REFS}-{n_classes}"
    if not (d / "_SUCCESS").exists():
        (
            spark.range(N_REFS)
            .select(
                F.concat(F.lit("r"), F.col("id")).alias("media_ref"),
                _class_payload((F.col("id") % n_classes).cast("int")).alias("payload"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(str(d))
        )
    return str(d)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-decode", cores=32, shuffle_partitions=32)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    # ~120 KB payloads: the default 4096-row columnar reader batch holds
    # ~500 MB of binary per task — 32 concurrent tasks OOM the heap
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "128")
    b0 = burn()

    variants = {"row": decode_blobs, "distinct": decode_blobs_distinct}
    dirs = {tag: corpus(spark, c) for tag, c in FACTORS.items()}

    def run(tag: str, fn) -> float:
        blobs = spark.read.parquet(dirs[tag])
        t0 = time.time()
        out = fn(blobs).agg(
            F.count("*").alias("n"), F.count("feats.page_kind").alias("decoded")
        ).collect()[0]
        dt = round(time.time() - t0, 3)
        if out["n"] != N_REFS:
            raise RuntimeError(f"{tag}/{fn.__name__}: {out['n']} != {N_REFS}")
        return dt

    for tag in dirs:  # warm scans + python workers on both corpora
        run(tag, decode_blobs_distinct)

    walls: dict[str, list[float]] = {
        f"{t}/{v}": [] for t in FACTORS for v in variants
    }
    for _ in range(rounds):
        for vname, fn in variants.items():
            for tag in FACTORS:
                walls[f"{tag}/{vname}"].append(run(tag, fn))

    best = {k: min(w) for k, w in walls.items()}
    out = {
        "n_refs": N_REFS,
        "factors": FACTORS,
        "rounds": rounds,
        "walls": walls,
        "best": best,
        "speedup_distinct_over_row": {
            t: round(best[f"{t}/row"] / best[f"{t}/distinct"], 3) for t in FACTORS
        },
        "host_burn_seconds": {"before": b0, "after": burn()},
    }
    print(json.dumps(out))
    (REPO / "BENCH" / "ab_decode_r5.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
