#!/usr/bin/env python
"""Interleaved A/B: derived-output computation over a PLAIN parquet spine vs
a doc_id-BUCKETED spine (io.materialize_run's ``bucket_spine`` path).

The re-nest (assemble.reassemble) is the engine's only full-text exchange;
bucketing the interim spine by doc_id deletes it (plan-asserted in
tests/test_io_resume.py) — this harness measures the WALL effect at a
meaningful corpus size.  One process, one SparkSession, A/B/A/B best-of-R,
md5 burn receipts (BENCH/BASELINE.md discipline).  The spine is built ONCE
(extraction is not under test) and written once per variant; only the
derived consumers are timed.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from engine import fixtures  # noqa: E402
from engine.assemble import reassemble  # noqa: E402
from engine.io import spine_table_name  # noqa: E402
from engine.metrics import lineage_df, metrics_df  # noqa: E402
from engine.pipeline import build_spine  # noqa: E402
from engine.session import get_spark  # noqa: E402

SEED = 1234


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


def _shuffle_bytes_since(ev_dir: str, t0_ms: int) -> float:
    """Total shuffle-write MB of tasks launched after ``t0_ms`` (event-log
    parse, run_scale.py pattern) — the host-noise-immune receipt: these are
    the bytes that cross the NETWORK on a real cluster."""
    import glob
    import os

    total = 0.0
    for path in glob.glob(f"{ev_dir}/**/*", recursive=True):
        if not os.path.isfile(path) or "appstatus" in os.path.basename(path):
            continue
        with open(path, errors="ignore") as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                e = json.loads(line)
                if (e.get("Task Info") or {}).get("Launch Time", 0) < t0_ms:
                    continue
                sw = (e.get("Task Metrics") or {}).get("Shuffle Write Metrics") or {}
                total += sw.get("Shuffle Bytes Written", 0) / 1e6
    return total


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    buckets = 32

    cdir = REPO / ".bench_cache" / f"corpus-v{fixtures.FIXTURE_VERSION}-{SEED}-{docs}"
    if not (cdir / "spans").exists():
        print(f"generating corpus ({docs} docs)…", file=sys.stderr)
        fixtures.write_corpus(str(cdir), docs, seed=SEED, docs_per_file=1000)

    ev_dir = tempfile.mkdtemp(prefix="ab-bucket-evlog-")
    spark = get_spark(
        "ab-bucket",
        cores=32,
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{ev_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    b0 = burn()

    spine = build_spine(
        spark,
        spark.read.parquet(str(cdir / "spans")),
        spark.read.parquet(str(cdir / "media_blobs")),
    )
    work = tempfile.mkdtemp(prefix="ab-bucket-")
    plain_dir = f"{work}/spine-plain"
    spine.write.mode("overwrite").parquet(plain_dir)
    # bucketed twin: same rows, CLUSTERED BY doc_id (read back from the plain
    # copy so both variants hold byte-identical input and extraction runs once)
    tbl = spine_table_name("ab_bucket")
    (
        spark.read.parquet(plain_dir)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "doc_id")
        .option("path", f"{work}/spine-bucketed")
        .saveAsTable(tbl)
    )

    def derive(frame) -> None:
        # the doc_id-grouped consumers a materialize_run derives per spine
        reassemble(frame).write.format("noop").mode("overwrite").save()
        lineage_df(frame, "ab").write.format("noop").mode("overwrite").save()
        metrics_df(frame, "ab").write.format("noop").mode("overwrite").save()

    variants = {
        "plain": lambda: derive(spark.read.parquet(plain_dir)),
        "bucketed": lambda: derive(spark.table(tbl)),
    }
    walls: dict[str, list[float]] = {k: [] for k in variants}
    for v in variants.values():  # untimed warm pass (codegen, FS caches)
        v()
    # shuffle-bytes receipt: one attributed pass per variant (timestamp
    # windows; events flush on spark.stop() below, parsed afterwards)
    marks: dict[str, int] = {}
    for name, v in variants.items():
        marks[name] = int(time.time() * 1000)
        v()
        time.sleep(0.2)
    marks["_end"] = int(time.time() * 1000)
    for _ in range(rounds):
        for name, v in variants.items():
            t0 = time.time()
            v()
            walls[name].append(round(time.time() - t0, 3))

    best = {k: min(w) for k, w in walls.items()}
    b_after = burn()
    spark.stop()  # flush event log
    upto = _shuffle_bytes_since(ev_dir, marks["_end"])  # timed rounds' bytes
    plain_mb = _shuffle_bytes_since(ev_dir, marks["plain"]) - _shuffle_bytes_since(
        ev_dir, marks["bucketed"]
    )
    bucketed_mb = _shuffle_bytes_since(ev_dir, marks["bucketed"]) - upto
    out = {
        "docs": docs,
        "buckets": buckets,
        "rounds": rounds,
        "walls": walls,
        "best": best,
        "speedup_bucketed": round(best["plain"] / best["bucketed"], 3),
        "derive_shuffle_mb": {
            "plain": round(plain_mb, 1),
            "bucketed": round(bucketed_mb, 1),
        },
        "host_burn_seconds": {"before": b0, "after": b_after},
    }
    print(json.dumps(out))
    (REPO / "BENCH" / "ab_bucket_r5.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
