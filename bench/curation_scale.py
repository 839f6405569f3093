#!/usr/bin/env python
"""Two-parallelism-level scaling evidence for the corpus-curation flagship
(`train_corpus_filtered`): same input, pinned local[N] vs local[4N],
efficiency = dps_4N / (4 × dps_N).  Same discipline as bench/scaling.py
(interleaved levels, best-of-R, taskset pinning, no-Spark CPU ceiling, burn
receipts); results to BENCH/curation-scale.json.

Input: the sf0.1 documents table replicated ``--replicas`` times.  Each
replica suffixes EVERY token with ``_k`` (plain string replace, no regex) and
offsets doc_id by k·1,000,000 — within-replica duplicate/near-dup structure
(what _augmented plants) is preserved exactly, while replicas share no
shingles, so LSH candidate edges and CC components scale LINEARLY with corpus
size instead of quadratically (replicating text verbatim would put every
replica of a doc in one LSH bucket: a 24-replica corpus would square the
pair count and measure a different algorithm).

The worker sets ``spark.extraction.checkpointDir`` so the CC loop and the
DAG-diamond cut run their RELIABLE-checkpoint (production) path, not the
localCheckpoint fallback.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC_SF = "/root/testdata/sf0.1"


def burn(n: int = 6_000_000) -> float:
    import hashlib

    h = b"x" * 64
    t0 = time.time()
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return round(time.time() - t0, 2)


def build_corpus(replicas: int) -> str:
    """Deterministic replicated documents table, cached across runs."""
    import duckdb

    out = REPO / ".bench_cache" / f"curation-docs-x{replicas}"
    ddir = out / "documents.parquet"
    if ddir.exists():
        return str(out)
    ddir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for k in range(replicas):
        con.execute(
            f"""
            COPY (
              SELECT doc_id + {k}::BIGINT * 1000000 AS doc_id,
                     replace(text, ' ', '_{k} ') || '_{k}' AS text,
                     lang, source
              FROM read_parquet('{SRC_SF}/documents.parquet')
            ) TO '{ddir}/part-{k:04d}.parquet' (FORMAT PARQUET)
            """
        )
    return str(out)


def worker(cores: int, sf_dir: str, runs: int) -> None:
    """One pinned level in its own process (Spark master is fixed per JVM)."""
    os.environ.setdefault("SPARK_GRAFT_PIN_HEAP", "1")
    import engine.trainops as T
    from engine.session import get_spark

    spark = get_spark(f"curation-scale-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = tempfile.mkdtemp(prefix=f"curation-ckpt-{cores}-")
    spark.conf.set(T.CHECKPOINT_DIR_CONF, ckpt)
    try:
        # untimed warm-up on the small source table: python workers, codegen
        T.train_corpus_filtered(spark, SRC_SF).write.format("noop").mode(
            "overwrite"
        ).save()
        walls = []
        for _ in range(runs):
            t0 = time.time()
            T.train_corpus_filtered(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
        print(json.dumps({"cores": cores, "walls": walls, "best": min(walls)}))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.stop()


def run_level(cores: int, sf_dir: str, runs: int) -> dict:
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker",
        "--cores",
        str(cores),
        "--sf-dir",
        sf_dir,
        "--runs",
        str(runs),
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=str(REPO))
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--n", type=int, default=8, help="small level N (big = 4N)")
    ap.add_argument("--replicas", type=int, default=24)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    if args.worker:
        worker(args.cores, args.sf_dir, args.runs)
        return

    n, n4 = args.n, args.n * 4
    sf_dir = build_corpus(args.replicas)
    n_docs = 5000 * args.replicas

    # root bench.py shadows the bench/ namespace package — import by dir
    sys.path.insert(0, str(REPO / "bench"))
    from scaling import raw_cpu_ceiling  # no-Spark machine ceiling

    ceiling = raw_cpu_ceiling(n, n4)

    b0 = burn()
    best: dict[int, dict] = {}
    for r in range(args.runs):
        for cores in (n, n4):  # interleaved levels, fresh process per run
            res = run_level(cores, sf_dir, runs=1)
            if cores not in best or res["best"] < best[cores]["best"]:
                best[cores] = res
    b1 = burn()

    dps = {c: round(n_docs / best[c]["best"], 1) for c in (n, n4)}
    eff = round(dps[n4] / (4 * dps[n]), 3)
    out = {
        "metric": "curation_scaling_efficiency",
        "value": eff,
        "levels": {str(c): {"wall_best": best[c]["best"], "docs_per_sec": dps[c]} for c in (n, n4)},
        "n_docs": n_docs,
        "replicas": args.replicas,
        "raw_cpu_ceiling": ceiling,
        "normalized_efficiency": round(eff / ceiling["efficiency"], 3),
        "host_burn_seconds": {"before": b0, "after": b1},
    }
    line = json.dumps(out)
    (REPO / "BENCH" / "curation-scale.json").write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
