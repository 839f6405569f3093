#!/usr/bin/env python
"""Interleaved A/B for the streaming derived-write thread pool.

Round-5 change: ``stream_extraction``'s per-micro-batch foreachBatch submits
the four derived-output writes (spans_out/lineage/metrics/conf_hist) from a
driver-side ThreadPoolExecutor instead of a sequential loop, overlapping
their scheduler/commit latency.  The effect size is small (each write is a
short job at micro-batch scale), so per the repo's bench protocol
(BENCH/BASELINE.md receipts discipline) the variants are interleaved inside
ONE Spark process — alternating pool/sequential per round — so bursty host
throttling hits both arms equally and the ratio survives noise that would
swamp two separate runs.

The sequential arm is produced by monkeypatching
``engine.streaming.ThreadPoolExecutor`` with an inline-executing shim — the
exact pre-change semantics (each write submitted and completed in order on
the caller thread) without a second code path in the engine.

Writes BENCH/ab_stream_r5.json and prints the JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import shutil
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "bench"))

from streaming_bench import burn, corpus_dir  # noqa: E402

from engine.session import get_spark  # noqa: E402

N_DOCS = 4000
DOCS_PER_FILE = 500  # 8 micro-batches at maxFilesPerTrigger=1... see below
ROUNDS = 3


class _InlineFuture:
    def __init__(self, fn, *a, **kw):
        self._exc = None
        try:
            self._res = fn(*a, **kw)
        except BaseException as e:  # surfaced by .result(), same as real pool
            self._exc = e

    def result(self):
        if self._exc is not None:
            raise self._exc
        return self._res


class _InlinePool:
    """Executes submit() on the caller thread — the pre-change sequential
    foreachBatch write loop, byte-for-byte semantics."""

    def __init__(self, *a, **kw):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def submit(self, fn, *a, **kw):
        return _InlineFuture(fn, *a, **kw)


def drain(spark, cdir: str, trigger_files: int) -> float:
    from engine.streaming import stream_extraction

    blobs = spark.read.parquet(f"{cdir}/media_blobs")
    out = tempfile.mkdtemp(prefix="ab-stream-")
    try:
        t0 = time.time()
        q = stream_extraction(
            spark,
            f"{cdir}/spans",
            blobs,
            out,
            run_id="ab",
            max_files_per_trigger=trigger_files,
        )
        q.awaitTermination(600)
        dt = time.time() - t0
        got = spark.read.parquet(f"{out}/spans_out").count()
        assert got == N_DOCS, f"stream produced {got} docs, want {N_DOCS}"
        return round(dt, 3)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    import engine.streaming as streaming_mod

    real_pool = streaming_mod.ThreadPoolExecutor
    spark = get_spark()
    cdir = corpus_dir(N_DOCS, DOCS_PER_FILE)

    b0 = burn()
    walls: dict[str, list[float]] = {"pool": [], "sequential": []}
    # warm both paths once (JIT, shuffle dirs, page cache) before timing
    drain(spark, cdir, trigger_files=1)
    for _ in range(ROUNDS):
        for arm, pool_cls in (("pool", real_pool), ("sequential", _InlinePool)):
            streaming_mod.ThreadPoolExecutor = pool_cls
            try:
                walls[arm].append(drain(spark, cdir, trigger_files=1))
            finally:
                streaming_mod.ThreadPoolExecutor = real_pool
    b1 = burn()

    best = {k: min(v) for k, v in walls.items()}
    med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
    result = {
        "n_docs": N_DOCS,
        "micro_batches": N_DOCS // DOCS_PER_FILE,
        "rounds": ROUNDS,
        "walls": walls,
        "best": best,
        "median": med,
        "speedup_best": round(best["sequential"] / best["pool"], 3),
        "speedup_median": round(med["sequential"] / med["pool"], 3),
        "host_burn_seconds": {"before": b0, "after": b1},
    }
    (REPO / "BENCH" / "ab_stream_r5.json").write_text(json.dumps(result))
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
