#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md §3): the same extraction job
on the same input at pinned N and 4N CPUs; efficiency = dps_4N / (4 × dps_N).
Writes BENCH/BASELINE.md with both throughputs, the efficiency, and the
measured hardware scaling ceiling for context.

Notes on honesty of the measurement:
- CPU PINNING (taskset): a local[N] JVM plus its Python UDF workers otherwise
  consumes ~2N physical cores, inflating the small level.  Pinning emulates
  an N-core executor allocation the way a cluster manager's cgroups would.
- HARDWARE CEILING: this sandbox VM does not scale linearly even for pure
  in-process CPU work (measured below with a no-Spark md5 burn) — beyond
  ~8-16 cores the VM delivers diminishing returns (hypervisor/memory-bandwidth
  limits that would NOT exist across separate cluster hosts).  The report
  therefore includes the raw-CPU efficiency at the same levels and the
  pipeline's machine-normalized efficiency (pipeline ÷ ceiling).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import shutil
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from engine import fixtures  # noqa: E402

SEED = 1234


def run_level(cores: int, corpus: str, runs: int, arrow_batch: int | None = None) -> dict:
    cmd = [sys.executable, str(REPO / "bench" / "run_scale.py"),
           "--cores", str(cores), "--corpus", corpus, "--runs", str(runs),
           "--receipts", "--tasktime"]
    if arrow_batch:
        cmd += ["--arrow-batch", str(arrow_batch)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=str(REPO))
    return json.loads(out.stdout.strip().splitlines()[-1])


def _burn(n: int) -> int:
    h = b"x" * 64
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return 1


def raw_cpu_ceiling(n: int, n4: int, total: int = 24_000_000, rounds: int = 3) -> dict:
    """Fixed CPU work split over N vs 4N pinned processes — the machine's own
    scaling ceiling, independent of Spark.  Levels are measured INTERLEAVED
    and best-of-``rounds`` per level: this VM's hypervisor stalls are bursty,
    so consecutive measurement of one level can land entirely inside a stall
    and produce a nonsense ratio (observed: a ceiling "efficiency" of 1.18 —
    impossible — from one stalled N-level wall)."""
    walls = {n: None, n4: None}
    for _ in range(rounds):
        for procs in (n, n4):
            with mp.Pool(procs) as pool:
                t0 = time.time()
                pool.map(_burn, [total // procs] * procs)
                w = time.time() - t0
            if walls[procs] is None or w < walls[procs]:
                walls[procs] = w
    eff = walls[n] / (4 * walls[n4])
    return {"wall": {k: round(v, 2) for k, v in walls.items()}, "efficiency": round(eff, 3)}


def _gram_work(args: tuple[str, int, int]) -> int:
    """Per-worker slice of the gram-shaped ceiling workload: ``share``
    doc-passes over the documents table at ``path`` starting at logical
    index ``start`` (wrapping).  Each doc-pass is the curation map pass's
    memory-traffic shape with NO Spark: token array build → bigram/trigram
    string arrays → sort-based multiplicity/distinct (np.unique sorts, like
    the engine's array_sort/array_distinct).  Workers read the parquet
    themselves so the parent serializes no text (a parent-side pickle of
    the corpus would add an identical serial term at both levels and bias
    the measured ceiling DOWN — flattering the normalization)."""
    path, start, share = args
    import numpy as np
    import pyarrow.parquet as pq

    texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
    n = len(texts)
    acc = 0
    for j in range(start, start + share):
        toks = np.array(texts[j % n].split())
        bg = None
        if toks.size >= 2:
            bg = np.char.add(np.char.add(toks[:-1], " "), toks[1:])
            _, cnt = np.unique(bg, return_counts=True)
            acc += int(cnt.max())
        if toks.size >= 3:
            tri = np.char.add(np.char.add(bg[:-1], " "), toks[2:])
            acc += len(np.unique(tri))
    return acc


def gram_cpu_ceiling(
    n: int,
    n4: int,
    docs_parquet: str,
    total_doc_passes: int = 240_000,
    rounds: int = 3,
) -> dict:
    """The machine's scaling ceiling for GRAM-SHAPED work (the curation
    flagship's dominant map stages: per-doc array allocation, string-array
    hashing/sorting, distinct counting) at N vs 4N pinned processes, no
    Spark.  The md5 burn (raw_cpu_ceiling) is cache-resident and scales
    near-linearly on this VM; gram work streams freshly-allocated arrays
    through memory every doc, so above ~8 concurrent workers it measures
    the shared memory bus — the same artifact the decode ceiling
    (BENCH/decode-ceiling.json) isolated for the bitmap job.  Levels
    interleaved, best-of-``rounds``; the pool inherits a parent affinity
    mask of exactly the level's core count, like the cluster workers'
    taskset ranges."""
    import os

    have_affinity = hasattr(os, "sched_setaffinity")
    old_mask = os.sched_getaffinity(0) if have_affinity else None
    walls: dict[int, float | None] = {n: None, n4: None}
    try:
        for _ in range(rounds):
            for procs in (n, n4):
                share = total_doc_passes // procs
                tasks = [(docs_parquet, i * share, share) for i in range(procs)]
                if have_affinity:
                    os.sched_setaffinity(0, set(range(procs)))
                with mp.Pool(procs) as pool:
                    t0 = time.time()
                    pool.map(_gram_work, tasks)
                    w = time.time() - t0
                if have_affinity:
                    os.sched_setaffinity(0, old_mask)
                if walls[procs] is None or w < walls[procs]:
                    walls[procs] = w
    finally:
        if have_affinity:
            os.sched_setaffinity(0, old_mask)
    eff = walls[n] / (4 * walls[n4])
    return {
        "what": "per-doc token/bigram/trigram array build + sort-based "
        "distinct (numpy, pinned process pools, no Spark) — the curation "
        "map pass's memory-traffic shape",
        "doc_passes": total_doc_passes,
        "wall": {k: round(v, 2) for k, v in walls.items()},
        "efficiency": round(eff, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="small parallelism level N")
    ap.add_argument("--docs", type=int, default=120000)
    ap.add_argument("--bitmap-docs", type=int, default=6000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    n, n4 = args.n, args.n * 4

    cdir = REPO / ".bench_cache" / f"corpus-v{fixtures.FIXTURE_VERSION}-{SEED}-{args.docs}"
    if not (cdir / "spans").exists():
        print(f"generating corpus ({args.docs} docs)…", file=sys.stderr)
        fixtures.write_corpus(str(cdir), args.docs, seed=SEED, docs_per_file=1000)
    bdir = REPO / ".bench_cache" / f"bitmap-v{fixtures.BITMAP_FIXTURE_VERSION}l2-{SEED}-{args.bitmap_docs}"
    if not (bdir / "spans").exists():
        print(f"generating bitmap corpus ({args.bitmap_docs} docs)…", file=sys.stderr)
        fixtures.write_bitmap_corpus(str(bdir), args.bitmap_docs, seed=SEED)

    ceiling = raw_cpu_ceiling(n, n4)

    def interleaved(corpus: str, arrow_batch: int | None = None) -> tuple[dict, dict]:
        """Best-of-``args.runs`` per level with the LEVELS interleaved
        (N, 4N, N, 4N, …), each timed run in a fresh pinned process: a
        bursty host stall then costs one round of one level instead of every
        repeat of it (the same round-robin discipline as bench.py)."""
        best: dict[int, dict] = {}
        for _ in range(args.runs):
            for cores in (n, n4):
                r = run_level(cores, corpus, 1, arrow_batch=arrow_batch)
                if cores not in best or r["seconds"] < best[cores]["seconds"]:
                    best[cores] = r
        return best[n], best[n4]

    lo, hi = interleaved(str(cdir))
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    norm = eff / ceiling["efficiency"] if ceiling["efficiency"] else None
    # bitmap (real-detector) job at the same two levels — the decode UDF is
    # ~100% of its cost, so this evidences the Python/Arrow stage scaling too
    blo, bhi = interleaved(str(bdir), arrow_batch=256)
    beff = bhi["docs_per_sec"] / (4 * blo["docs_per_sec"])
    bnorm = beff / ceiling["efficiency"] if ceiling["efficiency"] else None
    # preformatted for the markdown template — None (no usable CPU ceiling)
    # must render as n/a, not raise TypeError on :.3f
    norm_s = f"{norm:.3f}" if norm is not None else "n/a"
    bnorm_s = f"{bnorm:.3f}" if bnorm is not None else "n/a"

    report = {
        "protocol": f"same job, same input, pinned local[{n}] vs local[{n4}]",
        "docs": lo["docs"],
        f"local[{n}]": lo,
        f"local[{n4}]": hi,
        "scaling_efficiency": round(eff, 3),
        "bitmap_docs": blo["docs"],
        f"bitmap_local[{n}]": blo,
        f"bitmap_local[{n4}]": bhi,
        "bitmap_scaling_efficiency": round(beff, 3),
        "raw_cpu_ceiling_efficiency": ceiling["efficiency"],
        "machine_normalized_efficiency": round(norm, 3) if norm else None,
        "bitmap_machine_normalized_efficiency": round(bnorm, 3) if bnorm else None,
        "pass_threshold": 0.8,
        "passed": eff >= 0.8 and beff >= 0.8,
    }
    print(json.dumps(report))

    md_dir = REPO / "BENCH"
    md_dir.mkdir(exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    (md_dir / "BASELINE.md").write_text(
        f"""# BENCH/BASELINE — scaling-efficiency evidence

Generated {stamp} by `python bench/scaling.py --n {n} --docs {args.docs}`.

Protocol (BASELINE.md §3): the full extraction pipeline (explode → text/media
branches → decode-at-scan Arrow UDF → route/strip → offset re-nest) over the
identical deterministic corpus ({lo['docs']} docs, seed {SEED}), at two
parallelism levels in separate processes, each PINNED to that many physical
CPUs with taskset (emulating an executor allocation: without pinning a
local[N] JVM + its Python workers consume ~2N cores and the comparison is
dishonest).  Levels are measured INTERLEAVED (N, 4N, N, 4N, ...), best of
{args.runs} fresh-process runs per level — this VM's hypervisor stalls are
bursty and consecutive per-level measurement can land a whole level inside a
stall (PLANS.md §4c).  Timing excludes session startup, corpus generation
and scan warm-up.

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{n}] (N, pinned {n} CPUs) | {lo['seconds']} | {lo['docs_per_sec']} |
| local[{n4}] (4N, pinned {n4} CPUs) | {hi['seconds']} | {hi['docs_per_sec']} |

**Scaling efficiency (4N vs N): {eff:.3f}** — threshold ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}.

## Bitmap (real-detector) job at the same two levels

Same protocol over the SPB1 raster corpus ({blo['docs']} docs) — the decode
UDF (QR finder scan, barcode whiten, projection-profile layout, idcard crop)
dominates this job, so this measures the Python/Arrow stage's scaling
specifically; `arrow.maxRecordsPerBatch=256` on both levels (raster payloads
are ~120 KB each).

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{n}] (pinned) | {blo['seconds']} | {blo['docs_per_sec']} |
| local[{n4}] (pinned) | {bhi['seconds']} | {bhi['docs_per_sec']} |

**Bitmap scaling efficiency: {beff:.3f}** → {"PASS" if beff >= 0.8 else "FAIL"}
(machine-normalized {bnorm_s}).

## Machine ceiling (context)

This sandbox VM itself scales sub-linearly for pure in-process CPU work (a
no-Spark md5 burn over pinned process pools — no shuffles, no JVM, no Python
workers): efficiency {ceiling['efficiency']:.3f} over the same {n}→{n4} step
(walls: {ceiling['wall']}).  Machine-normalized pipeline efficiency
(pipeline ÷ ceiling): **{norm_s}**.  On a real multi-host cluster each
executor brings its own memory bandwidth, so the hypervisor/bandwidth
component of the loss does not apply.

Design choices that buy the scaling: no driver-side collects; payload bytes
never shuffle (decode UDF sits on the blobs scan, only decoded features move,
scan splits sized by files.maxPartitionBytes keep the Arrow stage parallel);
shuffled-hash join with the tiny span-metadata side as build (a sort-merge
join would sort millions of wide feature rows); AQE coalesces the re-nest
shuffle; shuffle partitions = cores at each level.  Timing is best-of-{args.runs}
per level: steady-state throughput, not one-time JVM/python-worker warmup.
"""
    )
    print(f"wrote {md_dir / 'BASELINE.md'}", file=sys.stderr)


if __name__ == "__main__":
    main()
