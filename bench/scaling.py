#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md §3): the same extraction job
on the same input at local[N] and local[4N]; efficiency = dps_4N / (4 × dps_N).
Writes BENCH/BASELINE.md with both throughputs and the efficiency.

A real multi-node cluster is unavailable in this sandbox; parallelism levels
stand in for executor counts per the BASELINE.md protocol.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from engine import fixtures  # noqa: E402

SEED = 1234


def run_level(cores: int, corpus: str) -> dict:
    """Run one parallelism level PINNED to `cores` physical CPUs.

    Pinning (taskset) is what makes the comparison honest: a local[N] JVM
    plus its Python UDF workers otherwise consumes ~2N physical cores (task
    slots bound the JVM threads, not the Arrow workers), which inflates the
    small level's throughput and understates scaling.  With pinning, 'N
    cores' emulates an N-core executor allocation the way a cluster
    manager's cgroups would.
    """
    cmd = [sys.executable, str(REPO / "bench" / "run_scale.py"),
           "--cores", str(cores), "--corpus", corpus]
    import shutil as _sh

    if _sh.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=str(REPO))
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small parallelism level N")
    ap.add_argument("--docs", type=int, default=12000)
    args = ap.parse_args()
    n, n4 = args.n, args.n * 4

    cdir = REPO / ".bench_cache" / f"corpus-v{fixtures.FIXTURE_VERSION}-{SEED}-{args.docs}"
    if not (cdir / "spans").exists():
        print(f"generating corpus ({args.docs} docs)…", file=sys.stderr)
        fixtures.write_corpus(str(cdir), args.docs, seed=SEED, docs_per_file=1000)

    lo = run_level(n, str(cdir))
    hi = run_level(n4, str(cdir))
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])

    report = {
        "protocol": f"same job, same input, local[{n}] vs local[{n4}]",
        "docs": lo["docs"],
        f"local[{n}]": lo,
        f"local[{n4}]": hi,
        "scaling_efficiency": round(eff, 3),
        "pass_threshold": 0.8,
        "passed": eff >= 0.8,
    }
    print(json.dumps(report))

    md_dir = REPO / "BENCH"
    md_dir.mkdir(exist_ok=True)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    (md_dir / "BASELINE.md").write_text(
        f"""# BENCH/BASELINE — scaling-efficiency evidence

Generated {stamp} by `python bench/scaling.py --n {n} --docs {args.docs}`.

Protocol (BASELINE.md §3): the extraction pipeline (explode → text/media
branches → decode UDF → route/strip → offset re-nest) over the identical
deterministic corpus ({lo['docs']} docs, seed {SEED}) at two parallelism
levels in separate processes; best of 2 timed runs each, timing excludes
session startup / corpus generation / scan warm-up.

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{n}] (N) | {lo['seconds']} | {lo['docs_per_sec']} |
| local[{n4}] (4N) | {hi['seconds']} | {hi['docs_per_sec']} |

**Scaling efficiency (4N vs N): {eff:.3f}** — threshold ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}.

Design choices that buy this: no driver-side collects in the job; one fused
Arrow decode UDF per media batch (no per-row Python); salted repartition of
the media branch decorrelates oversized payloads from input layout; AQE
coalesces the re-nest shuffle; shuffle partitions = cores at each level.
"""
    )
    print(f"wrote {md_dir / 'BASELINE.md'}", file=sys.stderr)


if __name__ == "__main__":
    main()
