#!/usr/bin/env python
"""Two-CLUSTER-size scaling evidence on a real multi-executor standalone
cluster (BASELINE.md §3; the north rule's own criterion: N and 4N EXECUTORS).

The single-JVM ``local[N]`` protocol (bench/scaling.py) shares one heap, one
GC, and one in-process shuffle across all "executors" — contention that does
not exist between separate executor JVMs on a real cluster.  This harness
removes that artifact by running the REAL deployment shape on this host:

  - a standalone Master (separate JVM),
  - N (then 4N) Worker JVMs, each ``taskset``-pinned to its own DISJOINT
    physical core set — each worker hosts exactly one executor JVM (its
    child processes, including the Python/Arrow UDF workers, inherit the
    pin, exactly like a cluster manager's cgroup cpuset),
  - the extraction job submitted via ``spark-submit --py-files engine.zip``
    (bench/run_scale.py is the driver app; the driver JVM+Python are pinned
    to their OWN reserved cores at BOTH levels so driver capacity is a
    constant, as on a real cluster where the driver is a separate node),
  - executor↔executor shuffle over netty + disk, not in-process handoff.

Levels are measured INTERLEAVED (N-executor cluster, 4N-executor cluster,
N, 4N, ...), best-of-R fresh clusters per level, same corpus, same seed —
identical discipline to bench/scaling.py (the host's hypervisor stalls are
bursty; PLANS.md §4c).  Efficiency = dps_4N / (4 × dps_N).

Run:  python bench/cluster.py --execs 1 --cores-per-exec 2 --docs 240000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import socket
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from engine import fixtures  # noqa: E402

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = f"{SPARK_HOME}/bin/spark-class"
SPARK_SUBMIT = f"{SPARK_HOME}/bin/spark-submit"
SEED = 1234


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _taskset(cores: str) -> list[str]:
    return ["taskset", "-c", cores] if shutil.which("taskset") else []


class Cluster:
    """A pinned standalone cluster: 1 master + n workers, each worker
    ``--cores cpe`` pinned to its own disjoint physical core range starting
    at core 0 (the driver pins to the top cores, far from the workers)."""

    def __init__(self, n_workers: int, cpe: int, work_root: str):
        self.n_workers = n_workers
        self.cpe = cpe
        self.work_root = Path(work_root)
        self.port = _free_port()
        self.master_url = f"spark://127.0.0.1:{self.port}"
        self.procs: list[subprocess.Popen] = []

    def _spawn(self, cmd: list[str], log: str, env: dict | None = None) -> subprocess.Popen:
        full_env = dict(os.environ)
        # daemons must not inherit a repo PYTHONPATH; JVM-only anyway
        full_env.update(env or {})
        out = open(self.work_root / log, "w")
        p = subprocess.Popen(
            cmd, stdout=out, stderr=subprocess.STDOUT, env=full_env,
            start_new_session=True,
        )
        self.procs.append(p)
        return p

    def start(self) -> None:
        self.work_root.mkdir(parents=True, exist_ok=True)
        self._spawn(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", str(self.port),
             "--webui-port", str(_free_port())],
            "master.log",
        )
        self._wait_log("master.log", "I have been elected leader", 60)
        for i in range(self.n_workers):
            lo, hi = i * self.cpe, (i + 1) * self.cpe - 1
            self._spawn(
                _taskset(f"{lo}-{hi}")
                + [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                   self.master_url, "--cores", str(self.cpe), "--memory", "7g",
                   "--webui-port", str(_free_port()),
                   "--work-dir", str(self.work_root / f"worker{i}")],
                f"worker{i}.log",
            )
        for i in range(self.n_workers):
            self._wait_log(f"worker{i}.log", "Successfully registered with master", 60)

    def _wait_log(self, log: str, needle: str, timeout_s: float) -> None:
        path = self.work_root / log
        t0 = time.time()
        while time.time() - t0 < timeout_s:
            if path.exists() and needle in path.read_text(errors="replace"):
                return
            time.sleep(0.3)
        raise RuntimeError(f"{log}: '{needle}' not seen within {timeout_s}s")

    def stop(self) -> None:
        for p in reversed(self.procs):
            try:
                os.killpg(p.pid, signal.SIGTERM)
            except ProcessLookupError:
                pass
        for p in self.procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                os.killpg(p.pid, signal.SIGKILL)
        self.procs.clear()


def run_level(
    n_execs: int,
    cpe: int,
    corpus: str,
    pyfiles: str,
    work_root: str,
    driver_cores: str,
    runs: int = 1,
    arrow_batch: int | None = None,
    warm_corpus: str | None = None,
    job: str = "extraction",
    timeout_s: int = 1800,
) -> dict:
    """One fresh cluster at n_execs workers; submit run_scale.py; JSON out."""
    cluster = Cluster(n_execs, cpe, work_root)
    try:
        cluster.start()
        total = n_execs * cpe
        cmd = (
            _taskset(driver_cores)
            + [SPARK_SUBMIT, "--master", cluster.master_url,
               "--py-files", pyfiles,
               "--deploy-mode", "client",
               "--conf", f"spark.executor.cores={cpe}",
               "--conf", "spark.executor.memory=6g",
               "--conf", f"spark.cores.max={total}",
               "--conf", "spark.driver.memory=4g",
               # steady-state executor heap, as on a tuned deployment
               "--conf", "spark.executor.extraJavaOptions=-Xms6g -XX:+AlwaysPreTouch",
               "--conf", "spark.ui.enabled=false",
               "--conf", "spark.ui.showConsoleProgress=false",
               str(REPO / "bench" / "run_scale.py"),
               "--cores", str(total), "--corpus", corpus, "--runs", str(runs),
               "--receipts", "--tasktime", "--job", job]
        )
        if arrow_batch:
            cmd += ["--arrow-batch", str(arrow_batch)]
        if warm_corpus:
            cmd += ["--warm-corpus", warm_corpus]
        env = dict(os.environ)
        env["SPARK_GRAFT_MASTER"] = cluster.master_url
        env.pop("SPARK_GRAFT_CPUS", None)
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=str(REPO), env=env,
            timeout=timeout_s,
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"submit failed (execs={n_execs}):\n{out.stdout[-4000:]}\n{out.stderr[-4000:]}"
            )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        rec["executors"] = n_execs
        return rec
    finally:
        cluster.stop()
        shutil.rmtree(work_root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--execs", type=int, default=1, help="small cluster size N (executors)")
    ap.add_argument("--cores-per-exec", type=int, default=2)
    ap.add_argument("--docs", type=int, default=240000)
    ap.add_argument("--bitmap-docs", type=int, default=12000)
    ap.add_argument("--rounds", type=int, default=2, help="interleaved best-of rounds")
    ap.add_argument("--skip-bitmap", action="store_true")
    ap.add_argument(
        "--bitmap-only",
        action="store_true",
        help="measure only the bitmap job (results go to a separate "
        "cluster-NxC-bitmap.json so a pipeline result file is not clobbered)",
    )
    ap.add_argument(
        "--curation-only",
        action="store_true",
        help="measure only the corpus-curation flagship (train_corpus_filtered "
        "over the replicated documents table from bench/curation_scale.py; "
        "results go to a separate cluster-NxC-curation.json)",
    )
    ap.add_argument("--curation-replicas", type=int, default=48)
    ap.add_argument(
        "--ceiling",
        action="store_true",
        help="also measure the host's pure-CPU scaling ceiling (pinned md5 "
        "process pools, no Spark) at the same two total-core counts and "
        "embed it — the machine-normalization receipt for a virtualized host",
    )
    args = ap.parse_args()
    n, n4, cpe = args.execs, args.execs * 4, args.cores_per_exec

    ncpu = os.cpu_count() or 32
    need = n4 * cpe
    assert need + 4 <= ncpu, f"4N cluster needs {need}+4 cores, host has {ncpu}"
    driver_cores = f"{ncpu - 4}-{ncpu - 1}"  # same reserved driver cores at BOTH levels

    run_curation = args.curation_only
    run_pipeline = not args.bitmap_only and not run_curation
    run_bitmap = not args.skip_bitmap and not args.curation_only
    assert run_pipeline or run_bitmap or run_curation, (
        "--bitmap-only and --skip-bitmap conflict"
    )

    cdir = REPO / ".bench_cache" / f"corpus-v{fixtures.FIXTURE_VERSION}-{SEED}-{args.docs}"
    if run_pipeline and not (cdir / "spans").exists():
        print(f"generating corpus ({args.docs} docs)…", file=sys.stderr)
        fixtures.write_corpus(str(cdir), args.docs, seed=SEED, docs_per_file=1000)
    bdir = REPO / ".bench_cache" / f"bitmap-v{fixtures.BITMAP_FIXTURE_VERSION}l2-{SEED}-{args.bitmap_docs}"
    if run_bitmap and not (bdir / "spans").exists():
        print(f"generating bitmap corpus ({args.bitmap_docs} docs)…", file=sys.stderr)
        fixtures.write_bitmap_corpus(str(bdir), args.bitmap_docs, seed=SEED)

    pyfiles = subprocess.run(
        [sys.executable, str(REPO / "bench" / "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    # warm-up corpora: a small same-shape corpus warms python workers /
    # numpy / codegen without paying a full extra pass over the real input
    wdir = REPO / ".bench_cache" / f"corpus-v{fixtures.FIXTURE_VERSION}-{SEED}-4000"
    if run_pipeline and not (wdir / "spans").exists():
        fixtures.write_corpus(str(wdir), 4000, seed=SEED, docs_per_file=500)
    wbdir = REPO / ".bench_cache" / f"bitmap-v{fixtures.BITMAP_FIXTURE_VERSION}l2-{SEED}-800"
    if run_bitmap and not (wbdir / "spans").exists():
        fixtures.write_bitmap_corpus(str(wbdir), 800, seed=SEED)

    def interleaved(
        corpus: str,
        arrow_batch: int | None = None,
        job: str = "extraction",
        warm: str | None = None,
        timeout_s: int = 1800,
    ) -> tuple[dict, dict]:
        if warm is None:
            warm = str(wbdir) if arrow_batch else str(wdir)
        best: dict[int, dict] = {}
        for r in range(args.rounds):
            for execs in (n, n4):
                rec = run_level(
                    execs, cpe, corpus, pyfiles,
                    work_root=f"/tmp/spark-cluster-{execs}x{cpe}",
                    driver_cores=driver_cores, runs=1, arrow_batch=arrow_batch,
                    warm_corpus=warm, job=job, timeout_s=timeout_s,
                )
                print(f"round {r}: {execs} exec × {cpe}c → {rec['docs_per_sec']} docs/s",
                      file=sys.stderr)
                if execs not in best or rec["seconds"] < best[execs]["seconds"]:
                    best[execs] = rec
        return best[n], best[n4]

    result = {
        "protocol": (
            f"standalone cluster, {n} vs {n4} executors × {cpe} cores, "
            "separate pinned JVMs, spark-submit --py-files"
        ),
        "pass_threshold": 0.8,
    }
    effs = []
    if run_pipeline:
        lo, hi = interleaved(str(cdir))
        eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
        effs.append(eff)
        result.update(
            docs=lo["docs"],
            **{f"{n}_executors": lo, f"{n4}_executors": hi},
            scaling_efficiency=round(eff, 3),
        )
    if run_curation:
        sys.path.insert(0, str(REPO / "bench"))
        from curation_scale import SRC_SF, build_corpus

        cur_dir = build_corpus(args.curation_replicas)
        # the 1-exec level walls ~0.5 s per replica (759 s at 1536r):
        # scale the per-level backstop with corpus size instead of the
        # 1800 s default, which killed the first 6144r attempt mid-level
        clo, chi = interleaved(
            cur_dir, job="curation", warm=SRC_SF,
            timeout_s=max(1800, args.curation_replicas * 2),
        )
        ceff = chi["docs_per_sec"] / (4 * clo["docs_per_sec"])
        # gate judged AFTER normalization when --ceiling provides the
        # matched gram-shaped control (see below): the raw curation ratio
        # on one shared-bus VM measures the machine above ~8 concurrent
        # gram workers, and judging it raw contradicts the normalization
        # this harness embeds (r5 review finding)
        curation_eff_idx = len(effs)
        effs.append(ceff)
        result.update(
            curation_docs=clo["docs"],
            **{f"curation_{n}_executors": clo, f"curation_{n4}_executors": chi},
            curation_scaling_efficiency=round(ceff, 3),
        )
    if run_bitmap:
        blo, bhi = interleaved(str(bdir), arrow_batch=256)
        beff = bhi["docs_per_sec"] / (4 * blo["docs_per_sec"])
        effs.append(beff)
        result.update(
            bitmap_docs=blo["docs"],
            **{f"bitmap_{n}_executors": blo, f"bitmap_{n4}_executors": bhi},
            bitmap_scaling_efficiency=round(beff, 3),
        )
    if args.ceiling:
        sys.path.insert(0, str(REPO / "bench"))
        from scaling import gram_cpu_ceiling, raw_cpu_ceiling

        ceil = raw_cpu_ceiling(n * cpe, n4 * cpe)
        result["cpu_ceiling"] = ceil
        # a control cannot legitimately out-scale perfect linearity: a
        # reading > 1.0 means the control run itself caught a noise window
        # (e.g. the low-core pass stalled), and dividing by it would
        # PENALIZE a raw pass.  Clamp at 1.0 — normalization exists to
        # excuse machine limits, never to raise the bar above raw.
        result["normalized"] = {
            k: round(result[k] / min(1.0, ceil["efficiency"]), 3)
            for k in (
                "scaling_efficiency",
                "bitmap_scaling_efficiency",
            )
            if k in result
        }
        if "curation_scaling_efficiency" in result:
            # the md5 burn is cache-resident and near-linear on this VM;
            # the curation map stages stream freshly-allocated gram arrays
            # through memory, so their honest machine ceiling is the
            # gram-shaped control (stage receipts: the dominant stages have
            # ZERO remote shuffle — what inflates cross-level is the bus)
            gceil = gram_cpu_ceiling(
                n * cpe, n4 * cpe, f"{SRC_SF}/documents.parquet"
            )
            result["gram_cpu_ceiling"] = gceil
            # same clamp as above: a superlinear control is self-noise
            norm_ceff = round(
                result["curation_scaling_efficiency"]
                / min(1.0, gceil["efficiency"]),
                3,
            )
            result["normalized"]["curation_scaling_efficiency"] = norm_ceff
            # the gate judges the machine-normalized value (both raw and
            # normalized are recorded; same-window control)
            effs[curation_eff_idx] = norm_ceff
    result["passed"] = all(e >= 0.8 for e in effs)
    print(json.dumps(result))
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    (REPO / "BENCH").mkdir(exist_ok=True)
    # partial runs get their own files so a --skip-bitmap rerun can't clobber
    # a previously recorded combined/bitmap result (and vice versa)
    # non-default curation corpus sizes get their own file too, so a
    # floor-amortization sweep (48 vs 96 replicas) keeps both datapoints
    cur_suffix = "-curation" + (
        "" if args.curation_replicas == 48 else f"-{args.curation_replicas}r"
    )
    suffix = (
        cur_suffix
        if args.curation_only
        else "-bitmap"
        if args.bitmap_only
        else "-pipeline"
        if args.skip_bitmap
        else ""
    )
    (REPO / "BENCH" / f"cluster-{n}x{cpe}{suffix}.json").write_text(
        json.dumps({"generated": stamp, **result}, indent=2) + "\n"
    )


if __name__ == "__main__":
    main()
