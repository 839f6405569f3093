"""Sinks, checkpointing and resume (S4/S5/S7, X4/X5 — SURVEY.md §2.1, §2.9).

The reference spills per-PDF interim JSON so blobs never ride the broker and a
crashed batch can restart from files (/root/reference/app/tasks.py:444-466,
548-549), relies on Celery acks_late redelivery for worker death
(tasks.py:534-540), and expires results after 72 h (tasks.py:306-327).  Here:

- ``materialize_run``: write the span spine ONCE (the \"interim\" checkpoint),
  then derive spans_out / lineage / metrics / conf_hist from the written copy
  — one pass over the expensive branches regardless of how many outputs are
  read.  On a cluster this directory is an Iceberg table
  (``writeTo(...).append()``) and snapshot expiry replaces the retention job;
  local parquet keeps the layout identical.
- Resume: each run's spine lands in its own ``spine/run=<id>`` directory and
  only directories carrying a ``_SUCCESS`` commit marker are trusted — a spine
  left half-visible by a crash mid-commit (non-atomic object-store rename,
  speculative leftovers) is ignored entirely, so a document can never be
  treated as done with only some of its spans checkpointed.  Restart then
  anti-joins the committed doc_ids so only unfinished documents re-run
  (replaces acks_late redelivery with data-level idempotence; on Iceberg the
  marker is the snapshot commit itself).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.assemble import reassemble
from engine.metrics import conf_histogram_df, lineage_df, metrics_df
from engine.pipeline import build_spine


def spine_path(out_dir: str) -> str:
    return os.path.join(out_dir, "spine")


def committed_spine_dirs(out_dir: str) -> list[str]:
    """Spine run-directories that finished their write — i.e. carry the
    file-committer's _SUCCESS marker.  Partially-visible output (crash during
    job commit) has no marker and is never trusted by resume."""
    spath = spine_path(out_dir)
    if not os.path.isdir(spath):
        return []
    return sorted(
        os.path.join(spath, d)
        for d in os.listdir(spath)
        if os.path.isfile(os.path.join(spath, d, "_SUCCESS"))
    )


def expire_runs(base_dir: str, keep_hours: float = 72.0) -> list[str]:
    """S7 retention: delete run directories older than the TTL (the reference
    expires results after 72 h — app/config.py:33, app/tasks.py:306-327;
    on Iceberg this is expire_snapshots)."""
    import shutil
    import time

    removed = []
    cutoff = time.time() - keep_hours * 3600
    if not os.path.isdir(base_dir):
        return removed
    for name in os.listdir(base_dir):
        path = os.path.join(base_dir, name)
        if os.path.isdir(path) and os.path.getmtime(path) < cutoff:
            shutil.rmtree(path)
            removed.append(path)
    return removed


def materialize_run(
    spark: SparkSession,
    spans: DataFrame,
    blobs: DataFrame,
    out_dir: str,
    run_id: str,
    resume: bool = True,
) -> dict[str, DataFrame]:
    """Run the pipeline with a durable spine checkpoint; returns the output
    frames read back from disk (cheap narrow scans, re-runnable).

    Each invocation writes ``spine/run=<run_id>`` with mode=overwrite: a retry
    of the SAME run_id replaces its own partial output instead of appending
    duplicates, and resume only ever reads _SUCCESS-committed run dirs.
    The run's OWN directory is excluded from the resume anti-join — otherwise
    a redelivered run_id would see its previous (possibly complete) output,
    anti-join every doc away, and overwrite the committed spine with an empty
    one (the exact at-least-once redelivery this function exists to make
    idempotent)."""
    todo = spans
    own = os.path.join(spine_path(out_dir), f"run={run_id}")
    committed = (
        [d for d in committed_spine_dirs(out_dir) if d != own] if resume else []
    )
    if committed:
        done = spark.read.parquet(*committed).select("doc_id").distinct()
        todo = spans.join(done, "doc_id", "left_anti")
    run_dir = os.path.join(spine_path(out_dir), f"run={run_id}")
    build_spine(spark, todo, blobs).write.mode("overwrite").parquet(run_dir)

    full = spark.read.parquet(*committed_spine_dirs(out_dir))
    out = {
        "spans_out": reassemble(full),
        "lineage": lineage_df(full, run_id),
        "metrics": metrics_df(full, run_id),
        "conf_hist": conf_histogram_df(full, run_id),
    }
    for name in tuple(out):
        out[name].write.mode("overwrite").parquet(os.path.join(out_dir, name))
        out[name] = spark.read.parquet(os.path.join(out_dir, name))
    return out
