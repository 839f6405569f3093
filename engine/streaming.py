"""Structured Streaming execution of the same pipeline (SURVEY.md §2.9).

The reference's "streaming" is a producer/consumer page stream with a sliding
inference window and out-of-order completion (X1/X2 —
/root/reference/app/core/document/pdf_processor.py:1208-1258,
janzour_processor.py:233-309).  In Spark the same dataflow runs unchanged as a
micro-batched stream: ``readStream`` on the spans source, the identical
branch/route/strip transforms, and a ``foreachBatch`` sink that re-nests and
appends per micro-batch.  Ordering remains a property of the data (offset), so
late or out-of-order arrival of whole documents is absorbed exactly as in
batch; per-batch lineage/metrics appends give the progress stream (X8).

Batch/stream share one code path: ``build_spine`` is called inside
foreachBatch — no logic is duplicated for the streaming case.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from engine.assemble import reassemble
from engine.metrics import lineage_df, metrics_df
from engine.pipeline import build_spine
from engine.schema import SPANS_SCHEMA


def stream_extraction(
    spark: SparkSession,
    spans_source_dir: str,
    blobs: DataFrame,
    out_dir: str,
    run_id: str,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """File-source streaming run: each micro-batch of spans parquet files is
    extracted and appended to spans_out/lineage/metrics parquet sinks.

    ``available_now=True`` drains the existing backlog then stops — the
    bounded-stream mode used by tests and checkpointed backfills; with
    ``False`` the query keeps tailing the directory.
    """
    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(spans_source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spine = build_spine(batch_df.sparkSession, batch_df, blobs)
        reassemble(spine).write.mode("append").parquet(os.path.join(out_dir, "spans_out"))
        lineage_df(spine, run_id).write.mode("append").parquet(
            os.path.join(out_dir, "lineage")
        )
        metrics_df(spine, run_id).write.mode("append").parquet(
            os.path.join(out_dir, "metrics")
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
