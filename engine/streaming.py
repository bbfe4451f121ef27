"""Structured-Streaming ingest into the table format.

The reference has no continuous streaming — its incremental model is
micro-batch: an explicit index call diffs state and writes one batch
(SURVEY §2.10; /root/reference/src/client/indexing/mod.rs:1100-1143).
The Spark-native generalization is Structured Streaming with
``Trigger.AvailableNow``: drain whatever corpus deltas are pending as a
sequence of micro-batches, each committed through the same snapshot /
MERGE machinery, then stop.  State (which files are already absorbed)
lives in the table itself via commit-equality — a replayed batch
MERGEs to zero changes (the commit anti-join, J7), giving effective
exactly-once on top of at-least-once delivery.

``ingest_stream`` is the generic sink: any streaming DataFrame of
corpus rows -> foreachBatch -> MERGE INTO.  ``ingest_directory`` wires
it to a parquet-file source (new files under a drop directory are the
"pending deltas", the streaming analog of the reference's file walk).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .ops.merge import MergeResult, merge_into
from .tablefmt import CORPUS_SCHEMA, Table


def ingest_stream(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Attach a MERGE-INTO sink to a streaming corpus DataFrame.

    Returns the started StreamingQuery.  Each micro-batch is one
    atomic snapshot commit; batch replay after a crash is absorbed by
    commit-equality (MERGE no-op), so the pipeline is idempotent.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(table.root, "_stream_checkpoint")
    results: list[MergeResult] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        r = merge_into(spark, table, batch_df)
        results.append(r)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q._merge_results = results  # introspection for tests/metrics
    return q


def ingest_directory(
    spark: SparkSession,
    drop_dir: str,
    table: Table,
    max_files_per_batch: int = 64,
    checkpoint_dir: str | None = None,
):
    """Stream parquet corpus files from a drop directory into the table
    (AvailableNow: drain pending files in rate-limited micro-batches,
    then stop — the reference's 'index whatever changed now' call)."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(drop_dir)
    )
    return ingest_stream(stream, table, checkpoint_dir=checkpoint_dir)
