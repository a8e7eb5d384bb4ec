"""Streaming sinks with exactly-once-effect semantics (§2.9 production
pattern; engine extension — the reference has no streaming).

Structured Streaming's file sink is append-only; a failed-and-replayed
micro-batch with a plain ``foreachBatch`` writer would duplicate rows.
``start_idempotent_partition_sink`` composes ``foreachBatch`` with dynamic
partition overwrite (sources/io.py:overwrite_partitions): a replayed batch
rewrites exactly the partitions it already wrote, so re-delivery converges
to the same files instead of appending twice. This is the standard
exactly-once-effect recipe when the sink is a hive-partitioned table and
each batch is partition-complete (every partition it touches, it fully
owns for that write — true for time-partitioned batch output where the
partition key is derived from the batch's event-time window).

Scale notes: the sink work is a normal distributed write per micro-batch —
no driver-side data movement; the checkpoint directory stores only offsets
and batch ids. State on replay is bounded by one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from wicsmmiretl_spark.sources.io import overwrite_partitions


def start_idempotent_partition_sink(
    stream_df: DataFrame,
    path: str,
    partition_by: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming write where micro-batch replays are idempotent.

    Each micro-batch lands via dynamic partition overwrite, keyed by
    ``partition_by``: re-running a batch (driver restart between sink write
    and offset commit) overwrites the same partitions with the same rows.
    Requires batches to be partition-complete w.r.t. ``partition_by``.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        overwrite_partitions(batch_df, path, partition_by)

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
