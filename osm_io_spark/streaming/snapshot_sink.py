"""Streaming → snapshot-catalog sink (foreachBatch + atomic commits).

Bridges Structured Streaming into the engine's snapshot/manifest layer:
each micro-batch commits as one snapshot partition named by its epoch
id, with lineage recording the query name and epoch. Combined with the
stream's own checkpoint (offsets), this gives end-to-end idempotent
delivery: a replayed epoch (failure between sink write and offset
commit) OVERWRITES its own partition — the rename-based partition
commit makes the second attempt replace, not duplicate, the first
(the standard foreachBatch exactly-once recipe, expressed against our
catalog instead of a Delta/Iceberg runtime).

Downstream consumers use plans.snapshots.changes(table, spark, v) to
incrementally read only the epochs committed since the version they
last processed.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from ..plans.snapshots import SnapshotTable


def snapshot_sink_writer(table: SnapshotTable, query_name: str,
                         stats_columns: list[str] | None = None):
    """Returns the (batch_df, epoch_id) function for foreachBatch."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        entry = table.write_partition(
            batch_df, f"epoch={epoch_id:08d}",
            lineage={"job": query_name, "epoch": int(epoch_id),
                     "mode": "streaming"},
            stats_columns=stats_columns)
        table.commit_partitions([entry], f"{query_name}:epoch",
                                {"job": query_name})

    return write_batch


def run_stream_to_snapshots(stream_df: DataFrame, table: SnapshotTable,
                            checkpoint: str, query_name: str,
                            available_now: bool = True,
                            stats_columns: list[str] | None = None) -> Any:
    """Start (and for availableNow, drain) a stream into the catalog."""
    writer = (stream_df.writeStream
              .queryName(query_name)
              .foreachBatch(snapshot_sink_writer(table, query_name,
                                                 stats_columns))
              .option("checkpointLocation", checkpoint))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
