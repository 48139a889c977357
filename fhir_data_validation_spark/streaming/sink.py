"""Structured-Streaming sink into a :class:`~..sources.iceberg_py.
PyIcebergTable` — the write half of the continuous loop whose read half
is :class:`.SnapshotMonitor`:

    stream → ``foreachBatch`` append snapshots → snapshot log →
    monitor poll → delta validation

Each micro-batch commits ONE append snapshot, so the snapshot log doubles
as the stream's batch history (time-travel to any batch boundary,
``incremental()`` between any two). Exactly-once: Spark's ``foreachBatch``
re-runs a batch after a failure with the SAME ``epoch_id`` — the sink
writes the epoch into the snapshot SUMMARY of the very commit that
carries the batch (``append(summary_extra=…)``), so the replay marker is
atomic with the data: a crash anywhere leaves either no commit (replay
re-appends) or a commit whose summary already names the epoch (replay
skips). A sidecar guard file would reopen the gap — written before the
commit it can skip a batch that never landed; written after, a crash in
between double-appends on replay.

At cluster scale the same code runs unchanged — the sink only uses the
driver-side ``foreachBatch`` hook plus the table's normal append path
(executors write the parquet; the driver commits the manifest).

Cite: the reference validates one immutable bundle per request
(``Core/ValidationPipeline.cs:486-604``); this keeps the bundles flowing
in from a stream with that contract intact per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.iceberg_py import PyIcebergTable


class IcebergStreamSink:
    """``foreachBatch`` callable committing each micro-batch as an append
    snapshot, idempotent per ``(name, epoch_id)``.

    ``name`` scopes the replay guard — two different streaming queries
    appending to the same table must use distinct names (one shared name
    would make them skip each other's epochs)."""

    def __init__(self, table: PyIcebergTable, name: str = "sink"):
        self.table = table
        self.name = name
        self._summary_key = f"sink-{name}-epoch"

    def last_epoch(self) -> int:
        """Highest epoch this sink has COMMITTED, read from the snapshot
        summaries — the markers travel inside the commits themselves, so
        this can never disagree with the table's actual contents (and it
        survives expire_snapshots only as far as the data does)."""
        meta = self.table._load_meta()
        epochs = [int(s["summary"][self._summary_key])
                  for s in meta.get("snapshots", [])
                  if self._summary_key in s.get("summary", {})]
        return max(epochs, default=-1)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= self.last_epoch():       # checkpoint replay
            return
        # the epoch marker rides in the snapshot summary of THIS commit —
        # atomic: either the batch landed with its marker or neither exists
        self.table.append(batch_df,
                          summary_extra={self._summary_key: str(epoch_id)})


def write_stream_to_table(stream_df: DataFrame, table: PyIcebergTable,
                          checkpoint_dir: str, name: str = "sink",
                          available_now: bool = True):
    """Start a streaming query appending ``stream_df`` into ``table`` —
    one append snapshot per micro-batch, replay-safe (see
    :class:`IcebergStreamSink`). ``available_now=True`` drains the
    source's current backlog and stops (the batch-ingest pattern);
    ``False`` runs continuously. Returns the ``StreamingQuery``."""
    writer = (stream_df.writeStream
              .foreachBatch(IcebergStreamSink(table, name))
              .option("checkpointLocation", checkpoint_dir)
              .queryName(f"iceberg-{name}"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
