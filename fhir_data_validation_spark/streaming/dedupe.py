"""Streaming exact-dedup: watermark-bounded duplicate suppression.

The streaming lift of ``pipeline.dedup.exact_duplicates``: an ingest
stream drops documents whose normalized-text fingerprint was already seen
within the watermark window, using Spark's state-store-backed
``dropDuplicatesWithinWatermark`` — state size is bounded by the delay
window (expired fingerprints are evicted), so the operator runs forever.
Batch dedup (the full-corpus pass) stays the authority for cross-window
duplicates; this lane keeps near-real-time ingest clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.text import fingerprint

FINGERPRINT_COL = "_fingerprint"


def dedup_stream(stream: DataFrame, ts_col: str, delay: str = "10 minutes",
                 text_col: str = "text",
                 keep_fingerprint: bool = False) -> DataFrame:
    """First-seen rows per fingerprint within the watermark window.

    ``delay`` is the lateness bound: a duplicate arriving more than
    ``delay`` after its original passes through (its state has been
    evicted) — the deliberate state/completeness trade of every
    watermarked streaming operator. Exactly the semantics of
    ``dropDuplicatesWithinWatermark`` (Spark 3.5+)."""
    out = (stream
           .withColumn(FINGERPRINT_COL, fingerprint(F.col(text_col)))
           .withWatermark(ts_col, delay)
           .dropDuplicatesWithinWatermark([FINGERPRINT_COL]))
    return out if keep_fingerprint else out.drop(FINGERPRINT_COL)


class SemanticDedupStream:
    """Streaming SemDeDup: a ``foreachBatch`` callable classifying each
    micro-batch of embeddings against a DURABLE survivor index — the
    streaming lift of :func:`..pipeline.similarity.semantic_dedup_incremental`
    (which see for the semantics), with exactly-once epoch handling.

    Two PyIceberg tables: ``verdict_table`` accumulates per-doc verdicts,
    ``index_table`` holds the surviving ``(id, cell, _nv)`` rows every
    later batch dedups against. Each epoch commits verdicts FIRST, then
    the index delta, both under :class:`.sink.IcebergStreamSink`'s atomic
    epoch-property guard — a crash between the two replays into
    "verdicts skip, index redoes", and the redo recomputes from the
    still-unpolluted pre-batch index (deterministic batch ⇒ identical
    delta). Committing in the other order would poison the replay: the
    batch would dedup against its own half-committed delta.

    ``centroids`` must be the pinned array every epoch shares (the
    incremental contract). State grows with the SURVIVOR count only —
    duplicates never enter the index.
    """

    def __init__(self, index_table, verdict_table, centroids,
                 threshold: float = 0.95, id_col: str = "vec_id",
                 vec_col: str = "embedding", name: str = "semdedup"):
        import numpy as np

        from .sink import IcebergStreamSink
        self.centroids = np.asarray(centroids, dtype=float)
        self.threshold = float(threshold)
        self.id_col, self.vec_col = id_col, vec_col
        self.index_table = index_table
        self._vsink = IcebergStreamSink(verdict_table, f"{name}-verdicts")
        self._isink = IcebergStreamSink(index_table, f"{name}-index")

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..pipeline import dedup as _dedup
        from ..pipeline.similarity import semantic_dedup_incremental
        if (epoch_id <= self._vsink.last_epoch()
                and epoch_id <= self._isink.last_epoch()):
            return                            # full replay — both landed
        index = self.index_table.read().select(
            self.id_col, "cell", "_nv")
        verdicts, delta = semantic_dedup_incremental(
            batch_df, index, self.centroids, self.threshold,
            id_col=self.id_col, vec_col=self.vec_col)
        try:
            self._vsink(verdicts, epoch_id)   # guard skips if replayed
            self._isink(delta, epoch_id)
        finally:
            _dedup.unpersist_all()
