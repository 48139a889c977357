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
