"""Event-time analytics: sessionization and fixed-window aggregation over
an event stream table.

The batch twins of the streaming module's watermarked operators: the same
session / tumbling-window semantics computed over a bounded snapshot scan,
with an exact ANSI-SQL oracle. Everything is native window/aggregate
expressions — no Python in the plan.

Scale shape: sessionization partitions by user — per-user event counts are
bounded in real streams, so tasks stay small at any corpus size (a
pathological bot user is the skew case: pre-filter it, or use the
streaming module's ``applyInPandasWithState`` path which bounds state by
watermark instead). The tumbling aggregation is a plain map-side-combined
groupBy on (bucket, keys) — one shuffle of O(buckets × keys).

No reference analog (the reference validates point-in-time payloads);
training-data-pipeline / telemetry surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Epoch microseconds. The cast makes TIMESTAMP_NTZ inputs (parquet
    default) work too; the session timezone is pinned to UTC
    (session.get_spark), so NTZ values are interpreted as UTC — the same
    convention as the DuckDB oracle's ``epoch_us``."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(df: DataFrame, gap_minutes: float = 30.0,
               user_col: str = "user_id", ts_col: str = "ts",
               order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Assign each event to a session: a new session starts at a user's first
    event and whenever the gap to their previous event exceeds
    ``gap_minutes``. Adds ``session_seq`` (0-based per user).

    Deterministic: events order by ``(ts, *order_cols)`` within the user —
    pass the event id in ``order_cols`` when timestamps can collide.
    """
    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be positive")
    gap_us = int(gap_minutes * 60 * 1_000_000)
    order = [F.col(ts_col), *(F.col(c) for c in order_cols)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # integer microsecond arithmetic: exact, and the oracle states the
    # identical epoch_us comparison
    is_new = F.when(
        prev.isNull()
        | ((_us(F.col(ts_col)) - _us(prev)) > F.lit(gap_us)),
        F.lit(1)).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_seq", (F.sum(is_new).over(run) - 1).cast("long"))


def session_stats(df: DataFrame, gap_minutes: float = 30.0,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str | None = None,
                  order_cols: tuple[str, ...] = ()) -> DataFrame:
    """One row per session: ``(user, session_seq, n_events, start_us,
    end_us, duration_sec[, total_value])`` — the sessionized stream
    reduced by a map-side-combined aggregation (events of one session are
    already co-partitioned by the sessionize window, so this aggregation
    adds no second shuffle of the events)."""
    s = sessionize(df, gap_minutes, user_col, ts_col, order_cols)
    aggs = [F.count(F.lit(1)).alias("n_events"),
            F.min(_us(F.col(ts_col))).alias("start_us"),
            F.max(_us(F.col(ts_col))).alias("end_us")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    # UNROUNDED: integer micros / 1e6 is the same IEEE division in any
    # engine; rounding it would split exact .5 half-way values between
    # JVM BigDecimal HALF_UP and C round-on-double (observed: 1147.97275
    # → 1147.9728 vs 1147.9727)
    return (s.groupBy(user_col, "session_seq").agg(*aggs)
            .withColumn("duration_sec",
                        (F.col("end_us") - F.col("start_us")) / 1e6))


def tumbling_agg(df: DataFrame, window_duration: str = "1 day",
                 keys: tuple[str, ...] = (), ts_col: str = "ts",
                 value_col: str | None = None,
                 slide: str | None = None) -> DataFrame:
    """Fixed (tumbling) or hopping (sliding) event-time windows:
    ``(window_start_us, *keys, n_events[, total_value])`` via Spark's
    native ``window()`` bucketing — the batch twin of the streaming
    monitor's watermarked windows. With ``slide`` (must divide the
    window), each event lands in ``window/slide`` overlapping buckets —
    the moving-average layout. One map-side-combined groupBy; windows
    align to the epoch (midnight UTC for day-multiples), matching
    ``date_trunc`` for whole-unit tumbling durations.
    """
    bucket = F.window(F.col(ts_col).cast("timestamp"),
                      window_duration, slide or window_duration)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return (df.groupBy(bucket.alias("_w"), *[F.col(k) for k in keys])
            .agg(*aggs)
            .withColumn("window_start_us", _us(F.col("_w.start")))
            .drop("_w"))
