"""Event-time analytics: sessionization + tumbling windows."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark.pipeline import events


@pytest.fixture(scope="module")
def stream(spark):
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)
    rows = [
        (1, 7, t(0), 10.0, "view"),     # u7 session 0
        (2, 7, t(10), 5.0, "view"),     # gap 10m  -> same session
        (3, 7, t(50), 2.0, "buy"),      # gap 40m  -> session 1
        (4, 7, t(55), 1.0, "view"),     # session 1
        (5, 9, t(5), 7.0, "view"),      # u9 session 0 (single event)
        (6, 9, t(36), 3.0, "view"),     # gap 31m -> session 1
        (7, 9, t(36), 4.0, "buy"),      # same ts -> event_id tiebreak
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double, "
              "event_type string")


def test_sessionize_gap_semantics(spark, stream):
    out = {r["event_id"]: r["session_seq"] for r in
           events.sessionize(stream, gap_minutes=30,
                             order_cols=("event_id",)).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 1, 7: 1}
    with pytest.raises(ValueError):
        events.sessionize(stream, gap_minutes=0)


def test_session_stats(spark, stream):
    got = {(r["user_id"], r["session_seq"]): r for r in
           events.session_stats(stream, gap_minutes=30, value_col="value",
                                order_cols=("event_id",)).collect()}
    s = got[(7, 1)]
    assert s["n_events"] == 2 and s["total_value"] == 3.0
    assert s["duration_sec"] == 300.0            # 00:50 -> 00:55
    assert got[(9, 0)]["n_events"] == 1
    assert got[(9, 0)]["duration_sec"] == 0.0
    assert got[(9, 1)]["n_events"] == 2          # same-ts events together


def test_tumbling_agg_daily_and_keys(spark):
    rows = [(1, datetime(2024, 1, 1, 5), "a", 1.0),
            (2, datetime(2024, 1, 1, 23, 59, 59), "a", 2.0),
            (3, datetime(2024, 1, 2, 0, 0), "a", 4.0),
            (4, datetime(2024, 1, 2, 12), "b", 8.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, k string, value double")
    got = {(r["window_start_us"], r["k"]): (r["n_events"], r["total_value"])
           for r in events.tumbling_agg(df, "1 day", keys=("k",),
                                        value_col="value").collect()}
    d1 = int(datetime(2024, 1, 1).timestamp() * 1e6)
    d2 = int(datetime(2024, 1, 2).timestamp() * 1e6)
    assert got == {(d1, "a"): (2, 3.0), (d2, "a"): (1, 4.0),
                   (d2, "b"): (1, 8.0)}


def test_sessionize_agrees_with_native_session_window(spark):
    """Cross-check against Spark's own session_window: same gap semantics
    (a new event within `gap` of the previous extends the session), so
    per-user session event-counts and start times must coincide."""
    df = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("event_id", "user_id",
                  F.col("ts").cast("timestamp").alias("ts")))
    mine = {(r["user_id"], r["start_us"]): r["n_events"] for r in
            events.session_stats(df, gap_minutes=30,
                                 order_cols=("event_id",)).collect()}
    native = {(r["user_id"], r["start_us"]): r["n"] for r in
              df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
              .agg(F.count(F.lit(1)).alias("n"))
              .select("user_id", "n",
                      F.unix_micros(F.col("session_window.start"))
                      .alias("start_us"))
              .collect()}
    assert mine == native and len(mine) > 100


def test_hopping_windows(spark):
    rows = [(1, datetime(2024, 1, 1, 5), 1.0),    # day1 00h + dec31 12h
            (2, datetime(2024, 1, 1, 14), 2.0)]   # day1 00h + day1 12h
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = {r["window_start_us"]: r["n_events"] for r in
           events.tumbling_agg(df, "1 day", slide="12 hours").collect()}
    us = lambda *a: int(datetime(*a).timestamp() * 1e6)
    assert got == {us(2023, 12, 31, 12): 1, us(2024, 1, 1): 2,
                   us(2024, 1, 1, 12): 1}
