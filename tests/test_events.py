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


def test_asof_join_backward_forward_tolerance(spark, stream):
    left = stream.where(F.col("event_type") == "view")
    right = stream.where(F.col("event_type") == "buy")
    back = {r["event_id"]: (r["event_id_r"], r["value_r"]) for r in
            events.asof_join(left, right, by=("user_id",),
                             right_cols=("event_id", "value"),
                             right_tie_cols=("event_id",)).collect()}
    # u7 buys at t50 (id 3); u9 buys at t36 (id 7)
    assert back == {1: (None, None), 2: (None, None),
                    4: (3, 2.0), 5: (None, None),
                    6: (7, 4.0)}  # equal ts matches backward
    fwd = {r["event_id"]: r["event_id_r"] for r in
           events.asof_join(left, right, by=("user_id",),
                            right_cols=("event_id",),
                            direction="forward").collect()}
    assert fwd == {1: 3, 2: 3, 4: None, 5: 7, 6: 7}
    # tolerance: u7 view at t55 is 5min after buy t50 -> survives 6min,
    # dies at 4min
    tol = {r["event_id"]: r["event_id_r"] for r in
           events.asof_join(left, right, by=("user_id",),
                            right_cols=("event_id",),
                            tolerance_us=4 * 60 * 1_000_000).collect()}
    assert tol[4] is None and tol[6] == 7
    with pytest.raises(ValueError):
        events.asof_join(left, right, by=())
    with pytest.raises(ValueError):
        events.asof_join(left, right, direction="nearest")


def test_asof_join_right_tie_cols_deterministic(spark):
    t = datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, 7, t)],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, 7, t, "a"), (11, 7, t, "b")],
        "event_id long, user_id long, ts timestamp, tag string")
    out = events.asof_join(left, right, by=("user_id",),
                           right_cols=("tag",),
                           right_tie_cols=("event_id",)).collect()
    assert out[0]["tag"] == "b"  # highest tiebreak orders last -> wins


def test_range_join_containment_and_left(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 25), (4, 99)], "id long, p long")
    ivl = spark.createDataFrame(
        [(0, 10, "a"), (10, 30, "b"), (200, 300, "c")],
        "lo long, hi long, tag string")
    inner = sorted((r["id"], r["tag"]) for r in events.range_join(
        pts, ivl, "p", "lo", "hi", bucket_width=7).collect())
    # closed bounds: p=10 hits both [0,10] and [10,30]
    assert inner == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]
    half = sorted((r["id"], r["tag"]) for r in events.range_join(
        pts, ivl, "p", "lo", "hi", bucket_width=7,
        bounds="half_open").collect())
    assert half == [(1, "a"), (2, "b"), (3, "b")]
    left = events.range_join(pts, ivl, "p", "lo", "hi", bucket_width=7,
                             how="left")
    assert left.where(F.col("id") == 4).collect()[0]["tag"] is None
    with pytest.raises(ValueError):
        events.range_join(pts, ivl, "p", "lo", "hi", bucket_width=0)


def test_range_join_exact_boundary_bins(spark):
    # values sitting exactly at / 1 unit before a bucket boundary at
    # epoch-microsecond magnitude: double division would mis-bin these
    w = 604_800_000_000  # 1 week in us
    base = 1_700_000_000_000_000  # ~2023 epoch us
    b0 = base - base % w
    pts = spark.createDataFrame(
        [(1, b0 + w - 1), (2, b0 + w), (3, b0)], "id long, p long")
    ivl = spark.createDataFrame([(b0, b0 + w - 1, "wk")],
                                "lo long, hi long, tag string")
    got = sorted(r["id"] for r in events.range_join(
        pts, ivl, "p", "lo", "hi", bucket_width=w).collect())
    assert got == [1, 3]


def test_rollup_cascade_levels_match_direct(spark, stream):
    out = events.rollup_cascade(stream, levels=("1 hour", "1 day"),
                                keys=("event_type",), value_col="value")
    rows = out.collect()
    levels = {r["level"] for r in rows}
    assert levels == {"1 hour", "1 day"}
    # day-level rows equal an independent direct aggregation
    day = {(r["window_start_us"], r["event_type"]):
           (r["n_events"], r["total_value"])
           for r in rows if r["level"] == "1 day"}
    direct = stream.groupBy(
        (F.unix_micros(F.col("ts")) - F.pmod(F.unix_micros(F.col("ts")),
                                             F.lit(86_400_000_000))
         ).alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
    for r in direct.collect():
        assert day[(r["w"], r["event_type"])] == (r["n"], r["v"])
    # hour rows roll up to day rows exactly
    import collections
    agg = collections.Counter()
    for r in rows:
        if r["level"] == "1 hour":
            d = r["window_start_us"] - r["window_start_us"] % 86_400_000_000
            agg[(d, r["event_type"])] += r["n_events"]
    assert {k: v for k, v in agg.items()} == {
        k: v[0] for k, v in day.items()}
    with pytest.raises(ValueError):
        events.rollup_cascade(stream, levels=("1 hour", "90 minutes"))
    with pytest.raises(ValueError):
        events.rollup_cascade(stream, levels=())


def test_rollup_cascade_single_pass_plan(spark, stream):
    out = events.rollup_cascade(stream, levels=("1 hour", "1 day"),
                                keys=("event_type",), value_col="value")
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # ONE Expand + one aggregate pair, no Union/join of per-level jobs
    assert plan.count("Expand") >= 1
    assert "Union" not in plan and "Join" not in plan


def test_retention_cohorts_matrix(spark):
    t = lambda d, h=0: datetime(2024, 1, d, h)
    rows = [(1, 7, t(1)), (2, 7, t(1, 5)), (3, 7, t(3)),   # u7: d1 cohort
            (4, 9, t(2)), (5, 9, t(4)),                     # u9: d2 cohort
            (6, 5, t(1))]                                   # u5: d1 cohort
    df = spark.createDataFrame(rows,
                               "event_id long, user_id long, ts timestamp")
    got = {(r["cohort_start_us"], r["offset"]): r["n_users"]
           for r in events.retention_cohorts(df, bucket="1 day").collect()}
    d1 = 1704067200000000  # 2024-01-01 UTC in us
    day = 86_400_000_000
    assert got == {(d1, 0): 2, (d1, 2): 1,        # u7+u5 day1; u7 back d3
                   (d1 + day, 0): 1, (d1 + day, 2): 1}  # u9 d2, back d4


def test_funnel_order_ties_and_envelope(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes in order
        (1, 1, t(0), "signup"), (2, 1, t(5), "click"),
        (3, 1, t(9), "purchase"),
        # u2: click BEFORE signup doesn't count; the later one does
        (4, 2, t(0), "click"), (5, 2, t(3), "signup"), (6, 2, t(8), "click"),
        # u3: same-timestamp signup+click both count (ties inclusive)
        (7, 3, t(2), "signup"), (8, 3, t(2), "click"),
        # u4: only funnel-typed events count toward membership
        (9, 4, t(1), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: (r["steps_completed"], r["t1_us"], r["t2_us"],
                          r["t3_us"])
           for r in events.funnel(
               df, steps=("signup", "click", "purchase")).collect()}
    us = lambda m: 1704067200000000 + m * 60_000_000
    assert got[1] == (3, us(0), us(5), us(9))
    assert got[2] == (2, us(3), us(8), None)
    assert got[3] == (2, us(2), us(2), None)
    assert got[4] == (0, None, None, None)
    # envelope: u1's purchase at +9min dies under an 8-minute envelope
    env = {r["user_id"]: r["steps_completed"]
           for r in events.funnel(df, steps=("signup", "click", "purchase"),
                                  within_us=8 * 60_000_000).collect()}
    assert env[1] == 2 and env[2] == 2
    with pytest.raises(ValueError):
        events.funnel(df, steps=("signup",))
    with pytest.raises(ValueError):
        events.funnel(df, steps=("signup", "signup"))


# --------------------------------------------- round-3 review regressions ---

def test_range_join_fractional_width_no_duplicates(spark):
    """Sub-1.0 bucket widths must not emit duplicate (point, interval)
    pairs: the float-width bin id is the quotient index, so consecutive
    buckets can never collapse to one id."""
    from fhir_data_validation_spark.pipeline.events import range_join
    pts = spark.createDataFrame([(1, 0.2), (2, 0.7)], "pid long, p double")
    ivl = spark.createDataFrame([(10, 0.0, 0.9)],
                                "iid long, lo double, hi double")
    out = range_join(pts, ivl, "p", "lo", "hi", bucket_width=0.5).collect()
    assert sorted((r["pid"], r["iid"]) for r in out) == [(1, 10), (2, 10)]
    assert len(out) == 2                      # exactly once per pair


def test_asof_join_null_timestamps(spark):
    """Null event times never fabricate matches: a null-ts left row keeps
    LEFT-ASOF shape (present, no payload) in BOTH directions, and a
    null-ts right row matches nothing."""
    from fhir_data_validation_spark.pipeline.events import asof_join
    left = spark.createDataFrame(
        [("u", 100, "a"), ("u", None, "b")],
        "user_id string, ts long, lbl string")
    right = spark.createDataFrame(
        [("u", 50, "early"), ("u", None, "ghost")],
        "user_id string, ts long, tag string")
    for direction in ("backward", "forward"):
        rows = {r["lbl"]: r for r in asof_join(
            left, right, ts_col="ts", by=("user_id",),
            right_cols=("tag",), direction=direction).collect()}
        assert len(rows) == 2                 # left rows all present
        assert rows["b"]["tag"] is None       # null-ts left: no match
        # the null-ts right row's payload appears nowhere
        assert all(r["tag"] != "ghost" for r in rows.values())
    # backward: ts=100 matches ts=50
    back = {r["lbl"]: r for r in asof_join(
        left, right, ts_col="ts", by=("user_id",),
        right_cols=("tag",)).collect()}
    assert back["a"]["tag"] == "early"


def test_duration_rejects_nonpositive(spark):
    from fhir_data_validation_spark.pipeline.events import rollup_cascade
    df = (spark.createDataFrame([("u", "2024-01-01 00:00:00", 1.0)],
                                "k string, ts string, v double")
          .withColumn("ts", F.to_timestamp("ts")))
    with pytest.raises(ValueError, match=">= 1"):
        rollup_cascade(df, levels=("0 day",), keys=("k",), value_col="v")
    with pytest.raises(ValueError, match=">= 1"):
        rollup_cascade(df, levels=("-1 hour", "1 day"), keys=("k",),
                       value_col="v")
