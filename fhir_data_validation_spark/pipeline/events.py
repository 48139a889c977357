"""Event-time analytics: sessionization, fixed-window aggregation, as-of
join, range (interval) join, and multi-resolution time rollup over an
event stream table.

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


def asof_join(left: DataFrame, right: DataFrame, ts_col: str = "ts",
              by: tuple[str, ...] = ("user_id",),
              right_cols: tuple[str, ...] | None = None,
              direction: str = "backward",
              tolerance_us: int | None = None,
              suffix: str = "_r",
              right_tie_cols: tuple[str, ...] = ()) -> DataFrame:
    """As-of join: attach to every left row the single right row that is
    nearest in event time on the chosen side — ``backward`` (largest
    ``right.ts <= left.ts``, the quotes-to-trades / latest-dim-version
    shape) or ``forward`` (smallest ``right.ts >= left.ts``). Equal
    timestamps match in both directions. Left rows with no qualifying
    right row keep NULL payload columns (LEFT ASOF semantics).

    Spark has no native as-of join; the naive encoding (inequality join +
    per-left argmax) is a BroadcastNestedLoop / cartesian at scale. This
    implementation is the distributed merge-asof: union both sides tagged
    with a side flag, ONE shuffle+sort of |L|+|R| rows partitioned by
    ``by`` and ordered by ``(ts, side)``, then a running
    ``last(payload, ignorenulls)`` window carries the most recent right
    payload forward onto each left row. Right rows order before left rows
    at equal ``ts`` so ties are inclusive. ``forward`` runs the same plan
    with the time axis descending. No join operator at all — WindowExec
    over a single exchange, the same cost shape as one sort-merge join,
    robust to any |R| (no broadcast requirement).

    Scale notes: one Exchange on ``by`` (must be non-empty — a keyless
    as-of join would serialize into a single window task; pre-bucket by
    coarse time range and refine instead). Per-key data streams through
    one sorted run, so a hot key is the skew case — same contract as
    ``sessionize``. ``tolerance_us`` nulls matches farther than the bound
    (pandas ``merge_asof`` tolerance semantics).

    If the right side can carry duplicate ``(by, ts)`` keys, pass
    ``right_tie_cols`` — the row ordering LAST under them wins
    deterministically; without them duplicate-ts winners are unspecified.

    No reference analog (point-in-time payload validator); this is the
    event-enrichment primitive a telemetry/training-data join needs.
    """
    if not by:
        raise ValueError("asof_join requires at least one equality key; "
                         "keyless as-of would serialize into one task")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload_cols = list(right_cols) if right_cols is not None else \
        [c for c in right.columns if c not in by]
    if ts_col not in payload_cols:
        payload_cols = [ts_col, *payload_cols]
    left_keep = [c for c in left.columns]
    out_names = {}
    for c in payload_cols:
        out_names[c] = c + suffix if c in left_keep else c

    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    # a right row with a NULL event time has no position on the time
    # axis — under the window's null ordering it would sort first/last
    # and its payload would be carried onto rows it never qualifies for
    right = right.where(F.col(ts_col).isNotNull())
    r = right.select(
        *[F.col(c) for c in by], F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"), payload.alias("__payload"),
        *[F.col(c).alias(f"__tie{i}")
          for i, c in enumerate(right_tie_cols)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{i}")
          for i, c in enumerate(left_keep)])
    l = left.select(
        *[F.col(c) for c in by], F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.lit(None).cast(r.schema[f"__tie{i}"].dataType)
          .alias(f"__tie{i}") for i in range(len(right_tie_cols))],
        *[F.col(c).alias(f"__l_{i}") for i, c in enumerate(left_keep)])
    u = r.unionByName(l)

    ts_ord = F.col("__ts").asc() if direction == "backward" \
        else F.col("__ts").desc()
    order = [ts_ord, F.col("__side").asc(),
             *[F.col(f"__tie{i}").asc_nulls_first()
               for i in range(len(right_tie_cols))]]
    w = (Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # a null-ts LEFT row keeps LEFT-ASOF shape (row present, no match):
    # without the guard it sorts to one end of the window and absorbs
    # whatever payload is running there
    matched = F.when(F.col("__ts").isNotNull(),
                     F.last(F.col("__payload"), ignorenulls=True).over(w))
    out = (u.withColumn("__m", matched)
           .where(F.col("__side") == 1))
    if tolerance_us is not None:
        gap = F.abs(_us(F.col("__ts")) - _us(F.col("__m")[ts_col]))
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(int(tolerance_us)), F.col("__m")))
    return out.select(
        *[F.col(f"__l_{i}").alias(c) for i, c in enumerate(left_keep)],
        *[F.col("__m")[c].alias(out_names[c]) for c in payload_cols])


def _bin(col: Column, width: int | float) -> Column:
    """Bin id for ``range_join`` — the bucket START, all-integer for an
    integer ``width`` (``x - pmod(x, w)``: exact, floor semantics for
    negatives). Long division in Spark is DOUBLE division, whose quotient
    can round up across a bucket boundary at epoch-microsecond magnitudes
    — a point mis-binned one bucket past its interval's last exploded bin
    is silently dropped, so exactness here is correctness, not polish.
    Non-integer widths fall back to floor(x/w) with that (documented)
    boundary caveat at extreme magnitude/width ratios."""
    if isinstance(width, int):
        return (col - F.pmod(col, F.lit(width))).cast("long")
    # float widths: the bin id is the QUOTIENT (already integral), not
    # the scaled-back start — (q * width).cast('long') collapses
    # distinct buckets to one id whenever consecutive starts truncate to
    # the same long (every width < 1), duplicating joined pairs
    return F.floor(col / F.lit(width)).cast("long")


def _bin_seq(lo: Column, hi: Column, width: int | float) -> Column:
    step = F.lit(width if isinstance(width, int) else 1)
    if isinstance(width, int):
        return F.sequence(_bin(lo, width), _bin(hi, width), step)
    # float widths: the sequence of quotient indices IS the bin-id
    # sequence (same convention as _bin) — one distinct id per bucket
    return F.sequence(F.floor(lo / F.lit(width)),
                      F.floor(hi / F.lit(width)), step)


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str, hi_col: str, by: tuple[str, ...] = (),
               bucket_width: int | float = None,
               interval_cols: tuple[str, ...] | None = None,
               bounds: str = "closed", how: str = "inner",
               suffix: str = "_i") -> DataFrame:
    """Range (interval containment) join: pair every point row with the
    interval rows whose ``[lo, hi]`` contains its ``point_col`` value
    (``bounds='closed'``: lo <= p <= hi; ``'half_open'``: lo <= p < hi),
    optionally under extra equality keys ``by``.

    Catalyst turns a bare inequality join into BroadcastNestedLoopJoin —
    O(|P|·|I|) compares, a non-starter at corpus scale. This is the
    binned range join (the DuckDB/TimescaleDB strategy): quantize the
    axis into ``bucket_width``-sized bins, explode each interval into the
    bins it overlaps (``sequence(floor(lo/w), floor(hi/w))``), equi-join
    on ``(by…, bin)`` — a plain shuffled/AQE-broadcast hash join — then
    apply the exact containment predicate. Each point has exactly ONE
    bin, so every (point, interval) pair meets at most once: no dedup
    pass. Join work is O(|P| + Σ spans/width) instead of O(|P|·|I|).

    Pick ``bucket_width`` near the median interval span: too small
    explodes intervals into many bins; too large piles unrelated rows
    into shared bins. Works for any orderable numeric axis (epoch micros,
    prices, offsets). ``how='left'`` keeps uncontained points with NULL
    interval columns.

    NULL ``lo``/``hi`` intervals and NULL points never match (SQL
    comparison semantics — the predicate is simply false).
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width must be a positive number")
    if bounds not in ("closed", "half_open"):
        raise ValueError("bounds must be 'closed' or 'half_open'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    w = F.lit(bucket_width)
    keep = list(interval_cols) if interval_cols is not None else \
        [c for c in intervals.columns if c not in by]
    out_names = {c: c + suffix if c in points.columns else c for c in keep}
    ivl = (intervals
           .where(F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull()
                  & (F.col(lo_col) <= F.col(hi_col)))
           .select(*[F.col(c) for c in by],
                   F.col(lo_col).alias("__lo"), F.col(hi_col).alias("__hi"),
                   F.struct(*[F.col(c).alias(c) for c in keep])
                   .alias("__ivl"))
           .withColumn("__bin", F.explode(_bin_seq(
               F.col("__lo"), F.col("__hi"), bucket_width)))
           .withColumnsRenamed({c: f"__by_{c}" for c in by})
           .alias("__i"))
    # rename the interval side's key/bin columns so a points/intervals
    # pair derived from the SAME source frame can't produce ambiguous
    # (trivially-true) join predicates
    pts = (points.withColumn("__bin", _bin(F.col(point_col), bucket_width))
           .alias("__p"))
    cond = [F.col("__p.__bin") == F.col("__i.__bin"),
            *[F.col(f"__p.{c}") == F.col(f"__i.__by_{c}") for c in by]]
    p_val = F.col(f"__p.{point_col}")
    contain = (F.col("__i.__lo") <= p_val)
    contain &= (p_val <= F.col("__i.__hi")) if bounds == "closed" \
        else (p_val < F.col("__i.__hi"))
    joined = pts.join(ivl, [*cond, contain], how)
    return joined.select(
        *[F.col(f"__p.{c}") for c in points.columns],
        *[F.col("__i.__ivl")[c].alias(out_names[c]) for c in keep])


_UNITS_US = {"second": 1_000_000, "minute": 60_000_000,
             "hour": 3_600_000_000, "day": 86_400_000_000,
             "week": 604_800_000_000}


def _duration_us(spec: str) -> int:
    parts = spec.strip().split()
    if len(parts) != 2:
        raise ValueError(f"duration must look like '1 hour': {spec!r}")
    n, unit = parts
    unit = unit.rstrip("s")
    if unit not in _UNITS_US:
        raise ValueError(f"unknown duration unit {unit!r} in {spec!r}")
    count = int(n)
    if count < 1:
        # a zero width reaches pmod(us, 0) → every bucket NULL → a
        # silently empty result; negatives are equally meaningless
        raise ValueError(f"duration count must be >= 1: {spec!r}")
    return count * _UNITS_US[unit]


def rollup_cascade(df: DataFrame, levels: tuple[str, ...] = ("1 hour",
                                                             "1 day"),
                   keys: tuple[str, ...] = (), ts_col: str = "ts",
                   value_col: str | None = None) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the event stream reduced
    at every level of a time hierarchy (hour → day → week …) in ONE pass
    — the batch shape of a continuous aggregate. Output rows are
    ``(level, window_start_us, *keys, n_events[, total_value])``, one per
    non-empty epoch-aligned bucket per level.

    Each level must evenly divide the next coarser one, so the bucket
    columns form a functional hierarchy (the hour start determines the
    day start). That lets the whole cascade compile to ``ROLLUP`` over
    the bucket columns coarsest-first: a single Expand + ONE
    map-side-combined hash aggregate — one scan, one shuffle, no
    per-level re-scan and no persist/union of L separate jobs. (The
    grand-total grouping set is dropped; per-level starts come out of
    ``coalesce`` over the bucket columns, finest first.)

    Sums run over ``value_col`` cast to DECIMAL(18,6): decimal addition
    is associative, so every level's total is bit-identical to an
    independent direct aggregation regardless of partial-agg order — the
    invariant that makes a continuous aggregate trustworthy (and the
    oracle exact). The final total is cast back to double.

    Buckets align to the Unix epoch (integer floor of epoch micros), so
    day buckets are midnight UTC and week buckets tile from 1970-01-01
    (a Thursday), matching ``window()``'s convention.
    """
    if not levels:
        raise ValueError("need at least one level")
    widths = [_duration_us(s) for s in levels]
    for fine, coarse, fs, cs in zip(widths, widths[1:], levels, levels[1:]):
        if coarse % fine != 0 or coarse <= fine:
            raise ValueError(
                f"each level must evenly divide the next coarser one: "
                f"{fs!r} does not divide {cs!r}")
    us = _us(F.col(ts_col))
    names = ["__b_" + s.replace(" ", "_") for s in levels]
    # all-integer bucket arithmetic (us - us mod w): long division in
    # Spark is DOUBLE division, and a double quotient near a bucket
    # boundary can round UP into the next bucket (half-ulp of ~5e5-scale
    # quotients is bigger than 1µs/width) — pmod keeps it exact and
    # matches the oracle's integer `//` floor semantics
    bucket_cols = [
        (us - F.pmod(us, F.lit(w))).alias(n)
        for n, w in zip(names, widths)]
    tagged = df.select(*bucket_cols, *[F.col(k) for k in keys],
                       *([F.col(value_col)] if value_col else []))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(18,6)"))
                    .cast("double").alias("total_value"))
    # grouping sets: coarsest-first prefixes of the bucket hierarchy
    # (ROLLUP minus the grand total), each extended with the fixed keys —
    # ONE Expand + one map-side-combined hash aggregate for all levels
    rev = list(reversed(names))
    sets = [[F.col(c) for c in (*rev[:i], *keys)]
            for i in range(len(rev), 0, -1)]
    rolled = (tagged.groupingSets(sets, *[F.col(c) for c in rev],
                                  *[F.col(k) for k in keys])
              .agg(*aggs))
    # level label = FINEST non-null bucket (a finer grouping set also
    # carries every coarser bucket); built coarsest-first so the finest
    # condition wraps outermost and wins
    level_expr = F.lit(None).cast("string")
    start_expr = F.lit(None).cast("long")
    for spec, name in reversed(list(zip(levels, names))):
        level_expr = F.when(F.col(name).isNotNull(),
                            F.lit(spec)).otherwise(level_expr)
        start_expr = F.when(F.col(name).isNotNull(),
                            F.col(name)).otherwise(start_expr)
    out = (rolled
           .where(F.col(names[-1]).isNotNull())  # every set keeps coarsest
           .withColumn("level", level_expr)
           .withColumn("window_start_us", start_expr))
    return out.select("level", "window_start_us", *keys, "n_events",
                      *(["total_value"] if value_col else []))


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      bucket: str = "1 day") -> DataFrame:
    """Retention / cohort matrix: users grouped by the bucket of their
    FIRST event (the cohort), counted per offset bucket they return in —
    ``(cohort_start_us, offset, n_users)`` with ``offset`` in whole
    buckets since the cohort bucket (offset 0 = the cohort's own size).

    Plan: one map-side-combined aggregate reduces events to distinct
    ``(user, bucket)`` activity plus each user's min bucket — a single
    shuffle on the user; the matrix then reduces the |users × active
    buckets| frame (already tiny) by (cohort, offset). The events table
    never joins back against itself; total shuffle O(distinct (user,
    bucket)), not O(events).

    Counts are exact distinct users (each user contributes once per
    active bucket by construction).
    """
    width = _duration_us(bucket)
    us = _us(F.col(ts_col))
    b = us - F.pmod(us, F.lit(width))
    # one pass: per (user, bucket) activity; min bucket per user via a
    # window over the reduced frame (partitions are per-user and tiny)
    ub = (df.select(F.col(user_col).alias("__u"), b.alias("__b"))
          .groupBy("__u", "__b").agg(F.count(F.lit(1)).alias("__n")))
    w = Window.partitionBy("__u")
    cohort = F.min(F.col("__b")).over(w)
    return (ub.withColumn("__c", cohort)
            .groupBy(F.col("__c").alias("cohort_start_us"),
                     ((F.col("__b") - F.col("__c")) / F.lit(width))
                     .cast("long").alias("offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def funnel(df: DataFrame, steps: tuple[str, ...],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within_us: int | None = None) -> DataFrame:
    """Ordered funnel analysis: per user, the first time each step of
    ``steps`` is reached IN ORDER — greedy chained-min semantics
    (``t1 = min(step1 time)``, ``t_k = min(step_k time >= t_{k-1})``),
    the convention of every funnel tool; an event CAN complete a later
    step at the same timestamp as the earlier one (ties count). Returns
    ``(user, steps_completed, t1_us … tK_us)``; unreached steps are NULL
    and everything after the first unreached step is NULL (prefix
    shape). ``within_us`` keeps only steps completed within that
    envelope of the user's t1 (greedy: a later, slower t1 is never
    reconsidered).

    Plan shape: filter to funnel event types, ONE shuffle on the user,
    sort each user's (bounded — bot-skew contract as ``sessionize``)
    event run into an array, then a single codegen ``aggregate`` HOF
    walks it once carrying the per-step completion times. No self-join
    per step, no K passes over the events: O(events of funnel types)
    scan + O(users) state. Events sort by ``(t, step)`` so same-time
    events resolve lower-step-first — exactly the chained-min fixpoint,
    making the fold's result order-independent and oracle-exact.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    k = len(steps)
    step_idx = F.array([F.lit(s) for s in steps])
    ev = (df.where(F.col(type_col).isin(*steps))
          .select(F.col(user_col).alias("__u"),
                  F.struct(
                      _us(F.col(ts_col)).alias("t"),
                      (F.array_position(step_idx, F.col(type_col)) - 1)
                      .cast("int").alias("s")).alias("__e")))
    runs = ev.groupBy("__u").agg(
        F.array_sort(F.collect_list("__e")).alias("__run"))
    # fold: state = array of k completion times (null = unreached); an
    # event of step s completes it if step s is still open and s == 0 or
    # step s-1 completed at an earlier-or-equal time. Completion times
    # are monotone non-decreasing across steps by construction.
    init = F.array([F.lit(None).cast("long")] * k)

    def _step(acc, e):
        out = acc
        for s in range(k):
            cond = (e["s"] == s) & F.get(acc, s).isNull()
            if s > 0:
                cond &= F.get(acc, s - 1).isNotNull() & \
                        (F.get(acc, s - 1) <= e["t"])
            out = F.when(cond,
                         F.concat(F.slice(acc, 1, s),
                                  F.array(e["t"]),
                                  F.slice(acc, s + 2, k - s - 1))
                         ).otherwise(out)
        return out

    times = F.aggregate(F.col("__run"), init, _step)
    out = runs.select(F.col("__u").alias(user_col), times.alias("__t"))
    if within_us is not None:
        # monotone times ⇒ cutting by the envelope preserves the
        # prefix shape (if t_s fits, every earlier step fits)
        envelope = F.get(F.col("__t"), 0) + F.lit(int(within_us))
        out = out.withColumn(
            "__t", F.transform(
                F.col("__t"),
                lambda t, i: F.when((i == 0) | (t <= envelope), t)))
    comp = F.size(F.filter(F.col("__t"), lambda t: t.isNotNull()))
    return out.select(
        user_col, comp.alias("steps_completed"),
        *[F.get(F.col("__t"), i).alias(f"t{i + 1}_us") for i in range(k)])
