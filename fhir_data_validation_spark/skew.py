"""Skew handling: salted two-stage aggregation over hot group keys.

North-rule requirement — ``source`` is heavily skewed (web ≈ 70% of rows at
corpus scale). AQE's skew-join splitting covers joins, but a plain
``groupBy('source')`` still funnels each hot key through a single reduce
task when the aggregation state is large (collect_list-style examples,
exact distincts). The fix is the classic salt fan-out (SURVEY §4.2):

    stage 1:  groupBy(source, salt = pmod(xxhash64(key), B)) → partial agg
    stage 2:  groupBy(source) → merge the B partials

Counts/sums/min/max don't need this (Spark's partial aggregation already
combines map-side); these helpers exist for the aggregations whose state
grows with group size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, key_col: str, buckets: int = 16) -> DataFrame:
    """Deterministic salt in [0, buckets) derived from the row key (never
    ``rand()`` — results must be reproducible across retries)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets)))


def salted_count_distinct(df: DataFrame, group_col: str, value_col: str,
                          key_col: str | None = None,
                          buckets: int = 16) -> DataFrame:
    """Exact distinct count per group without a hot-key reduce task.

    Stage 1 groups by (group, salt) and collects per-bucket distinct sets
    (each bucket sees ~1/B of the hot group); stage 2 merges bucket-level
    distinct *values* — the shuffle carries distinct values only, already
    deduplicated within buckets. Returns (group_col, n_distinct).
    """
    salted = with_salt(df, key_col or value_col, buckets)
    partial = (salted.groupBy(group_col, SALT_COL)
               .agg(F.collect_set(value_col).alias("_vals")))
    # explode_outer: a group whose values are ALL null collects an empty
    # set, and a plain explode would drop the group entirely — the
    # unsalted groupBy+countDistinct this replaces reports (group, 0)
    return (partial
            .select(group_col, F.explode_outer("_vals").alias("_v"))
            .groupBy(group_col)
            .agg(F.countDistinct("_v").alias("n_distinct")))


def salted_examples(df: DataFrame, group_col: str, value_col: str,
                    k: int = 3, key_col: str | None = None,
                    buckets: int = 16) -> DataFrame:
    """First-k examples per group (the reference's Take(3) example cap,
    ``FhirPathRuleEngine.cs:1994``) with bounded aggregation state: each
    salt bucket keeps at most k values, the merge keeps k of the ≤ B·k
    candidates. Returns (group_col, examples array)."""
    salted = with_salt(df, key_col or value_col, buckets)
    partial = (salted.groupBy(group_col, SALT_COL)
               .agg(F.slice(F.sort_array(F.collect_list(value_col)), 1, k)
                    .alias("_ex")))
    return (partial.groupBy(group_col)
            .agg(F.slice(F.sort_array(F.flatten(F.collect_list("_ex"))), 1, k)
                 .alias("examples")))


def salted_repartition(df: DataFrame, group_col: str, key_col: str,
                       buckets: int = 16) -> DataFrame:
    """Co-partition by (group, salt) ahead of several per-group stages so a
    hot group spreads over ``buckets`` tasks (SURVEY §4.2: explicit
    pre-partitioning reused across stages). Drops the salt afterwards with
    ``.drop(SALT_COL)`` if it would leak into results."""
    return with_salt(df, key_col, buckets).repartition(group_col, SALT_COL)


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Pre-join skew diagnosis: the ``top_k`` heaviest values of
    ``key_col`` with their row counts and corpus share — the check you run
    BEFORE shuffling 100 TB on that key (a key holding >1% of rows wants
    :func:`salted_repartition`, a broadcast, or AQE skew-join).

    Shape at scale: one map-side-combined count aggregation reduces the
    corpus to |keys| rows; the global top-k over that reduced frame plans
    as ``TakeOrderedAndProject`` (per-partition top-k merge — no
    single-task global sort); the corpus total is a 1-row aggregate
    cross-joined back (never a driver action). Deterministic tie order:
    ``(cnt desc, key asc)``. ``share`` is the exact double ratio —
    unrounded, so an oracle computes the identical bits."""
    key = F.col(key_col).cast("string")
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    from pyspark.sql.window import Window
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (top.crossJoin(F.broadcast(total))
            .withColumn("share", F.col("cnt") / F.col("_total"))
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "key", "cnt", "share"))
