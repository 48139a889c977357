"""Deterministic corpus selection: Bernoulli-by-key sampling, exact
per-stratum quotas, and target domain mixing.

Sampling in a training-data pipeline must be deterministic (re-runs and
resumed runs select the same rows), key-stable (a document keeps its fate
when the corpus is re-partitioned or appended to), and cheap at 100 TB.
The primitive here is a uniform in [0, 1) derived from the row KEY —
``hash_unit`` — so:

- rate sampling is a pure FILTER (no shuffle, no state, pushes past the
  scan) — this is the 100-TB path;
- quota sampling is a per-stratum top-``n`` by the same unit, so the
  quota-``n`` sample is a PREFIX of the rate sample — growing a quota only
  adds documents, never swaps them;
- mixing re-weights strata by solving for the largest feasible total and
  delegating to quotas.

The hash is the md5_60 trick (top 60 bits of md5, exactly reproducible in
the DuckDB oracle dialect — ``pipeline/dedup.py`` d4 precedent). xxhash64
would be marginally faster but unverifiable; one md5 per row is noise next
to the scan.

No reference analog (the reference validates, it does not sample); this is
training-data-pipeline surface.
"""

from __future__ import annotations

import math
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO_60 = float(1 << 60)


def hash_unit(key: Column, salt: int | str = 0) -> Column:
    """Deterministic uniform in [0, 1) from a key: top-60 md5 bits of
    ``"<key>#<salt>"`` divided by 2^60. Change ``salt`` to draw an
    independent sample from the same corpus."""
    s = F.concat(key.cast("string"), F.lit(f"#{salt}"))
    return (F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
            .cast("long").cast("double") / F.lit(_TWO_60))


def _per_stratum(values: Mapping[str, float], by: str,
                 default: float) -> Column:
    out: Column = F.lit(float(default))
    for k, v in values.items():
        out = F.when(F.col(by) == k, F.lit(float(v))).otherwise(out)
    return out


def sample_by_rate(df: DataFrame, rates: float | Mapping[str, float],
                   by: str = "source", key_col: str = "doc_id",
                   salt: int | str = 0) -> DataFrame:
    """Deterministic Bernoulli-by-key sample: keep rows with
    ``hash_unit(key) < rate``. ``rates`` is one rate or a per-``by``-
    stratum mapping (strata absent from the mapping are dropped).

    Shuffle-free: compiles to a single filter predicate, so Catalyst keeps
    it against the scan — the 100-TB selection path. A NaN rate (e.g. a
    0/0 quota division upstream) drops its stratum like rate 0 — Spark's
    ``u < NaN`` is TRUE for every u, which would keep the stratum at
    100% (round-5 review batch 11)."""
    rate = (_per_stratum(rates, by, 0.0)
            if isinstance(rates, Mapping) else F.lit(float(rates)))
    rate = F.when(F.isnan(rate), F.lit(0.0)).otherwise(rate)
    return df.where(hash_unit(F.col(key_col), salt) < rate)


def sample_quota(df: DataFrame, quotas: Mapping[str, int],
                 by: str = "source", key_col: str = "doc_id",
                 salt: int | str = 0,
                 prefilter_rates: Mapping[str, float] | None = None
                 ) -> DataFrame:
    """Exact per-stratum quotas: rank each stratum by ``hash_unit`` (ties
    broken by key) and keep the first ``quotas[stratum]`` rows. Strata
    absent from ``quotas`` are dropped.

    The rank is over the same unit as :func:`sample_by_rate`, so the
    quota-``n`` rows are the ``n`` smallest units — a prefix of any rate
    sample with the same salt.

    One shuffle, partitioned by stratum; each stratum ranks in one task.
    For heavy strata at 100-TB scale pass ``prefilter_rates`` (e.g.
    ``2 × quota / stratum_count``): the shuffle then carries only the rate
    survivors, and the exact trim is unchanged as long as the prefilter
    rate keeps ≥ quota rows (asserting that is the caller's margin
    choice)."""
    base = (sample_by_rate(df, prefilter_rates, by, key_col, salt)
            if prefilter_rates is not None else df)
    w = (Window.partitionBy(by)
         .orderBy(hash_unit(F.col(key_col), salt), F.col(key_col)))
    quota = _per_stratum({k: float(v) for k, v in quotas.items()}, by, 0.0)
    return (base.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= quota).drop("_rn"))


def assign_splits(df: DataFrame, splits: Mapping[str, float],
                  key_col: str = "doc_id", salt: int | str = 0,
                  split_col: str = "split") -> DataFrame:
    """Deterministic disjoint train/validation/test assignment: the
    ``hash_unit`` interval [0, 1) is carved into consecutive ranges sized
    by the (normalized) ``splits`` weights, in the mapping's iteration
    order; every row lands in exactly one split, keyed by ``key_col``
    alone — stable under repartitioning, appends, and re-runs.

    Shuffle-free: one CASE expression over the scan."""
    if not splits or any(v < 0 for v in splits.values()):
        raise ValueError("splits must be non-empty and non-negative")
    total = float(sum(splits.values()))
    if total <= 0:
        raise ValueError("splits must sum to a positive value")
    u = hash_unit(F.col(key_col), salt)
    out: Column = F.lit(None).cast("string")
    acc = 0.0
    bounds = []
    for name, wt in splits.items():
        acc += wt / total
        bounds.append((name, acc))
    # build the CASE from the last range backwards; the final upper bound
    # is forced to 1.0 so float accumulation error can't leave a row
    # unassigned
    bounds[-1] = (bounds[-1][0], 1.0)
    for name, hi in reversed(bounds):
        out = F.when(u < F.lit(hi), F.lit(name)).otherwise(out)
    return df.withColumn(split_col, out)


def domain_mix(df: DataFrame, weights: Mapping[str, float],
               by: str = "source", key_col: str = "doc_id",
               salt: int | str = 0, total: int | None = None
               ) -> tuple[DataFrame, dict[str, int]]:
    """Select the largest corpus subset matching a target domain mixture.

    ``weights`` are relative stratum proportions (normalized internally).
    The feasible total is ``N = min_s floor(count_s / w_s)`` — the point
    where the scarcest stratum is exhausted — optionally capped by
    ``total``; each stratum then contributes ``floor(w_s · N)`` documents
    via :func:`sample_quota`. Returns ``(sampled_df, quotas)``.

    The stratum-count aggregation collects |strata| rows to the driver —
    constant-size at any corpus scale."""
    if any(v < 0 for v in weights.values()):
        raise ValueError("weights must be non-negative")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {k: v / wsum for k, v in weights.items() if v > 0}
    counts = {r[0]: r[1] for r in
              (df.where(F.col(by).isin(list(norm)))
               .groupBy(by).agg(F.count("*").alias("n")).collect())}
    n_max = min(math.floor(counts.get(k, 0) / w) for k, w in norm.items())
    n = min(n_max, total) if total is not None else n_max
    quotas = {k: math.floor(w * n) for k, w in norm.items()}
    return sample_quota(df, quotas, by, key_col, salt), quotas


def shuffle_ranks(df: DataFrame, key_col: str = "doc_id",
                  salt: int | str = 0, shards: int = 1024,
                  rank_col: str = "shuffle_rank") -> DataFrame:
    """Deterministic global permutation rank for epoch shuffling.

    Adds ``rank_col`` = the row's 0-based position when the corpus is
    ordered by ``(hash_unit(key, salt), key)`` — a pseudo-random but fully
    reproducible permutation; change ``salt`` (e.g. to the epoch number)
    for an independent shuffle of the same corpus. ``key_col`` must be
    unique for the rank to be a permutation.

    A naive ``row_number() OVER (ORDER BY u)`` is a single-task global
    sort — dead at 100 TB. Here the unit interval is cut into ``shards``
    ranges (shard id is monotone in the unit, so shard order == global
    order): rows rank inside their shard in parallel, a |shards|-row
    count aggregate yields each shard's exclusive prefix offset, and the
    final rank is ``offset + within-shard rank``. One shuffle of the data
    (by shard) plus one broadcast of the tiny offset table.
    """
    if shards < 1:
        raise ValueError("shards must be >= 1")
    u = hash_unit(F.col(key_col), salt)
    # u*shards can round UP to exactly `shards` for u just below 1.0 —
    # clamp; the top shard simply absorbs the boundary rows
    shard = F.least(F.floor(u * shards).cast("int"), F.lit(shards - 1))
    base = df.withColumn("_u", u).withColumn("_shard", shard)
    counts = base.groupBy("_shard").agg(F.count("*").alias("_c"))
    w_off = (Window.orderBy("_shard")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0)))
        .drop("_c"))
    w_rn = Window.partitionBy("_shard").orderBy("_u", F.col(key_col))
    return (base.withColumn("_rn", F.row_number().over(w_rn))
            .join(F.broadcast(offsets), "_shard")
            .withColumn(rank_col,
                        (F.col("_off") + F.col("_rn") - 1).cast("long"))
            .drop("_u", "_shard", "_rn", "_off"))


def quantile_thresholds(df: DataFrame, metric_col: str, by: str,
                        p: float, exact: bool = True,
                        accuracy: int = 10000) -> DataFrame:
    """Per-stratum ``p``-quantile of ``metric_col``: one row per ``by``
    value with a ``threshold`` column.

    ``exact=True`` uses the exact interpolated percentile (R-7, the same
    definition as DuckDB's ``quantile_cont``) — its aggregation buffer
    holds the group's distinct metric values with frequencies, fine for
    bounded-cardinality metrics (token counts, scores) but NOT for
    continuous high-cardinality metrics at 100 TB. ``exact=False`` uses
    ``approx_percentile`` (mergeable KLL-style sketch, map-side combined,
    bounded memory) — the scale path; ``accuracy`` trades sketch size for
    error. Either way the result is |strata| rows — broadcastable.
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError("p must be in [0, 1]")
    m = F.col(metric_col).cast("double")
    agg = (F.percentile(m, F.lit(float(p))) if exact
           else F.approx_percentile(m, F.lit(float(p)), F.lit(accuracy)))
    return df.groupBy(by).agg(agg.alias("threshold"))


def select_above_quantile(df: DataFrame, metric_col: str, by: str,
                          p: float, exact: bool = True,
                          keep_threshold: bool = False) -> DataFrame:
    """Per-stratum quantile gating: keep rows whose ``metric_col`` is >=
    their stratum's ``p``-quantile — "top (1-p) of each language by
    quality" without a global constant that over-prunes low-resource
    strata.

    Two passes, zero data-side shuffle: a groupBy reduces the corpus to
    |strata| thresholds (map-side combined), which broadcast-join back
    onto the unshuffled scan as a filter. Threshold semantics (not exact
    top-N): every row tied at the fence is kept, so the selection is
    deterministic and append-stable under repartitioning. Use
    ``exact=False`` for continuous metrics at scale (see
    :func:`quantile_thresholds`).
    """
    # null-safe key match: a NULL stratum is a real group with its own
    # fence — a plain equi-join would silently drop those rows
    thr = (quantile_thresholds(df, metric_col, by, p, exact=exact)
           .withColumnRenamed(by, "_by"))
    out = (df.join(F.broadcast(thr),
                   F.col(by).eqNullSafe(F.col("_by")), "inner")
             .drop("_by")
             .where(F.col(metric_col).cast("double") >= F.col("threshold")))
    return out if keep_threshold else out.drop("threshold")


def winsorize(df: DataFrame, metric_col: str, by: str | None = None,
              p_lo: float = 0.01, p_hi: float = 0.99, exact: bool = True,
              accuracy: int = 10000,
              out_col: str | None = None) -> DataFrame:
    """Quantile clipping (winsorization): clamp ``metric_col`` into its
    ``[p_lo, p_hi]`` quantile fences — per ``by`` stratum when given —
    so a handful of pathological outliers (a 10 GB "document", a quality
    score of 10^9) stop dominating averages and normalizations. The
    clipped value lands in ``out_col`` (default: replaces ``metric_col``).

    Same two-pass zero-data-shuffle shape as
    :func:`select_above_quantile`: one reduced fence aggregation (exact
    R-7 — the DuckDB ``quantile_cont`` twin — or the ``approx_percentile``
    sketch at 100 TB), broadcast back onto the unshuffled scan, clamp as a
    pure projection. NULL metrics stay NULL (Spark's ``least``/
    ``greatest`` skip nulls, which would silently clamp NULL to a fence —
    guarded explicitly)."""
    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo <= p_hi <= 1")
    out_col = out_col or metric_col
    m = F.col(metric_col).cast("double")
    lo = (F.percentile(m, F.lit(float(p_lo))) if exact
          else F.approx_percentile(m, F.lit(float(p_lo)), F.lit(accuracy)))
    hi = (F.percentile(m, F.lit(float(p_hi))) if exact
          else F.approx_percentile(m, F.lit(float(p_hi)), F.lit(accuracy)))
    clamped = F.when(m.isNull(), F.lit(None).cast("double")).otherwise(
        F.greatest(F.col("_lo"), F.least(F.col("_hi"), m)))
    if by is None:
        fences = df.agg(lo.alias("_lo"), hi.alias("_hi"))
        joined = df.crossJoin(F.broadcast(fences))
        return joined.withColumn(out_col, clamped).drop("_lo", "_hi")
    # null-safe key match: a NULL stratum is a real group (it got its own
    # fences in the aggregation) — a plain equi-join would silently DROP
    # those rows (NULL never equi-matches)
    fences = (df.groupBy(by).agg(lo.alias("_lo"), hi.alias("_hi"))
              .withColumnRenamed(by, "_by"))
    joined = (df.join(F.broadcast(fences),
                      F.col(by).eqNullSafe(F.col("_by")), "left")
              .drop("_by"))
    return joined.withColumn(out_col, clamped).drop("_lo", "_hi")


def weighted_key(key: Column, weight: Column, salt: int | str = 0) -> Column:
    """Efraimidis–Spirakis A-Res sampling key ``u^(1/w)`` with
    ``u = hash_unit(key, salt)``: taking the ``n`` LARGEST keys is an
    exact weight-proportional sample without replacement. Deterministic
    in (key, salt), so re-runs, repartitions and appends never swap a
    row's fate. Non-positive, null or NaN weights yield a null key
    (zero inclusion probability) — NaN passes Spark's ``w > 0`` (NaN
    compares greater than every value) and would sort ABOVE every real
    key, displacing the whole sample (round-5 review batch 11)."""
    w = weight.cast("double")
    return F.when((w > 0) & ~F.isnan(w),
                  F.pow(hash_unit(key, salt), F.lit(1.0) / w))


def sample_weighted(df: DataFrame, n: int, weight_col: str,
                    by: str | None = None, key_col: str = "doc_id",
                    salt: int | str = 0) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the ``n``
    rows with the largest :func:`weighted_key` — inclusion probability
    proportional to ``weight_col`` (Efraimidis & Spirakis 2006, A-Res),
    e.g. quality-score-weighted corpus selection. Rows with null or
    non-positive weight are never selected. Ties (possible only for
    duplicate keys) break by ``key_col``.

    ``by=None`` draws one global sample: compiles to
    ``TakeOrderedAndProject`` — each partition keeps its local top-``n``
    and only those merge, no global sort, no single-task stage. With
    ``by``, each stratum draws its own ``n`` via a per-stratum window
    (one shuffle; same heavy-stratum caveat and prefilter remedy as
    :func:`sample_quota`)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    wk = weighted_key(F.col(key_col), F.col(weight_col), salt)
    base = df.where(wk.isNotNull()).withColumn("_wk", wk)
    if by is None:
        out = (base.orderBy(F.col("_wk").desc(), F.col(key_col))
               .limit(int(n)))
    else:
        w = Window.partitionBy(by).orderBy(F.col("_wk").desc(),
                                           F.col(key_col))
        out = (base.withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") <= int(n)).drop("_rn"))
    return out.drop("_wk")


def curriculum_buckets(df: DataFrame, metric_col: str, n_buckets: int,
                       exact: bool = True, accuracy: int = 10000,
                       bucket_col: str = "bucket") -> DataFrame:
    """Curriculum-stage assignment: bucket ``i`` (0-based) holds rows with
    ``fence[i-1] <= metric < fence[i]`` where the fences are the
    ``1/n … (n-1)/n`` quantiles of ``metric_col`` — order a training run
    easy→hard without a global sort. The top bucket is right-open so the
    maximum lands in bucket ``n-1``.

    Two passes, zero data-side shuffle: one aggregation reduces the
    corpus to ``n-1`` fences (exact R-7, or ``approx_percentile``'s
    mergeable sketch for continuous metrics at 100 TB — the same
    trade-off as :func:`quantile_thresholds`), then assignment is a pure
    CASE projection against the unshuffled scan. Ties at a fence all go
    to the higher bucket, so assignment is deterministic and
    append-stable; bucket populations are only approximately equal under
    heavy ties (threshold semantics, not exact count splitting).
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    # NaN metrics fold into the NULL lane BEFORE anything reads them:
    # Spark NaN compares greater than every value, so a raw NaN would
    # land in the top bucket ("hardest") and enough of them corrupt the
    # percentile fences into NaN — collapsing ALL rows into bucket n-1
    # (round-5 review batch 11)
    m = F.col(metric_col).cast("double")
    m = F.when(F.isnan(m), F.lit(None).cast("double")).otherwise(m)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    agg = (F.percentile(m, F.array(*[F.lit(p) for p in probs])) if exact
           else F.approx_percentile(m, F.array(*[F.lit(p) for p in probs]),
                                    F.lit(accuracy)))
    fences = df.agg(agg.alias("_f")).first()["_f"]
    if fences is None or any(f is None for f in fences):
        raise ValueError(
            f"cannot bucket on {metric_col!r}: no non-null values")
    bucket = F.lit(n_buckets - 1)
    for i in range(n_buckets - 2, -1, -1):
        bucket = F.when(m < F.lit(float(fences[i])), F.lit(i)) \
                  .otherwise(bucket)
    # a NULL metric must not land in the top bucket (every `m < fence`
    # comparison is NULL, so the chain would fall through to n-1 —
    # silently calling unmeasured rows "hardest"); it gets a NULL bucket
    bucket = F.when(m.isNull(), F.lit(None)).otherwise(bucket)
    return df.withColumn(bucket_col, bucket.cast("int"))


def interleave_ranks(df: DataFrame, by: str, key_col: str = "doc_id",
                     salt: int | str = 0, shards: int = 1024,
                     rank_col: str = "interleave_rank") -> DataFrame:
    """Stratum-interleaved global order: position ``r`` cycles through the
    strata — rank ``within-stratum-shuffle-rank × n_strata +
    stratum-index`` — so any contiguous batch of ``n_strata`` rows holds
    one row per stratum (while strata last; a stratum that runs out
    leaves gaps, keeping every remaining row's rank stable). The
    language-balanced dataloader order, deterministic in (key, salt).

    Built on :func:`shuffle_ranks` per stratum (sharded two-pass — no
    single-task sort) plus one broadcast of the |strata|-row index
    table; within-stratum order is an independent epoch shuffle.
    """
    if shards < 1:
        raise ValueError("shards must be >= 1")
    idx = (df.select(by).distinct()
           .withColumn("_stratum_idx",
                       F.row_number().over(Window.orderBy(by)) - 1))
    n = idx.count()
    # the shuffle_ranks sharded two-pass, applied WITHIN each stratum:
    # a window per (stratum, shard) — never one task per stratum, which
    # would serialize a language-sized stratum through a single core
    u = hash_unit(F.col(key_col), salt)
    shard = F.least(F.floor(u * shards).cast("int"), F.lit(shards - 1))
    base = df.withColumn("_u", u).withColumn("_shard", shard)
    counts = base.groupBy(by, "_shard").agg(F.count("*").alias("_c"))
    w_off = (Window.partitionBy(by).orderBy("_shard")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (counts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(w_off), F.lit(0)))
        .drop("_c"))
    w_rn = Window.partitionBy(by, "_shard").orderBy("_u", F.col(key_col))
    # null-safe stratum joins (windows keep NULL partitions natively, but
    # an equi-join on the stratum would drop a NULL stratum's rows)
    offsets = (offsets.withColumnRenamed(by, "_oby")
               .withColumnRenamed("_shard", "_oshard"))
    idx = idx.withColumnRenamed(by, "_iby")
    return (base.withColumn("_rn", F.row_number().over(w_rn))
            .join(F.broadcast(offsets),
                  F.col(by).eqNullSafe(F.col("_oby"))
                  & (F.col("_shard") == F.col("_oshard")))
            .join(F.broadcast(idx), F.col(by).eqNullSafe(F.col("_iby")))
            .drop("_oby", "_oshard", "_iby")
            .withColumn(rank_col,
                        ((F.col("_off") + F.col("_rn") - 1) * F.lit(n)
                         + F.col("_stratum_idx")).cast("long"))
            .drop("_u", "_shard", "_rn", "_off", "_stratum_idx"))


# ------------------------------------------------ DSIR importance sampling --

def _word_grams(text: Column, bigrams: bool = True) -> Column:
    """Lowercased whitespace word unigrams (+ bigrams): the hashed-ngram
    feature inventory of DSIR (Xie et al. 2023, arXiv:2302.03169 §2.2).
    Empty docs yield an empty array."""
    ws = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    if not bigrams:
        return ws
    n = F.size(ws)
    bi = F.when(n >= 2, F.zip_with(
        F.slice(ws, F.lit(1), n - 1), F.slice(ws, F.lit(2), n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b)
    )).otherwise(F.array().cast("array<string>"))
    return F.concat(ws, bi)


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int,
                   bigrams: bool, id_col: str | None = None) -> DataFrame:
    """Hashed-ngram bucket counts: per corpus (``id_col=None`` → one row
    per bucket, ≤ ``n_buckets``) or per document. The md5_60 bucket hash
    keeps the whole chain reproducible in the DuckDB oracle dialect (the
    d4/sampling precedent)."""
    gram = F.explode(_word_grams(F.col(text_col), bigrams)).alias("_g")
    bucket = F.pmod(F.conv(F.substring(F.md5(F.col("_g")), 1, 15), 16, 10)
                    .cast("long"), F.lit(int(n_buckets))).alias("bucket")
    keys = ["bucket"] if id_col is None else [id_col, "bucket"]
    cols = [gram] if id_col is None else [F.col(id_col), gram]
    return (df.select(*cols).select(*keys[:-1], bucket)
            .groupBy(*keys).agg(F.count("*").alias("_cnt")))


def dsir_weights(df: DataFrame, target: DataFrame, *,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 10_000, bigrams: bool = True,
                 alpha: float = 1.0) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    per-document log importance ratio ``log p_target(doc) − log p_raw(doc)``
    under bag-of-hashed-ngram unigram models — the score that resamples a
    raw corpus toward a target domain. Returns ``(id_col,
    log_weight double)``, one row per input doc (gram-free docs score 0).

    Both models are Laplace-``alpha`` smoothed over the ``n_buckets``
    hashed feature space; ``raw`` is fit on ``df`` itself (the source
    distribution), ``target`` on the target-domain sample.

    Scale shape: ``df`` and ``target`` each explode their grams ONCE —
    the raw model folds out of the per-doc bucket counts as a
    reduced-frame aggregation, never a second corpus scan; the
    per-bucket log-ratio table stays ≤ ``n_buckets`` rows and BROADCASTS
    onto the per-doc counts (shuffle = O(distinct (doc, bucket)) partials
    with map-side combine, never O(tokens)); the final per-doc sum is one
    more map-side-combined aggregation. No per-row Python anywhere.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    a = float(alpha)
    # ONE gram explode over the corpus: the raw model folds out of the
    # per-doc bucket counts (a reduced-frame aggregation), never a second
    # corpus scan
    per_doc = _bucket_counts(df, text_col, n_buckets, bigrams,
                             id_col=id_col)
    raw = per_doc.groupBy("bucket").agg(F.sum("_cnt").alias("_cnt"))
    tgt = (_bucket_counts(target, text_col, n_buckets, bigrams)
           .withColumnRenamed("_cnt", "_ct"))
    # totals as 1-row aggregates cross-joined onto the reduced frames —
    # never a driver-side action
    raw_tot = raw.agg(F.sum("_cnt").alias("_craw"))
    tgt_tot = tgt.agg(F.sum("_ct").alias("_ctgt"))
    denom = F.lit(a * n_buckets)
    lr = (raw.join(tgt, "bucket", "left")
          .crossJoin(F.broadcast(raw_tot)).crossJoin(F.broadcast(tgt_tot))
          .select("bucket",
                  (F.log(F.coalesce(F.col("_ct"), F.lit(0)) + a)
                   - F.log(F.coalesce(F.col("_ctgt"), F.lit(0)) + denom)
                   - F.log(F.col("_cnt") + a)
                   + F.log(F.col("_craw") + denom)).alias("_lr")))
    scored = (per_doc.join(F.broadcast(lr), "bucket")
              .groupBy(id_col)
              .agg(F.sum(F.col("_cnt") * F.col("_lr")).alias("log_weight")))
    return (df.select(id_col).join(scored, id_col, "left")
            .select(id_col, F.coalesce("log_weight", F.lit(0.0))
                    .alias("log_weight")))


def dsir_resample(df: DataFrame, target: DataFrame, n: int, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_buckets: int = 10_000, bigrams: bool = True,
                  alpha: float = 1.0, salt: int | str = 0) -> DataFrame:
    """Deterministic DSIR resampling: the ``n`` docs drawn WITHOUT
    replacement with probability ∝ the importance ratio, via Gumbel
    top-k over the log weights — ``g = log_weight − ln(−ln(u))`` with
    ``u = hash_unit(id, salt)`` (Gumbel-top-k ≡ A-Res, but stays in log
    space so extreme ratios never overflow ``exp``).

    Key-stable like every sampler here: a doc's fate depends only on
    (id, salt, the two fitted models). Global top-``n`` compiles to
    ``TakeOrderedAndProject`` — per-partition local top-``n`` merge, no
    global sort. Returns the selected rows of ``df`` (all columns) plus
    ``log_weight``.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = dsir_weights(df, target, text_col=text_col, id_col=id_col,
                     n_buckets=n_buckets, bigrams=bigrams, alpha=alpha)
    u = hash_unit(F.col(id_col), salt)
    g = F.col("log_weight") - F.log(-F.log(u))
    return (df.join(w, id_col)
            .withColumn("_g", g)
            .orderBy(F.col("_g").desc(), F.col(id_col))
            .limit(int(n))
            .drop("_g"))
