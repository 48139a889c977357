"""Incremental column statistics over Iceberg snapshot deltas (C1/C2 at
10^12 rows without re-scanning history).

``stats.profile`` answers "what do these columns look like" with ONE pass —
at 100 TB that pass is the cost. :class:`IncrementalProfiler` keeps the
same statistics CURRENT across an append-driven table by the classic
mergeable-aggregate decomposition: every :meth:`IncrementalProfiler.update`
scans ONLY the files appended since the last update (via
``PyIcebergTable.incremental``) and appends PARTIAL aggregates — count /
null count / min / max / sum / sum-of-squares per (group, column), plus a
HyperLogLog sketch binary for cardinality — to a stats store;
:meth:`IncrementalProfiler.profile` folds the partials into exact totals
(min of mins, sums of sums, HLL union) in a |snapshots × groups × columns|-
row aggregation, never touching the data again.

The store is itself a :class:`PyIcebergTable`, so a partial batch commits
ATOMICALLY with its ``to_snapshot`` watermark: the cursor is derived from
the store's own content (``max(to_snapshot)``), which makes resume exact —
a crashed update either committed its partials (the next run starts after
them) or left no trace (the next run redoes the same delta).

Append-only contract: partials can be merged but not subtracted, so a
commit that REMOVES rows (COW/MOR delete, merge, overwrite/compaction)
invalidates history. ``update()`` walks the snapshot ancestry since the
cursor and, on any non-append operation (or an expired/rolled-back
cursor), either REBUILDS from a full scan (``on_rewrite='rebuild'``, the
default — one pass restores correctness and the store overwrites) or
raises (``on_rewrite='error'``). ``replace`` commits (manifest compaction)
move no rows and are transparent.

Reference analog: the validator recomputes per-request stats from scratch
(`Core/ValidationPipeline.cs:486-604` plans one full pass per run); this
is the delta-maintenance the north rule's resumable 10^12-row lineage
story implies for statistics.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import ArrayType, NumericType

from .sources.iceberg_py import PyIcebergTable
from .stats import GROUP_ALL

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("group", T.StringType(), True),
    T.StructField("column", T.StringType(), False),
    T.StructField("n_rows", T.LongType(), True),
    T.StructField("n_nulls", T.LongType(), True),
    T.StructField("min_num", T.DoubleType(), True),
    T.StructField("max_num", T.DoubleType(), True),
    T.StructField("sum_num", T.DoubleType(), True),
    T.StructField("sum_sq", T.DoubleType(), True),
    # exact decimal Σx for INTEGRAL columns (and array lengths): double
    # partial sums stop being exact past 2^53 and their fold order then
    # perturbs the mean's last ulp (round-5 review batch 3) — the
    # decimal lane keeps profile()'s mean bit-exact at any scale; NULL
    # for floating-point columns (inexact by nature) and on overflow
    T.StructField("sum_dec", T.DecimalType(38, 0), True),
    T.StructField("min_str", T.StringType(), True),
    T.StructField("max_str", T.StringType(), True),
    T.StructField("hll", T.BinaryType(), True),
    # histogram partials share the table so one append commits stats +
    # histograms + watermark ATOMICALLY (kind='hist' rows use bucket/cnt,
    # kind='stat' rows leave them null)
    T.StructField("kind", T.StringType(), False),
    T.StructField("bucket", T.DoubleType(), True),
    T.StructField("cnt", T.LongType(), True),
    T.StructField("to_snapshot", T.LongType(), False),
    # snapshot IDS are random (uuid-derived) — the profiled table's
    # sequence number is the only valid "newest" ordering for the cursor
    T.StructField("to_seq", T.LongType(), False),
])

# operations that only ADD or MOVE METADATA — safe to fold incrementally
_APPEND_SAFE_OPS = {"append", "replace"}


class IncrementalProfiler:
    """Maintain mergeable per-column statistics for an append-driven
    :class:`PyIcebergTable` by scanning only snapshot deltas.

    Parameters
    ----------
    table:            the profiled table.
    columns:          columns to profile (array columns profile their
                      LENGTH, numerics their value, strings lexicographic
                      min/max — the exact `stats.profile` conventions).
    store_location:   directory for the stats store (a PyIcebergTable;
                      created on first update).
    group_col:        optional stratification column (same semantics as
                      ``stats.profile``); ``None`` = one ``<all>`` group.
    lg_k:             HLL sketch precision (Spark ``hll_sketch_agg``).
    on_rewrite:       'rebuild' (default) or 'error' — what to do when a
                      non-append commit invalidates the partial history.
    histograms:       ``{column: bucket_width}`` — also maintain mergeable
                      per-delta histograms (+ the per-delta drift gate).
    heavy_hitters:    ``{column: k}`` — also maintain a mergeable
                      Misra-Gries top-``k`` summary per delta (≤ k
                      candidate rows + 1 error row per (delta, group));
                      fold with :meth:`merged_heavy_hitters`.
    """

    def __init__(self, table: PyIcebergTable, columns: list[str],
                 store_location: str, group_col: str | None = None,
                 lg_k: int = 12, on_rewrite: str = "rebuild",
                 histograms: dict[str, float] | None = None,
                 heavy_hitters: dict[str, int] | None = None,
                 ks_alpha: float = 0.01):
        if on_rewrite not in ("rebuild", "error"):
            raise ValueError("on_rewrite must be 'rebuild' or 'error', "
                             f"got {on_rewrite!r}")
        if not columns:
            raise ValueError("columns must be non-empty")
        for c, w in (histograms or {}).items():
            if w <= 0:
                raise ValueError(f"histograms[{c!r}] bucket width must "
                                 f"be > 0, got {w}")
        for c, hk in (heavy_hitters or {}).items():
            if not isinstance(hk, int) or hk < 1:
                raise ValueError(f"heavy_hitters[{c!r}] k must be an "
                                 f"integer >= 1, got {hk!r}")
        self.table = table
        self.columns = list(columns)
        self.store_location = store_location
        self.group_col = group_col
        self.lg_k = lg_k
        self.on_rewrite = on_rewrite
        self.histograms = dict(histograms or {})
        self.heavy_hitters = dict(heavy_hitters or {})
        self.ks_alpha = ks_alpha

    # ------------------------------------------------------------ store --

    @property
    def spark(self) -> SparkSession:
        return self.table.spark

    def _store(self) -> PyIcebergTable:
        if PyIcebergTable.exists(self.spark, self.store_location):
            store = PyIcebergTable(self.spark, self.store_location)
            # stores written before the exact-sum lane existed evolve
            # in place (metadata-only; old partials read sum_dec=NULL →
            # profile() falls back to the double sum for them)
            if "sum_dec" not in store.schema().fieldNames():
                store.add_column("sum_dec", T.DecimalType(38, 0))
            return store
        return PyIcebergTable.create(self.spark, self.store_location,
                                     _PARTIAL_SCHEMA)

    def _cursor(self, store: PyIcebergTable) -> int | None:
        try:
            df = store.read()
        except ValueError:                  # created, never written
            return None
        row = (df.orderBy(F.desc("to_seq")).select("to_snapshot")
               .first())
        return None if row is None else int(row["to_snapshot"])

    # --------------------------------------------------------- partials --

    def _partials(self, df: DataFrame, to_snapshot: int,
                  to_seq: int) -> DataFrame:
        """ONE aggregation pass over ``df`` → long-format partial rows.
        Per column: the mergeable decomposition (count, nulls, min, max,
        sum, sum², HLL binary). Map-side combine keeps the shuffle at
        groups × columns, never rows."""
        group = (F.lit(GROUP_ALL) if self.group_col is None
                 else F.col(self.group_col).cast("string")).alias("group")
        aggs: list = [F.count(F.lit(1)).alias("n_rows")]
        structs = []
        for c in self.columns:
            dtype = df.schema[c].dataType
            col = F.col(c)
            # array columns profile their LENGTH (the n_tok view of
            # tokens) — stats.profile convention
            val = F.size(col) if isinstance(dtype, ArrayType) else col
            numeric = isinstance(dtype, (NumericType, ArrayType))
            from pyspark.sql.types import IntegralType
            integral = isinstance(dtype, (IntegralType, ArrayType))
            d = val.cast("double") if numeric else F.lit(None).cast("double")
            # exact decimal sum lane for integral values — order-free,
            # stays exact where double partials would drift past 2^53.
            # decimal(28,0) per-row (any bigint fits) so try_sum's
            # result type is decimal(38,0) — summing decimal(19,0)
            # would cap the SUM at decimal(29,0), nulling the lane nine
            # orders of magnitude before the documented 10^38 bound
            # (round-5 review batch 6)
            dec = (F.try_sum(val.cast("decimal(28,0)"))
                    .cast("decimal(38,0)") if integral
                   else F.first(F.lit(None).cast("decimal(38,0)")))
            s = val.cast("string") if not numeric \
                else F.lit(None).cast("string")
            aggs += [
                F.sum(col.isNull().cast("long")).alias(f"_nn_{c}"),
                F.min(d).alias(f"_lo_{c}"), F.max(d).alias(f"_hi_{c}"),
                F.sum(d).alias(f"_sum_{c}"),
                F.sum(d * d).alias(f"_sq_{c}"),
                dec.alias(f"_sd_{c}"),
                F.min(s).alias(f"_slo_{c}"), F.max(s).alias(f"_shi_{c}"),
                F.hll_sketch_agg(val.cast("string"),
                                 self.lg_k).alias(f"_hll_{c}"),
            ]
            structs.append(F.struct(
                F.lit(c).alias("column"), F.col("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_lo_{c}").alias("min_num"),
                F.col(f"_hi_{c}").alias("max_num"),
                F.col(f"_sum_{c}").alias("sum_num"),
                F.col(f"_sq_{c}").alias("sum_sq"),
                F.col(f"_sd_{c}").alias("sum_dec"),
                F.col(f"_slo_{c}").alias("min_str"),
                F.col(f"_shi_{c}").alias("max_str"),
                F.col(f"_hll_{c}").alias("hll"),
            ))
        wide = df.groupBy(group).agg(*aggs)
        out = (wide
               .select("group", F.explode(F.array(*structs)).alias("s"))
               .select("group", "s.*",
                       F.lit("stat").alias("kind"),
                       F.lit(None).cast("double").alias("bucket"),
                       F.lit(None).cast("long").alias("cnt"),
                       F.lit(to_snapshot).alias("to_snapshot"),
                       F.lit(to_seq).alias("to_seq")))
        for c, width in self.histograms.items():
            out = out.unionByName(
                self._hist_partials(df, c, width, to_snapshot, to_seq))
        for c, hk in self.heavy_hitters.items():
            out = out.unionByName(
                self._hh_partials(df, c, hk, to_snapshot, to_seq))
        return out

    def _hh_partials(self, df: DataFrame, column: str, k: int,
                     to_snapshot: int, to_seq: int) -> DataFrame:
        """Mergeable Misra-Gries partial for a delta: the delta's summary
        pruned to ≤ ``k`` candidate rows per group (kind='hh': value in
        ``min_str``, counter in ``cnt``) + one error row (kind='hherr',
        ``cnt`` = cumulative subtraction D). The prune subtracts the
        (k+1)-th largest folded counter — the Agarwal et al. merge rule —
        so D keeps the invariant true_count ∈ [Σ counters, Σ counters +
        Σ D] across any number of deltas."""
        from pyspark.sql import Window
        from .stats import heavy_hitters as _hh
        folded = _hh(df, column, k=k, group_col=self.group_col)
        w = (Window.partitionBy("group")
             .orderBy(F.desc("n_lo"), F.asc("value")))
        ranked = folded.withColumn("_rk", F.row_number().over(w))
        dk = (ranked.where(F.col("_rk") == k + 1)
              .select("group", F.col("n_lo").alias("_dk")))
        base = (ranked.join(dk, "group", "left")
                .withColumn("_dk", F.coalesce("_dk", F.lit(0)))
                .withColumn("_c", F.col("n_lo") - F.col("_dk")))
        # error rows come from base, not pruned: when the top k+1 counters
        # all tie, the prune empties the candidate list but D must still
        # be recorded
        pruned = base.where((F.col("_rk") <= k) & (F.col("_c") > 0))
        null_d = F.lit(None).cast("double")

        def shape(src, kind, value, cnt):
            return src.select(
                F.col("group").cast("string").alias("group"),
                F.lit(column).alias("column"),
                F.lit(None).cast("long").alias("n_rows"),
                F.lit(None).cast("long").alias("n_nulls"),
                null_d.alias("min_num"), null_d.alias("max_num"),
                null_d.alias("sum_num"), null_d.alias("sum_sq"),
                F.lit(None).cast("decimal(38,0)").alias("sum_dec"),
                value.alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
                F.lit(None).cast("binary").alias("hll"),
                F.lit(kind).alias("kind"),
                null_d.alias("bucket"),
                cnt.cast("long").alias("cnt"),
                F.lit(to_snapshot).alias("to_snapshot"),
                F.lit(to_seq).alias("to_seq"))

        vals = shape(pruned, "hh", F.col("value"), F.col("_c"))
        errs = shape(
            base.groupBy("group").agg(
                (F.max("error_bound") + F.max("_dk")).alias("_D")),
            "hherr", F.lit(None).cast("string"), F.col("_D"))
        return vals.unionByName(errs)

    def merged_heavy_hitters(self, column: str) -> DataFrame:
        """Fold the stored MG partials for ``column`` across all deltas —
        zero data IO: ``(group, value, n_lo, n_hi, error_bound)`` with the
        same bound semantics as :func:`stats.heavy_hitters` (true count in
        [n_lo, n_hi]; every value with true count > error_bound present)."""
        if column not in self.heavy_hitters:
            raise ValueError(f"no heavy-hitter tracking for {column!r} "
                             f"(have {sorted(self.heavy_hitters)})")
        rows = (self._store().read()
                .where(F.col("column") == column)
                .where(F.col("kind").isin("hh", "hherr")))
        errs = (rows.where(F.col("kind") == "hherr")
                .groupBy("group").agg(F.sum("cnt").alias("_D")))
        return (rows.where(F.col("kind") == "hh")
                .groupBy("group", F.col("min_str").alias("value"))
                .agg(F.sum("cnt").alias("n_lo"))
                .join(errs, "group")
                .select("group", "value", "n_lo",
                        (F.col("n_lo") + F.col("_D")).alias("n_hi"),
                        F.col("_D").alias("error_bound"))
                .orderBy(F.desc("n_lo"), F.asc("value")))

    def _hist_partials(self, df: DataFrame, column: str, width: float,
                       to_snapshot: int, to_seq: int) -> DataFrame:
        """Mergeable histogram partial: per-(group, bucket) counts of one
        column for a delta — the reduced frame :func:`plans.drift_compare`
        consumes. Buckets merge across deltas by summing counts."""
        from .stats import histogram
        h = histogram(df, column, width,
                      group_col=self.group_col)
        null_d = F.lit(None).cast("double")
        return h.select(
            F.col("group").cast("string").alias("group"),
            F.lit(column).alias("column"),
            F.lit(None).cast("long").alias("n_rows"),
            F.lit(None).cast("long").alias("n_nulls"),
            null_d.alias("min_num"), null_d.alias("max_num"),
            null_d.alias("sum_num"), null_d.alias("sum_sq"),
            F.lit(None).cast("decimal(38,0)").alias("sum_dec"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str"),
            F.lit(None).cast("binary").alias("hll"),
            F.lit("hist").alias("kind"),
            F.col("bucket").cast("double").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
            F.lit(to_snapshot).alias("to_snapshot"),
            F.lit(to_seq).alias("to_seq"))

    # ----------------------------------------------------------- update --

    def _ops_since(self, cursor: int) -> list[str] | None:
        """Operations of the current snapshot's ancestors NEWER than the
        cursor; ``None`` when the cursor is not in the current ancestry
        (rollback / expiry) — the caller must rebuild."""
        snaps = {r["snapshot_id"]: r
                 for r in self.table.snapshots().collect()}
        sid = self.table.current_snapshot_id()
        ops: list[str] = []
        while sid is not None and sid in snaps:
            if sid == cursor:
                return ops
            ops.append(snaps[sid]["operation"])
            sid = snaps[sid]["parent_id"]
        return None

    def update(self) -> dict[str, Any]:
        """Fold the table's new snapshots into the store. Returns
        ``{"mode": "noop" | "delta" | "rebuild", "from_snapshot",
        "to_snapshot", "drift"}``. With ``histograms`` configured, a
        delta update also scores the NEW data's distribution against the
        merged history (PSI / KS / JSD / chi² per group via
        ``plans.drift_compare``) BEFORE folding it in — the bad-batch
        gate: ``drift`` is ``{column: [per-group stat dicts]}``, or
        ``None`` on noop/rebuild (no prior baseline to compare against).
        The stats and histogram partials land in ONE store commit, so the
        watermark can never disagree with either."""
        store = self._store()
        cur = self.table.current_snapshot_id()
        cursor = self._cursor(store)
        if cursor == cur:
            return {"mode": "noop", "from_snapshot": cursor,
                    "to_snapshot": cur, "drift": None}
        mode = "delta" if cursor is not None else "rebuild"
        if cursor is not None:
            ops = self._ops_since(cursor)
            if ops is None or any(o not in _APPEND_SAFE_OPS for o in ops):
                if self.on_rewrite == "error":
                    raise ValueError(
                        f"non-append history since snapshot {cursor} "
                        f"(ops={ops}); partial stats cannot subtract — "
                        "pass on_rewrite='rebuild' to re-profile")
                mode = "rebuild"
        seq = {r["snapshot_id"]: r["sequence_number"]
               for r in self.table.snapshots().collect()}[cur]
        drift = None
        if mode == "delta":
            delta = self.table.incremental(cursor, cur)
            if self.histograms:
                drift = self._delta_drift(store, delta)
            partials = self._partials(delta, cur, seq)
            store.append(partials)
        else:
            partials = self._partials(self.table.read(), cur, seq)
            store.overwrite(partials)
        return {"mode": mode, "from_snapshot": cursor,
                "to_snapshot": cur, "drift": drift}

    def _delta_drift(self, store: PyIcebergTable,
                     delta: DataFrame) -> dict[str, list[dict]] | None:
        """Score each configured histogram column of the DELTA against
        the merged historical histogram — both sides are reduced frames
        (|groups × buckets| rows), so the comparison never rescans data."""
        from .plans import drift_compare
        from .stats import histogram
        out: dict[str, list[dict]] = {}
        hist = store.read().where(F.col("kind") == "hist")
        for c, width in self.histograms.items():
            base = (hist.where(F.col("column") == c)
                    .groupBy(F.col("group").alias("source"), "bucket")
                    .agg(F.sum("cnt").alias("cnt")))
            if base.limit(1).count() == 0:
                continue
            cur = (histogram(delta, c, width, group_col=self.group_col)
                   .select(F.col("group").cast("string").alias("source"),
                           F.col("bucket").cast("double").alias("bucket"),
                           "cnt"))
            rows = drift_compare(cur, base,
                                 ks_alpha=self.ks_alpha).collect()
            out[c] = [r.asDict() for r in rows]
        return out or None

    def merged_histogram(self, column: str) -> DataFrame:
        """The column's current histogram folded from all partials —
        ``(group, bucket, cnt)``, zero data IO."""
        if column not in self.histograms:
            raise ValueError(f"no histogram configured for {column!r} "
                             f"(have {sorted(self.histograms)})")
        return (self._store().read()
                .where((F.col("kind") == "hist")
                       & (F.col("column") == column))
                .groupBy("group", "bucket")
                .agg(F.sum("cnt").alias("cnt")))

    def merged_quantiles(self, column: str,
                         probs: tuple[float, ...] = (0.01, 0.25, 0.5,
                                                     0.75, 0.99)
                         ) -> DataFrame:
        """Per-group quantile estimates folded from the stored histogram
        partials — ``(group, p, value)`` long form (the
        :func:`stats.quantiles` shape), ZERO data IO.

        The estimate inverts the merged fixed-width histogram: walk the
        cumulative counts to the bucket containing rank ``p × N`` and
        interpolate linearly inside it, so the error is bounded by the
        configured ``bucket_width`` regardless of how many deltas were
        folded — the property a mergeable-percentile story needs (an
        ``approx_percentile`` sketch cannot be persisted/merged across
        independent runs from SQL, but bucket counts sum exactly).

        All arithmetic runs on the |groups × buckets| reduced frame: one
        window cumsum + one explode over ``probs``, never the data."""
        from pyspark.sql import Window
        if not probs or any(not (0.0 <= p <= 1.0) for p in probs):
            raise ValueError(f"probs must be within [0, 1], got {probs!r}")
        width = float(self.histograms.get(column, 0.0)) or None
        if width is None:
            raise ValueError(f"no histogram configured for {column!r} "
                             f"(have {sorted(self.histograms)})")
        h = self.merged_histogram(column)
        w = Window.partitionBy("group").orderBy("bucket")
        cum = (h.withColumn("_cum", F.sum("cnt").over(w))
               .withColumn("_tot", F.sum("cnt").over(
                   Window.partitionBy("group"))))
        p_col = F.explode(F.array(*[F.lit(float(p)) for p in probs]))
        ranked = cum.select("group", "bucket", "cnt", "_cum", "_tot",
                            p_col.alias("p"))
        # target rank in (0, N]; the first bucket whose cumulative count
        # reaches it holds the quantile. min_by picks that bucket without
        # a second shuffle ordering.
        target = F.greatest(F.col("p") * F.col("_tot"), F.lit(1e-12))
        hit = (ranked.where(F.col("_cum") >= target)
               .groupBy("group", "p")
               .agg(F.min_by(
                   F.struct("bucket", "cnt", "_cum"), "bucket").alias("b"),
                   F.first("_tot").alias("_tot")))
        frac = ((F.greatest(F.col("p") * F.col("_tot"), F.lit(1e-12))
                 - (F.col("b._cum") - F.col("b.cnt"))) / F.col("b.cnt"))
        value = (F.col("b.bucket") + F.least(frac, F.lit(1.0))) * F.lit(width)
        return (hit.select("group", "p",
                           value.cast("double").alias("value"))
                .orderBy("group", "p"))

    # ---------------------------------------------------------- profile --

    def profile(self, with_distinct: bool = True) -> DataFrame:
        """Merge the stored partials into current totals — long format:
        one row per (group, column) with ``n_rows, n_nulls, null_rate,
        min_num, max_num, mean, min_str, max_str`` (+ ``n_distinct`` HLL
        estimate unless ``with_distinct=False``). Exact for every field
        except ``n_distinct`` (sketch union, ~2% at the default lg_k);
        ``mean`` is bit-exact for integral columns up to Σ|x| < 10^38
        (exact decimal lane) and falls back to the double sum beyond —
        or when any contributing partial predates the lane.
        Cost: an aggregation over the tiny partials table — zero data IO."""
        p = self._store().read().where(F.col("kind") == "stat")
        aggs = [
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_nulls").alias("n_nulls"),
            F.min("min_num").alias("min_num"),
            F.max("max_num").alias("max_num"),
            F.sum("sum_num").alias("_sum"),
            # exact decimal fold: order-free, bit-exact for integral
            # columns up to Σ|x| < 10^38. The count() pair guards the
            # MIXED case — pre-evolution partials without the lane must
            # not let a PARTIAL decimal sum masquerade as the total.
            # Overflow (per-delta or at the fold) nulls the lane and the
            # mean falls back to the double sum, which is approximate
            # past 2^53 — at ≥1e38 a double mean is inherently
            # last-ulp-approximate, so the fallback is the honest
            # result, not a silent corruption (round-5 review batch 4)
            F.try_sum("sum_dec").alias("_sum_dec"),
            F.count("sum_dec").alias("_n_dec"),
            F.count("sum_num").alias("_n_dbl"),
            F.min("min_str").alias("min_str"),
            F.max("max_str").alias("max_str"),
        ]
        if with_distinct:
            aggs.append(F.hll_sketch_estimate(F.hll_union_agg("hll"))
                        .alias("n_distinct"))
        exact_ok = (F.col("_sum_dec").isNotNull()
                    & (F.col("_n_dec") == F.col("_n_dbl")))
        out = (p.groupBy("group", "column").agg(*aggs)
               .withColumn("null_rate",
                           F.col("n_nulls") / F.col("n_rows"))
               .withColumn("mean",
                           F.when(exact_ok,
                                  F.col("_sum_dec").cast("double"))
                           .otherwise(F.col("_sum"))
                           / F.nullif(F.col("n_rows") - F.col("n_nulls"),
                                      F.lit(0)))
               .drop("_sum", "_sum_dec", "_n_dec", "_n_dbl"))
        cols = ["group", "column", "n_rows", "n_nulls", "null_rate",
                "min_num", "max_num", "mean", "min_str", "max_str"]
        if with_distinct:
            cols.append("n_distinct")
        return out.select(*cols)
