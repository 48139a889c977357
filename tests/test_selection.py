"""Deterministic sampling / quota / domain-mix selection."""

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark.pipeline.selection import (domain_mix,
                                                           hash_unit,
                                                           sample_by_rate,
                                                           sample_quota)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 10 < 6 else ("de" if i % 10 < 8 else "fr"),
             f"text {i}") for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_rate_sample_deterministic_and_unbiased(spark, corpus):
    a = {r["doc_id"] for r in
         sample_by_rate(corpus, 0.3, by="lang").select("doc_id").collect()}
    b = {r["doc_id"] for r in
         sample_by_rate(corpus, 0.3, by="lang").select("doc_id").collect()}
    assert a == b                      # deterministic
    assert 0.2 < len(a) / 1000 < 0.4   # roughly the rate
    c = {r["doc_id"] for r in
         sample_by_rate(corpus, 0.3, by="lang", salt=1)
         .select("doc_id").collect()}
    assert c != a                      # independent draw under a new salt


def test_rate_sample_key_stable_under_repartition(spark, corpus):
    a = {r["doc_id"] for r in sample_by_rate(corpus, 0.25).collect()}
    b = {r["doc_id"] for r in
         sample_by_rate(corpus.repartition(13), 0.25).collect()}
    assert a == b


def test_per_stratum_rates_drop_unlisted(spark, corpus):
    out = sample_by_rate(corpus, {"en": 0.5, "de": 1.0}, by="lang")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en", "de"}
    assert out.where(F.col("lang") == "de").count() == 200  # rate 1 = all


def test_quota_exact_counts_and_prefix_property(spark, corpus):
    q = sample_quota(corpus, {"en": 100, "de": 50}, by="lang")
    counts = {r["lang"]: r["n"] for r in
              q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 100, "de": 50}
    # growing a quota only ADDS documents (same salt -> same ranking)
    q2 = sample_quota(corpus, {"en": 150, "de": 50}, by="lang")
    ids, ids2 = ({r["doc_id"] for r in x.select("doc_id").collect()}
                 for x in (q, q2))
    assert ids < ids2
    # and the quota sample is a prefix of the rate sample's stratum subset:
    # every quota pick with unit < r is in the rate sample
    r = sample_by_rate(corpus, {"en": 0.2}, by="lang")
    rate_ids = {x["doc_id"] for x in r.select("doc_id").collect()}
    en_units = (corpus.where(F.col("lang") == "en")
                .select("doc_id", hash_unit(F.col("doc_id")).alias("u"))
                .orderBy("u").limit(len(rate_ids)).collect())
    assert {x["doc_id"] for x in en_units} == rate_ids


def test_quota_prefilter_equivalence(spark, corpus):
    plain = sample_quota(corpus, {"en": 40}, by="lang")
    pre = sample_quota(corpus, {"en": 40}, by="lang",
                       prefilter_rates={"en": 0.5})  # 300 survivors >= 40
    assert ({r["doc_id"] for r in plain.collect()}
            == {r["doc_id"] for r in pre.collect()})


def test_domain_mix_largest_feasible(spark, corpus):
    # counts: en 600, de 200, fr 200; weights 50/25/25 -> N = min(1200,
    # 800, 800) = 800 -> quotas en 400, de 200, fr 200
    out, quotas = domain_mix(corpus, {"en": 2, "de": 1, "fr": 1}, by="lang")
    assert quotas == {"en": 400, "de": 200, "fr": 200}
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == quotas


def test_domain_mix_total_cap_and_bad_weights(spark, corpus):
    out, quotas = domain_mix(corpus, {"en": 1, "de": 1}, by="lang",
                             total=100)
    assert quotas == {"en": 50, "de": 50}
    assert out.count() == 100
    with pytest.raises(ValueError):
        domain_mix(corpus, {"en": 0.0}, by="lang")


def test_rate_filter_is_shuffle_free(spark, corpus):
    plan = sample_by_rate(corpus, 0.5)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan


def test_assign_splits_disjoint_stable(spark, corpus):
    from fhir_data_validation_spark.pipeline.selection import assign_splits
    out = assign_splits(corpus, {"train": 98, "val": 1, "test": 1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 1000 and None not in rows.values()
    counts = {s: list(rows.values()).count(s)
              for s in ("train", "val", "test")}
    assert counts["train"] > 900 and counts["val"] + counts["test"] > 0
    # key-stable: same assignment after repartition
    rows2 = {r["doc_id"]: r["split"]
             for r in assign_splits(corpus.repartition(7),
                                    {"train": 98, "val": 1, "test": 1})
             .collect()}
    assert rows == rows2
    # growing train at test's expense never moves a train row out
    rows3 = {r["doc_id"]: r["split"]
             for r in assign_splits(corpus, {"train": 99, "val": 1})
             .collect()}
    assert all(rows3[k] == "train" for k, v in rows.items()
               if v == "train")
    with pytest.raises(ValueError):
        assign_splits(corpus, {})
    with pytest.raises(ValueError):
        assign_splits(corpus, {"a": -1, "b": 2})


def test_assign_splits_shuffle_free(spark, corpus):
    from fhir_data_validation_spark.pipeline.selection import assign_splits
    plan = assign_splits(corpus, {"train": 3, "val": 1})._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_ranks_is_global_permutation(spark, corpus):
    from pyspark.sql import Window
    from fhir_data_validation_spark.pipeline.selection import shuffle_ranks
    out = shuffle_ranks(corpus, shards=16)
    rows = {r["doc_id"]: r["shuffle_rank"] for r in out.collect()}
    # complete 0..n-1 permutation
    assert sorted(rows.values()) == list(range(1000))
    # equals the naive single-window global rank
    w = Window.orderBy(hash_unit(F.col("doc_id"), 0), F.col("doc_id"))
    naive = {r["doc_id"]: r["rk"] for r in
             corpus.withColumn("rk", F.row_number().over(w) - 1).collect()}
    assert rows == naive
    # stable under repartitioning
    rows2 = {r["doc_id"]: r["shuffle_rank"]
             for r in shuffle_ranks(corpus.repartition(7), shards=16)
             .collect()}
    assert rows == rows2
    # a different salt (epoch) gives a different permutation
    rows3 = {r["doc_id"]: r["shuffle_rank"]
             for r in shuffle_ranks(corpus, salt=1, shards=16).collect()}
    assert rows3 != rows
    assert sorted(rows3.values()) == list(range(1000))


def test_shuffle_ranks_no_global_sort_on_data(spark, corpus):
    """The corpus-side plan must not contain a single-partition global
    sort: data exchanges hash by shard; only the tiny offset table may
    use a SinglePartition window."""
    from fhir_data_validation_spark.pipeline.selection import shuffle_ranks
    plan = (shuffle_ranks(corpus, shards=16)
            ._jdf.queryExecution().executedPlan().toString())
    # the offsets side is one SinglePartition exchange over <= shards rows;
    # the data side must partition by _shard, not collapse to one task
    assert "hashpartitioning(_shard" in plan
    assert "BroadcastHashJoin" in plan


def test_shuffle_ranks_guards(spark, corpus):
    from fhir_data_validation_spark.pipeline.selection import shuffle_ranks
    with pytest.raises(ValueError, match="shards"):
        shuffle_ranks(corpus, shards=0)


# --------------------------------------------------- select_above_quantile

@pytest.fixture(scope="module")
def metric_corpus(spark):
    rows = [(i, ("en", "de", "fr")[i % 3], (i * 37) % 101)
            for i in range(300)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tok long")


def _r7(vals, p):
    vals = sorted(vals)
    h = (len(vals) - 1) * p
    lo = int(h)
    if lo == h:
        return float(vals[lo])
    return vals[lo] + (h - lo) * (vals[lo + 1] - vals[lo])


def test_select_above_quantile_matches_r7(spark, metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import (
        quantile_thresholds, select_above_quantile)
    data = metric_corpus.collect()
    for p in (0.8, 0.5, 0.25):
        thr = {r["lang"]: r["threshold"] for r in
               quantile_thresholds(metric_corpus, "n_tok", "lang",
                                   p).collect()}
        for lang in ("en", "de", "fr"):
            want = _r7([r["n_tok"] for r in data if r["lang"] == lang], p)
            assert abs(thr[lang] - want) < 1e-9
        kept = {r["doc_id"] for r in
                select_above_quantile(metric_corpus, "n_tok", "lang",
                                      p).collect()}
        want_kept = {r["doc_id"] for r in data
                     if r["n_tok"] >= thr[r["lang"]]}
        assert kept == want_kept


def test_select_above_quantile_approx_and_threshold_col(spark,
                                                        metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        select_above_quantile
    out = select_above_quantile(metric_corpus, "n_tok", "lang", 0.9,
                                exact=False, keep_threshold=True)
    rows = out.collect()
    assert rows and "threshold" in out.columns
    # high-accuracy sketch on 100 ints/stratum is exact: ~top decile kept
    assert len(rows) <= 0.2 * 300
    again = {r["doc_id"] for r in
             select_above_quantile(metric_corpus, "n_tok", "lang", 0.9,
                                   exact=False).collect()}
    assert again == {r["doc_id"] for r in rows}   # deterministic
    with pytest.raises(ValueError):
        select_above_quantile(metric_corpus, "n_tok", "lang", 1.5)


def test_select_above_quantile_broadcasts_fences(spark, metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        select_above_quantile
    plan = (select_above_quantile(metric_corpus, "n_tok", "lang", 0.8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan   # data side joins unshuffled


# -------------------------------------------------------- sample_weighted

def _py_unit(key, salt=0):
    import hashlib
    h = hashlib.md5(f"{key}#{salt}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


def test_sample_weighted_matches_ares_reference(spark, metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        sample_weighted
    data = [(r["doc_id"], r["lang"], r["n_tok"])
            for r in metric_corpus.collect()]
    # independent A-Res reference: top-n by u^(1/w) per stratum
    def ref(n, by_lang):
        keyed = [(d, lang, _py_unit(d) ** (1.0 / w))
                 for d, lang, w in data if w > 0]
        if not by_lang:
            keyed.sort(key=lambda t: (-t[2], t[0]))
            return {t[0] for t in keyed[:n]}
        out = set()
        for lang in {t[1] for t in keyed}:
            grp = sorted((t for t in keyed if t[1] == lang),
                         key=lambda t: (-t[2], t[0]))
            out |= {t[0] for t in grp[:n]}
        return out
    got_global = {r["doc_id"] for r in
                  sample_weighted(metric_corpus, 25, "n_tok").collect()}
    assert got_global == ref(25, by_lang=False)
    got_strat = {r["doc_id"] for r in
                 sample_weighted(metric_corpus, 10, "n_tok",
                                 by="lang").collect()}
    assert got_strat == ref(10, by_lang=True)


def test_sample_weighted_skips_nonpositive_and_biases_heavy(spark):
    from fhir_data_validation_spark.pipeline.selection import \
        sample_weighted
    rows = ([(i, 1000.0) for i in range(50)]          # heavy
            + [(i, 1.0) for i in range(50, 500)]      # light
            + [(900, 0.0), (901, -3.0), (902, None)])  # never selected
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = [  # union over salts to make the bias statistical
        r["doc_id"]
        for s in range(5)
        for r in sample_weighted(df, 20, "w", salt=s).collect()]
    assert not {900, 901, 902} & set(picked)
    heavy = sum(1 for d in picked if d < 50)
    assert heavy / len(picked) > 0.6   # 50 heavy docs dominate 450 light
    import pytest as _pt
    with _pt.raises(ValueError):
        sample_weighted(df, 0, "w")


def test_sample_weighted_global_avoids_single_task_sort(spark,
                                                        metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        sample_weighted
    plan = (sample_weighted(metric_corpus, 5, "n_tok")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


# ----------------------------------------------------- curriculum_buckets

def test_curriculum_buckets_match_r7_fences(spark, metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        curriculum_buckets
    data = [r["n_tok"] for r in metric_corpus.collect()]
    out = curriculum_buckets(metric_corpus, "n_tok", 4)
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    fences = [_r7(data, p) for p in (0.25, 0.5, 0.75)]
    for r in metric_corpus.collect():
        want = sum(1 for f in fences if r["n_tok"] >= f)
        assert got[r["doc_id"]] == want
    # roughly balanced stages on a near-uniform metric
    sizes = [sum(1 for b in got.values() if b == i) for i in range(4)]
    assert all(0.15 * 300 < s < 0.35 * 300 for s in sizes)
    import pytest as _pt
    with _pt.raises(ValueError):
        curriculum_buckets(metric_corpus, "n_tok", 1)


def test_curriculum_buckets_assignment_is_projection(spark, metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        curriculum_buckets
    plan = (curriculum_buckets(metric_corpus, "n_tok", 4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan   # fences resolved; pure CASE projection


# ------------------------------------------------------- interleave_ranks

def test_interleave_ranks_cycles_strata(spark, metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        interleave_ranks
    out = interleave_ranks(metric_corpus, by="lang", shards=16)
    rows = sorted(out.collect(), key=lambda r: r["interleave_rank"])
    # 100 docs per lang, 3 langs: ranks are a complete 0..299 permutation
    assert [r["interleave_rank"] for r in rows] == list(range(300))
    # every consecutive block of 3 holds one row per language
    for i in range(0, 300, 3):
        assert {r["lang"] for r in rows[i:i + 3]} == {"en", "de", "fr"}
    # deterministic under repartitioning; new salt = new interleave
    again = {r["doc_id"]: r["interleave_rank"] for r in
             interleave_ranks(metric_corpus.repartition(7), by="lang",
                              shards=16).collect()}
    assert again == {r["doc_id"]: r["interleave_rank"] for r in rows}
    other = {r["doc_id"]: r["interleave_rank"] for r in
             interleave_ranks(metric_corpus, by="lang", salt=1,
                              shards=16).collect()}
    assert other != again


def test_interleave_ranks_no_single_task_per_stratum(spark,
                                                     metric_corpus):
    from fhir_data_validation_spark.pipeline.selection import \
        interleave_ranks
    plan = (interleave_ranks(metric_corpus, by="lang", shards=16)
            ._jdf.queryExecution().executedPlan().toString())
    # the data-side sort/window keys on (stratum, shard), never stratum
    # alone — a language-sized stratum must not serialize into one task
    assert "partitionBy=[lang#" not in plan.replace(" ", "")
    assert "_shard" in plan


def test_curriculum_buckets_all_null_metric_raises(spark):
    from fhir_data_validation_spark.pipeline.selection import \
        curriculum_buckets
    df = spark.createDataFrame([(1, None), (2, None)],
                               "doc_id long, m double")
    with pytest.raises(ValueError, match="non-null"):
        curriculum_buckets(df, "m", 4)


def test_winsorize_clamps_to_stratum_fences(spark):
    from fhir_data_validation_spark.pipeline import selection
    """Values outside each stratum's [p_lo, p_hi] fences clamp to them;
    in-band values and NULLs pass through untouched; dataset-wide mode
    uses one global fence pair; bad percentile bounds raise."""
    import duckdb
    rows = ([(i, float(i), "a") for i in range(1, 11)]       # 1..10
            + [(100, 1000.0, "a"),                            # high outlier
               (101, None, "a"),
               (200, 5.0, "b"), (201, 6.0, "b")])
    df = spark.createDataFrame(rows, "id long, v double, g string")
    out = {r["id"]: r["v"]
           for r in selection.winsorize(df, "v", by="g",
                                        p_lo=0.0, p_hi=0.9).collect()}
    con = duckdb.connect()
    want_hi = con.execute(
        "SELECT quantile_cont(x, 0.9) FROM (SELECT unnest("
        "[1.0,2,3,4,5,6,7,8,9,10,1000]) AS x)").fetchone()[0]
    assert out[100] == want_hi          # clamped to the stratum p90
    assert out[1] == 1.0 and out[5] == 5.0
    assert out[101] is None             # NULL never clamps to a fence
    assert out[200] == 5.0 and out[201] == 5.9  # b's p90 of [5,6]
    # NULL stratum is a real group: its rows keep their own fences and
    # are never dropped (null-safe key match, not an equi-join)
    ndf = df.union(df.sparkSession.createDataFrame(
        [(300, 1.0, None), (301, 100.0, None)], df.schema))
    nout = {r["id"]: r["v"]
            for r in selection.winsorize(ndf, "v", by="g", p_lo=0.0,
                                         p_hi=0.5).collect()}
    assert 300 in nout and 301 in nout
    assert nout[301] == 50.5            # p50 of [1, 100]
    # dataset-wide: one fence pair over everything
    glob = {r["id"]: r["v"]
            for r in selection.winsorize(df, "v", p_lo=0.5,
                                         p_hi=1.0).collect()}
    med = con.execute(
        "SELECT quantile_cont(x, 0.5) FROM (SELECT unnest("
        "[1.0,2,3,4,5,6,7,8,9,10,1000,5,6]) AS x)").fetchone()[0]
    assert glob[1] == med and glob[100] == 1000.0
    with pytest.raises(ValueError):
        selection.winsorize(df, "v", p_lo=0.9, p_hi=0.1)


def test_null_stratum_rows_survive_quantile_and_interleave(spark):
    """A NULL stratum is a real group: select_above_quantile gates it
    against its own fence and interleave_ranks still emits a complete
    permutation — neither silently drops the rows (null-safe joins)."""
    from fhir_data_validation_spark.pipeline import selection
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "a"),
         (3, 1.0, None), (4, 9.0, None)],
        "id long, v double, g string")
    kept = {r["id"] for r in selection.select_above_quantile(
        df, "v", "g", 0.5).collect()}
    assert kept == {2, 4}                 # each stratum's own median gate
    ranks = selection.interleave_ranks(df, by="g", key_col="id")
    rows = ranks.collect()
    assert len(rows) == 4                 # no row lost
    col = [c for c in ranks.columns if "rank" in c][0]
    assert sorted(r[col] for r in rows) == [0, 1, 2, 3]


def test_curriculum_null_metric_gets_null_bucket(spark):
    """A NULL metric must not be silently labelled 'hardest': it gets a
    NULL bucket (the comparison chain would otherwise fall through to
    the top stage)."""
    from fhir_data_validation_spark.pipeline import selection
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, None)],
        "id long, m double")
    out = {r["id"]: r["bucket"]
           for r in selection.curriculum_buckets(df, "m", 2).collect()}
    assert out[5] is None
    assert out[1] == 0 and out[4] == 1


# ------------------------------------------------------------------ DSIR ----

def test_dsir_weights_rank_target_domain(spark):
    from fhir_data_validation_spark.pipeline.selection import dsir_weights
    rows = ([(i, "the quick brown fox jumps over the lazy dog", "en")
             for i in range(10)]
            + [(100 + i, "der schnelle braune fuchs springt", "de")
               for i in range(10)]
            + [(200, "", "en")])                      # gram-free doc
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    w = dsir_weights(df, df.where("lang = 'en' AND text <> ''"),
                     n_buckets=256)
    got = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    assert len(got) == 21
    assert got[200] == 0.0                            # no grams -> 0
    en = [got[i] for i in range(10)]
    de = [got[100 + i] for i in range(10)]
    assert min(en) > max(de)                          # target domain wins
    with pytest.raises(ValueError):
        dsir_weights(df, df, n_buckets=1)
    with pytest.raises(ValueError):
        dsir_weights(df, df, alpha=0.0)


def test_dsir_resample_deterministic_and_target_heavy(spark):
    from fhir_data_validation_spark.pipeline.selection import dsir_resample
    rows = ([(i, "alpha beta gamma delta", "en") for i in range(20)]
            + [(100 + i, "uno dos tres cuatro", "es") for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    tgt = df.where("lang = 'en'")
    a = dsir_resample(df, tgt, 10, n_buckets=256, salt=1)
    b = dsir_resample(df, tgt, 10, n_buckets=256, salt=1)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())
    # weights here are extreme (identical texts per class): the sample
    # should be all-target
    assert all(i < 100 for i in ids_a)
    assert "log_weight" in a.columns
    with pytest.raises(ValueError):
        dsir_resample(df, tgt, 0)


def test_dsir_plan_shape(spark):
    import contextlib, io
    from fhir_data_validation_spark.pipeline.selection import (dsir_resample,
                                                               dsir_weights)
    df = spark.createDataFrame([(1, "a b", "en")],
                               "doc_id bigint, text string, lang string")
    w = dsir_weights(df, df, n_buckets=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        w.explain("formatted")
    plan = buf.getvalue()
    # the reduced log-ratio table broadcasts onto the per-doc counts
    assert "BroadcastHashJoin" in plan
    sel = dsir_resample(df, df, 1, n_buckets=16)
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        sel.explain("formatted")
    # global top-n must be a per-partition merge, not a global sort
    assert "TakeOrderedAndProject" in buf2.getvalue()


def test_nan_weights_rates_and_metrics_never_poison_selection(spark):
    """round-5 review regressions (batch 11): Spark NaN compares greater
    than every value, so (a) NaN weights would displace the whole
    weighted sample, (b) a NaN rate would keep its stratum at 100%, and
    (c) NaN metrics would land in the top curriculum bucket and corrupt
    the fences. All three fold NaN into the excluded/null lane."""
    from fhir_data_validation_spark.pipeline.selection import (
        curriculum_buckets, sample_by_rate, sample_weighted)
    nan = float("nan")
    df = spark.createDataFrame(
        [("d%d" % i, "web", 1.0 + i / 100.0) for i in range(50)]
        + [("n%d" % i, "web", nan) for i in range(60)],
        "doc_id string, source string, w double")
    picked = sample_weighted(df, 20, "w", key_col="doc_id").collect()
    assert len(picked) == 20
    assert all(not r["doc_id"].startswith("n") for r in picked)
    # NaN rate drops the stratum (not keep-all)
    out = sample_by_rate(df, {"web": nan}, by="source").count()
    assert out == 0
    # NaN metrics: null bucket, real fences
    b = curriculum_buckets(df, "w", 3)
    rows = {r["doc_id"]: r["bucket"] for r in b.collect()}
    assert all(rows["n%d" % i] is None for i in range(60))
    assert {rows["d%d" % i] for i in range(50)} == {0, 1, 2}
