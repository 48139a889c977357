"""Column-stats (C1–C4) and skew-salting operator tests."""

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark import stats
from fhir_data_validation_spark.skew import (salted_count_distinct,
                                             salted_examples)
from fhir_data_validation_spark.sources.synth import token_table


@pytest.fixture(scope="module")
def tokens(spark):
    return token_table(spark, 2000).cache()


def test_profile_global(spark, tokens):
    row = stats.profile(tokens, ["n_tok", "doc_id"]).collect()[0]
    assert row["group"] == "<all>"
    assert row["n_rows"] == 2000
    assert row["n_tok"]["min"] >= 1.0
    assert row["n_tok"]["max"] <= 8192.0
    assert row["n_tok"]["null_rate"] == 0.0
    assert row["doc_id"]["min"] == "doc-00000000"  # lexicographic for strings
    # doc_id is unique: HLL estimate within 5% rsd of 2000
    assert abs(row["doc_id"]["n_distinct"] - 2000) < 2000 * 0.15


def test_profile_grouped_and_array_column(spark, tokens):
    rows = stats.profile(tokens, ["tokens"], group_col="source",
                         exact_distinct=True).collect()
    assert {r["group"] for r in rows} == {"web", "books", "code", "wiki"}
    for r in rows:  # array columns profile their length
        assert 1.0 <= r["tokens"]["min"] <= r["tokens"]["max"] <= 8192.0


def test_histogram_matches_groupby(spark, tokens):
    hist = stats.histogram(tokens, "n_tok", 64, group_col="source")
    total = hist.agg(F.sum("cnt")).collect()[0][0]
    assert total == 2000
    direct = (tokens.groupBy(F.floor(F.col("n_tok") / 64)).count().count())
    assert hist.select("bucket").distinct().count() <= direct * 4


def test_token_frequencies(spark, tokens):
    freq = stats.token_frequencies(tokens.limit(50))
    total = freq.agg(F.sum("cnt")).collect()[0][0]
    expected = tokens.limit(50).agg(F.sum(F.size("tokens"))).collect()[0][0]
    assert total == expected


def test_hll_sketch_merge(spark, tokens):
    sk = stats.hll_sketches(tokens, ["doc_id"], group_col="source")
    assert sk.count() == 4
    merged = stats.merge_hll(sk, ["doc_id"]).collect()[0]
    assert abs(merged["doc_id"] - 2000) < 2000 * 0.15


def test_pk_duplicates(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("c",), ("c",), ("c",)], "k string")
    dups = {r["k"]: r["cnt"] for r in stats.pk_duplicates(df, "k").collect()}
    assert dups == {"b": 2, "c": 3}


# ------------------------------------------------------------------- skew ---

def test_salted_count_distinct_exact(spark, tokens):
    got = {r["source"]: r["n_distinct"] for r in
           salted_count_distinct(tokens, "source", "n_tok",
                                 key_col="doc_id", buckets=8).collect()}
    want = {r["source"]: r["n"] for r in
            tokens.groupBy("source")
            .agg(F.countDistinct("n_tok").alias("n")).collect()}
    assert got == want


def test_salted_examples_bounded_and_deterministic(spark, tokens):
    ex1 = {r["source"]: r["examples"] for r in
           salted_examples(tokens, "source", "doc_id", k=3).collect()}
    ex2 = {r["source"]: r["examples"] for r in
           salted_examples(tokens.repartition(13), "source", "doc_id",
                           k=3).collect()}
    assert ex1 == ex2  # deterministic under repartitioning
    for v in ex1.values():
        assert len(v) == 3 and v == sorted(v)


def test_quantiles_long_form(spark):
    from fhir_data_validation_spark import stats
    from fhir_data_validation_spark.sources.synth import token_table
    df = token_table(spark, 2000)
    out = stats.quantiles(df, "n_tok", probs=(0.5,), group_col="source")
    rows = out.collect()
    groups = {r["group"] for r in rows}
    assert groups == {r["source"] for r in
                      df.select("source").distinct().collect()}
    # the median sits inside the observed range, one row per (group, p)
    lo, hi = df.agg(F.min("n_tok"), F.max("n_tok")).first()
    assert all(r["p"] == 0.5 and lo <= r["value"] <= hi for r in rows)


def test_rollup_counts_levels_and_single_pass(spark):
    from fhir_data_validation_spark import stats
    df = spark.createDataFrame(
        [("en", "a", 10), ("en", "a", 20), ("en", "b", 5), ("de", "a", 1)],
        "lang string, source string, n_chars long")
    out = stats.rollup_counts(df, ["lang", "source"], value_col="n_chars")
    got = {(r["lang"], r["source"]): (r["level"], r["n_rows"], r["total"])
           for r in out.collect()}
    assert got[("en", "a")] == (0, 2, 30.0)
    assert got[("en", "<all>")] == (1, 3, 35.0)
    assert got[("<all>", "<all>")] == (3, 4, 36.0)
    assert ("de", "b") not in got            # rollup, not cube
    # one Expand + one aggregation pass: a single shuffle, no per-level
    # re-scan of the input
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])   # AQE prints both sections
    assert plan.count("Expand") >= 1
    assert plan.count("ShuffleQueryStage") == 1   # one shuffle boundary
    assert plan.count("HashAggregate") == 2       # partial + final


def test_pivot_counts_wide_and_fillna(spark):
    from fhir_data_validation_spark import stats
    df = spark.createDataFrame(
        [("en", "a", 10.0), ("en", "a", 2.5), ("de", "b", 4.0)],
        "lang string, source string, v double")
    counts = {r["lang"]: (r["a"], r["b"]) for r in
              stats.pivot_counts(df, "lang", "source", ["a", "b"])
              .collect()}
    assert counts == {"en": (2, 0), "de": (0, 1)}   # nulls -> 0
    sums = {r["lang"]: (r["a"], r["b"]) for r in
            stats.pivot_counts(df, "lang", "source", ["a", "b"],
                               value_col="v").collect()}
    assert sums == {"en": (12.5, 0.0), "de": (0.0, 4.0)}
    # unlisted column values never appear as columns
    out = stats.pivot_counts(df, "lang", "source", ["a"])
    assert out.columns == ["lang", "a"]


def test_diff_tables_statuses(spark):
    from fhir_data_validation_spark import stats
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", None), (4, "w", 40)],
        "id long, t string, v int")
    b = spark.createDataFrame(
        [(2, "y", 20),            # unchanged -> absent from output
         (3, "z", 30),            # null -> value = changed (null-safe)
         (4, "W", 40),            # string changed
         (5, "new", 50)],         # added
        "id long, t string, v int")
    got = {r["id"]: r["status"] for r in
           stats.diff_tables(a, b, ["id"], ["t", "v"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_cube_counts_includes_column_slices(spark):
    from fhir_data_validation_spark import stats
    df = spark.createDataFrame(
        [("en", "a", 10), ("en", "b", 5), ("de", "a", 1)],
        "lang string, source string, n_chars long")
    got = {(r["lang"], r["source"]): (r["level"], r["n_rows"])
           for r in stats.cube_counts(df, ["lang", "source"]).collect()}
    assert got[("<all>", "a")] == (2, 2)     # the slice rollup lacks
    assert got[("en", "<all>")] == (1, 2)
    assert got[("<all>", "<all>")] == (3, 3)
    assert len(got) == 3 + 2 + 2 + 1   # pairs + lang + source + total


def test_data_card_strata_and_rollup(spark):
    """data_card: per-source counts/volumes/length-quantiles plus an <all>
    rollup row from ONE rollup pass; null text counts as a doc but
    contributes to no other aggregate; exact quantiles match DuckDB
    quantile_cont on the same lengths."""
    import duckdb
    rows = [(1, "a b", "web"), (2, "ccc dd e", "web"),
            (3, "ffff", "wiki"), (4, None, "wiki")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in stats.data_card(df).collect()}
    assert set(out) == {"web", "wiki", "<all>"}
    assert (out["web"]["n_docs"], out["web"]["n_chars"],
            out["web"]["n_tokens"]) == (2, 11, 5)
    assert (out["wiki"]["n_docs"], out["wiki"]["n_chars"],
            out["wiki"]["n_tokens"]) == (2, 4, 1)
    assert (out["<all>"]["n_docs"], out["<all>"]["n_chars"],
            out["<all>"]["n_tokens"]) == (4, 15, 6)
    con = duckdb.connect()
    want_p50 = con.execute(
        "SELECT quantile_cont(x, 0.5) FROM (VALUES (3.0), (8.0)) t(x)"
    ).fetchone()[0]
    assert out["web"]["p50_len"] == want_p50
    assert out["wiki"]["p50_len"] == 4.0     # single non-null length
    # one aggregation pass: a single Expand, no join/union in the plan
    plan = (stats.data_card(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Expand") == 1 and "Join" not in plan


def test_skew_report_top_k(spark):
    """Heaviest keys with exact shares, (cnt desc, key asc) tie order;
    the global top-k plans as TakeOrderedAndProject (no single-task
    sort)."""
    from fhir_data_validation_spark.skew import skew_report
    rows = [(i, "hot") for i in range(80)] + \
           [(i, f"k{i % 5}") for i in range(20)]
    df = spark.createDataFrame(rows, "i long, key string")
    out = skew_report(df, "key", top_k=3).collect()
    assert [r["key"] for r in out] == ["hot", "k0", "k1"]
    assert out[0]["cnt"] == 80 and abs(out[0]["share"] - 0.8) < 1e-12
    assert [r["rank"] for r in out] == [1, 2, 3]
    plan = (skew_report(df, "key")._jdf.queryExecution()
            .executedPlan().toString())
    assert "TakeOrdered" in plan


# ------------------------------------------------ Misra-Gries heavy hitters -

def test_heavy_hitters_exact_when_k_covers_domain(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {(r["value"], r["n_lo"], r["n_hi"])
           for r in stats.heavy_hitters(docs, "lang", k=100).collect()}
    want = {(r["lang"], r["n"], r["n"]) for r in
            docs.where(F.col("lang").isNotNull())
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == want            # error_bound 0 ⇒ bounds collapse to exact


def test_heavy_hitters_bounds_hold_under_pruning(spark):
    """k far below the domain: every reported value's true count must sit
    in [n_lo, n_hi], and values with true count > error_bound must be
    reported (the MG guarantee)."""
    rows = ([("hot",)] * 4000 + [("warm",)] * 1500
            + [(f"cold{i}",) for i in range(4500)])
    df = spark.createDataFrame(rows, "v string").repartition(8)
    out = stats.heavy_hitters(df, "v", k=10).collect()
    true = {"hot": 4000, "warm": 1500, **{f"cold{i}": 1 for i in range(4500)}}
    by_val = {r["value"]: r for r in out}
    for v, r in by_val.items():
        assert r["n_lo"] <= true[v] <= r["n_hi"], (v, r)
    err = out[0]["error_bound"]
    assert err > 0
    for v, n in true.items():
        if n > err:
            assert v in by_val, f"guaranteed hitter {v} missing (err={err})"


def test_heavy_hitters_grouped_and_guards(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stats.heavy_hitters(docs, "lang", k=50, group_col="source")
    rows = out.collect()
    srcs = {r["group"] for r in rows}
    assert len(srcs) > 1 and "<all>" not in srcs
    one = [r for r in rows if r["group"] == sorted(srcs)[0]]
    want = {(r["lang"], r["n"]) for r in
            docs.where(F.col("source") == sorted(srcs)[0])
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert {(r["value"], r["n_lo"]) for r in one} == want
    with pytest.raises(ValueError):
        stats.heavy_hitters(docs, "lang", k=0)


def test_heavy_hitters_null_group_sentinel(spark):
    """Rows whose group key is NULL land in the '<null>' group instead of
    silently vanishing from the summary (pandas groupby drops NaN keys
    by default; the final join would drop null keys too)."""
    from fhir_data_validation_spark.stats import heavy_hitters
    rows = ([("u1", None)] * 30 + [("u2", None)] * 5
            + [("u1", "web")] * 3)
    df = spark.createDataFrame(rows, "url string, source string")
    out = {(r["group"], r["value"]): r["n_lo"]
           for r in heavy_hitters(df, "url", k=10,
                                  group_col="source").collect()}
    assert out[("<null>", "u1")] == 30
    assert out[("<null>", "u2")] == 5
    assert out[("web", "u1")] == 3


def test_salted_count_distinct_all_null_group(spark):
    """A group whose values are all NULL reports n_distinct=0 like the
    plain groupBy+countDistinct it replaces — not a missing row."""
    from fhir_data_validation_spark.skew import salted_count_distinct
    df = spark.createDataFrame(
        [("web", None), ("web", None), ("book", "x")],
        "source string, v string")
    got = {r["source"]: r["n_distinct"] for r in
           salted_count_distinct(df, "source", "v").collect()}
    assert got == {"web": 0, "book": 1}
