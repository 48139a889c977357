"""IncrementalProfiler: mergeable column stats over Iceberg snapshot
deltas — delta-only scans, exact merge parity with a full-table
aggregation, HLL cardinality tolerance, rewrite detection, and
crash-resume via the store's own content."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhir_data_validation_spark import IncrementalProfiler
from fhir_data_validation_spark.sources.iceberg_py import PyIcebergTable

SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("toks", T.ArrayType(T.IntegerType())),
    T.StructField("src", T.StringType())])


def _batch(spark, lo, hi, src_of=lambda i: "web" if i % 2 else "book"):
    rows = [(f"d{i}", i, None if i % 11 == 10 else list(range(i % 4)),
             src_of(i)) for i in range(lo, hi)]
    return rows


def _mk(spark, tmp_path, name):
    t = PyIcebergTable.create(spark, str(tmp_path / name), SCHEMA)
    return t


def _truth(df, group_col="src"):
    return {r["g"]: r for r in
            (df.groupBy(F.col(group_col).alias("g"))
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("v").isNull().cast("long")).alias("nn"),
                  F.min("v").cast("double").alias("lo"),
                  F.max("v").cast("double").alias("hi"),
                  F.avg("v").alias("mean"),
                  F.countDistinct("v").alias("nd"))).collect()}


def test_delta_updates_match_full_scan(spark, tmp_path):
    """Three appends folded incrementally == one full aggregation, on
    every exact field; n_distinct within HLL tolerance; array columns
    profile length with null handling; a no-change update is a noop."""
    t = _mk(spark, tmp_path, "p1")
    prof = IncrementalProfiler(t, ["v", "toks", "doc_id"],
                               str(tmp_path / "store1"), group_col="src")
    modes = []
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        t.append(spark.createDataFrame(_batch(spark, lo, hi), SCHEMA))
        modes.append(prof.update()["mode"])
    assert modes == ["rebuild", "delta", "delta"]
    truth = _truth(t.read())
    got = {r["group"]: r
           for r in prof.profile().where("column = 'v'").collect()}
    assert set(got) == set(truth)
    for g, tr in truth.items():
        r = got[g]
        assert r["n_rows"] == tr["n"] and r["n_nulls"] == tr["nn"]
        assert r["min_num"] == tr["lo"] and r["max_num"] == tr["hi"]
        assert abs(r["mean"] - tr["mean"]) < 1e-9
        assert abs(r["n_distinct"] - tr["nd"]) <= max(2, 0.05 * tr["nd"])
        assert r["min_str"] is None and r["max_str"] is None
    # array column: length stats + nulls counted
    toks = {r["group"]: r
            for r in prof.profile().where("column = 'toks'").collect()}
    null_toks = t.read().where("toks IS NULL").groupBy("src").count()
    for x in null_toks.collect():
        assert toks[x["src"]]["n_nulls"] == x["count"]
    assert toks["web"]["max_num"] == 3.0
    # string column: lexicographic bounds live in min_str/max_str
    ds = {r["group"]: r
          for r in prof.profile().where("column = 'doc_id'").collect()}
    assert ds["web"]["min_str"] == "d1" and ds["web"]["min_num"] is None
    assert prof.update()["mode"] == "noop"


def test_resume_from_store_content(spark, tmp_path):
    """A fresh profiler instance on the same store resumes exactly: the
    cursor comes from the store's max-sequence partial batch (snapshot
    ids are random — ordering by id would double-count)."""
    t = _mk(spark, tmp_path, "p2")
    store = str(tmp_path / "store2")
    t.append(spark.createDataFrame(_batch(spark, 0, 30), SCHEMA))
    IncrementalProfiler(t, ["v"], store, group_col="src").update()
    t.append(spark.createDataFrame(_batch(spark, 30, 60), SCHEMA))
    p2 = IncrementalProfiler(t, ["v"], store, group_col="src")
    assert p2.update()["mode"] == "delta"
    assert p2.update()["mode"] == "noop"
    truth = _truth(t.read())
    got = {r["group"]: r for r in p2.profile().collect()}
    for g, tr in truth.items():
        assert got[g]["n_rows"] == tr["n"]


def test_rewrite_triggers_rebuild_or_error(spark, tmp_path):
    """COW and MOR deletes invalidate partials: default rebuilds (stats
    correct again), on_rewrite='error' raises with the offending ops."""
    t = _mk(spark, tmp_path, "p3")
    store = str(tmp_path / "store3")
    t.append(spark.createDataFrame(_batch(spark, 0, 30), SCHEMA))
    prof = IncrementalProfiler(t, ["v"], store, group_col="src")
    prof.update()
    t.delete_rows("v % 10 = 3", mode="mor")
    r = prof.update()
    assert r["mode"] == "rebuild"
    truth = _truth(t.read())
    got = {x["group"]: x for x in prof.profile().collect()}
    for g, tr in truth.items():
        assert got[g]["n_rows"] == tr["n"] and got[g]["max_num"] == tr["hi"]
    # error mode
    t2 = _mk(spark, tmp_path, "p3b")
    t2.append(spark.createDataFrame(_batch(spark, 0, 20), SCHEMA))
    pe = IncrementalProfiler(t2, ["v"], str(tmp_path / "store3b"),
                             on_rewrite="error")
    pe.update()
    t2.delete_rows("v = 1")
    with pytest.raises(ValueError, match="non-append"):
        pe.update()


def test_manifest_compaction_is_transparent(spark, tmp_path):
    """rewrite_manifests (operation 'replace') moves no rows — the next
    update stays a delta, never a rebuild."""
    t = _mk(spark, tmp_path, "p4")
    store = str(tmp_path / "store4")
    t.append(spark.createDataFrame(_batch(spark, 0, 20), SCHEMA))
    prof = IncrementalProfiler(t, ["v"], store)
    prof.update()
    t.rewrite_manifests()
    t.append(spark.createDataFrame(_batch(spark, 20, 40), SCHEMA))
    r = prof.update()
    assert r["mode"] == "delta"
    got = prof.profile().first()
    assert got["n_rows"] == 40 and got["max_num"] == 39.0


def test_rollback_forces_rebuild(spark, tmp_path):
    """A rollback abandons the profiled branch — the cursor is no longer
    in the ancestry, so the profiler rebuilds instead of silently keeping
    rolled-back rows in its totals."""
    t = _mk(spark, tmp_path, "p5")
    store = str(tmp_path / "store5")
    s1 = t.append(spark.createDataFrame(_batch(spark, 0, 10), SCHEMA))
    t.append(spark.createDataFrame(_batch(spark, 10, 30), SCHEMA))
    prof = IncrementalProfiler(t, ["v"], store)
    prof.update()
    t.rollback_to(s1)
    t.append(spark.createDataFrame(_batch(spark, 50, 55), SCHEMA))
    r = prof.update()
    assert r["mode"] == "rebuild"
    got = prof.profile().first()
    assert got["n_rows"] == 15 and got["max_num"] == 54.0


def test_bad_args_raise(spark, tmp_path):
    t = _mk(spark, tmp_path, "p6")
    with pytest.raises(ValueError, match="on_rewrite"):
        IncrementalProfiler(t, ["v"], str(tmp_path / "s6"),
                            on_rewrite="ignore")
    with pytest.raises(ValueError, match="non-empty"):
        IncrementalProfiler(t, [], str(tmp_path / "s6"))


def test_histogram_partials_and_delta_drift_gate(spark, tmp_path):
    """histograms= adds mergeable per-delta histograms in the SAME store
    commit; each delta update scores its distribution against the merged
    history BEFORE folding in — same-distribution batches score ~0,
    a shifted batch trips PSI/KS (the bad-batch gate)."""
    t = _mk(spark, tmp_path, "h1")
    prof = IncrementalProfiler(t, ["v"], str(tmp_path / "sh1"),
                               group_col="src", histograms={"v": 10.0})
    rows = [(f"d{i}", i % 50, [1], "web") for i in range(200)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    r1 = prof.update()
    assert r1["mode"] == "rebuild" and r1["drift"] is None
    t.append(spark.createDataFrame(
        [(f"e{i}", i % 50, [1], "web") for i in range(200)], SCHEMA))
    r2 = prof.update()
    same = {x["source"]: x for x in r2["drift"]["v"]}["web"]
    assert same["psi"] < 0.05 and same["ks"] < 0.1
    t.append(spark.createDataFrame(
        [(f"f{i}", 900 + i % 50, [1], "web") for i in range(200)], SCHEMA))
    r3 = prof.update()
    shifted = {x["source"]: x for x in r3["drift"]["v"]}["web"]
    assert shifted["psi"] > 1.0 and shifted["ks"] > 0.9
    # merged histogram = all three deltas folded
    assert (prof.merged_histogram("v")
            .groupBy().sum("cnt").first()[0]) == 600
    # exact stats unaffected by the histogram rows sharing the store
    row = prof.profile().where("column = 'v'").first()
    assert row["n_rows"] == 600 and row["max_num"] == 949.0
    # noop -> no drift; unknown column raises
    assert prof.update()["drift"] is None
    with pytest.raises(ValueError, match="no histogram"):
        prof.merged_histogram("nope")
    with pytest.raises(ValueError, match="width"):
        IncrementalProfiler(t, ["v"], str(tmp_path / "bad"),
                            histograms={"v": 0})


def test_heavy_hitter_partials_merge_exactly_and_bound(spark, tmp_path):
    """MG partials fold across deltas: with k covering the domain the
    merged counts are EXACT and equal a full-table groupBy; with k below
    the domain the [n_lo, n_hi] bounds contain every true count and the
    guaranteed-presence rule holds; partials land in the SAME store
    commit as the stats (atomic watermark)."""
    t = _mk(spark, tmp_path, "hh")
    prof = IncrementalProfiler(
        t, ["v"], str(tmp_path / "store_hh"), group_col="src",
        heavy_hitters={"doc_id": 4, "src": 100})
    # doc_id domain: one hot id re-appended every delta + unique tails
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        rows = [("HOT", 1, [1], "web")] * 25 + _batch(spark, lo, hi)
        t.append(spark.createDataFrame(rows, SCHEMA))
        prof.update()
    full = t.read()
    # exact regime (k=100 >= |src domain|): merged == full groupBy
    got_src = {(r["group"], r["value"], r["n_lo"], r["n_hi"])
               for r in prof.merged_heavy_hitters("src").collect()}
    want_src = {(r["src"], r["src"], r["n"], r["n"]) for r in
                full.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert got_src == want_src
    # approximate regime (k=4, ~120 distinct doc_ids): bounds hold and
    # the hot key (75 > error_bound) is guaranteed present
    true = {(r["src"], r["doc_id"]): r["n"] for r in
            full.groupBy("src", "doc_id").agg(F.count("*").alias("n"))
            .collect()}
    out = prof.merged_heavy_hitters("doc_id").collect()
    web = [r for r in out if r["group"] == "web"]
    assert web and all(r["n_lo"] <= true[("web", r["value"])] <= r["n_hi"]
                       for r in web)
    err = web[0]["error_bound"]
    hot = [r for r in web if r["value"] == "HOT"]
    assert true[("web", "HOT")] == 75 and 75 > err and hot
    assert hot[0]["n_lo"] <= 75 <= hot[0]["n_hi"]
    # store size contract: ≤ k candidates + 1 error row per (delta, group)
    hh_rows = (prof._store().read()
               .where("column = 'doc_id' AND kind = 'hh'")
               .groupBy("to_snapshot", "group").count().collect())
    assert all(r["count"] <= 4 for r in hh_rows)
    # unknown column raises
    with pytest.raises(ValueError):
        prof.merged_heavy_hitters("nope")
    with pytest.raises(ValueError):
        IncrementalProfiler(t, ["v"], str(tmp_path / "s2"),
                            heavy_hitters={"doc_id": 0})


def test_merged_quantiles_from_histogram_partials(spark, tmp_path):
    """merged_quantiles inverts the folded histogram: estimates land
    within one bucket_width of the exact per-group percentiles no matter
    how many deltas were folded; endpoints clamp to the data range."""
    t = _mk(spark, tmp_path, "q1")
    width = 5.0
    prof = IncrementalProfiler(t, ["v"], str(tmp_path / "sq1"),
                               group_col="src", histograms={"v": width})
    for lo, hi in ((0, 400), (400, 800), (800, 1200)):
        rows = [(f"d{i}", i, [1], "web" if i % 2 else "book")
                for i in range(lo, hi)]
        t.append(spark.createDataFrame(rows, SCHEMA))
        prof.update()
    probs = (0.0, 0.25, 0.5, 0.75, 1.0)
    got = {(r["group"], r["p"]): r["value"]
           for r in prof.merged_quantiles("v", probs).collect()}
    exact = {(r["src"], p): r[f"q{i}"] for r in
             t.read().groupBy("src")
              .agg(*[F.expr(f"percentile(v, {p})").alias(f"q{i}")
                     for i, p in enumerate(probs)]).collect()
             for i, p in enumerate(probs)}
    assert set(g for g, _ in got) == {"web", "book"}
    for key, want in exact.items():
        assert abs(got[key] - want) <= width + 1e-9, (key, got[key], want)
    # p outside [0,1] and unconfigured columns raise
    with pytest.raises(ValueError, match="probs"):
        prof.merged_quantiles("v", (1.5,))
    with pytest.raises(ValueError, match="no histogram"):
        prof.merged_quantiles("doc_id")


def test_profile_mean_exact_beyond_double_precision(spark, tmp_path):
    """round-5 review regressions (batch 3): per-delta sums ride an
    exact DECIMAL lane for integral columns, so profile()'s mean stays
    bit-exact even when the running sum exceeds 2^53 — double partials
    drift with fold order there, breaking the c10 cross-engine contract
    (oracle: CAST(sum AS BIGINT→DOUBLE)/count)."""
    vals = [9_100_000_000_000_001 + 7 * i for i in range(99)]
    rows = [("d%d" % i, v, None, "web") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, SCHEMA)
    t = PyIcebergTable.create(spark, str(tmp_path / "t_big"), SCHEMA)
    prof = IncrementalProfiler(t, ["v"], str(tmp_path / "s_big"),
                               group_col="src")
    for k in range(3):
        t.append(df.where(
            F.col("doc_id").substr(2, 10).cast("int") % 3 == k).coalesce(2))
        prof.update()
    got = {r["column"]: r
           for r in prof.profile(with_distinct=False).collect()}
    exact = float(sum(vals)) / len(vals)   # correctly-rounded double of
    assert got["v"]["mean"] == exact       # the EXACT integer sum
    assert got["v"]["n_rows"] == 99


def test_profile_over_pre_evolution_store_falls_back_cleanly(spark, tmp_path):
    """round-5 review regressions (batch 7): a store written BEFORE the
    exact sum_dec lane existed evolves in place (add_column) and a
    mixed history — one pre-evolution partial (sum_dec NULL) + one
    post-evolution delta — must take the double-sum fallback and still
    produce the correct mean over BOTH deltas (a partial decimal sum
    must never masquerade as the total)."""
    from fhir_data_validation_spark.incremental_stats import \
        _PARTIAL_SCHEMA

    d1_vals = [10, 20, 30, 40]
    d2_vals = [50, 60]
    t = PyIcebergTable.create(spark, str(tmp_path / "t_evo"), SCHEMA)
    t.append(spark.createDataFrame(
        [(f"a{i}", v, None, "web") for i, v in enumerate(d1_vals)], SCHEMA))
    sid1 = t.current_snapshot_id()
    seq1 = {r["snapshot_id"]: r["sequence_number"]
            for r in t.snapshots().collect()}[sid1]
    # handcraft delta-1's partial in the PRE-evolution schema
    old_schema = T.StructType(
        [f for f in _PARTIAL_SCHEMA.fields if f.name != "sum_dec"])
    store_t = PyIcebergTable.create(spark, str(tmp_path / "s_evo"),
                                    old_schema)
    store_t.append(spark.createDataFrame(
        [("web", "v", len(d1_vals), 0, float(min(d1_vals)),
          float(max(d1_vals)), float(sum(d1_vals)),
          float(sum(v * v for v in d1_vals)), None, None, None,
          "stat", None, None, sid1, seq1)], old_schema))
    prof = IncrementalProfiler(t, ["v"], str(tmp_path / "s_evo"),
                               group_col="src")
    t.append(spark.createDataFrame(
        [(f"b{i}", v, None, "web") for i, v in enumerate(d2_vals)], SCHEMA))
    assert prof.update()["mode"] == "delta"   # cursor honored, not rebuilt
    # the store now holds one NULL-lane and one decimal-lane partial
    lanes = (prof._store().read().where(F.col("kind") == "stat")
             .select("sum_dec").collect())
    assert sorted(r["sum_dec"] is None for r in lanes) == [False, True]
    got = prof.profile(with_distinct=False).collect()[0]
    allv = d1_vals + d2_vals
    assert got["n_rows"] == len(allv)
    assert got["mean"] == float(sum(allv)) / len(allv)
