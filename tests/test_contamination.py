"""Benchmark contamination: n-gram overlap detection + decontamination."""

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark.pipeline.contamination import (
    benchmark_contamination, remove_contaminated)

BENCH_TEXT = ("the quick brown fox jumps over the lazy dog while seven "
              "wizards brew strong potions under a pale winter moon")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("exact", BENCH_TEXT),
        ("prefixed", "breaking news today " + BENCH_TEXT),
        # shares words but no 13-gram run
        ("shuffled", "dog lazy the over jumps fox brown quick the moon "
                     "winter pale a under potions strong brew wizards "
                     "seven while"),
        ("clean", "completely unrelated content about spark window "
                  "functions and shuffle partitioning strategies for "
                  "large scale joins across many executors"),
        ("short", ""),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame([("q1", BENCH_TEXT)],
                                 "qid string, text string")


def test_overlap_and_ratio(spark, corpus, bench_set):
    out = {r["doc_id"]: r for r in
           benchmark_contamination(corpus, bench_set, n=13).collect()}
    assert set(out) == {"exact", "prefixed"}
    ex = out["exact"]                       # identical text: full overlap
    assert ex["n_overlap"] == ex["n_shingles"] and ex["ratio"] == 1.0
    pre = out["prefixed"]                   # extra prefix dilutes the ratio
    assert 0 < pre["n_overlap"] < pre["n_shingles"]


def test_short_doc_whole_sequence_shingle(spark, bench_set):
    docs = bench_set.select(F.col("qid").alias("doc_id"),
                            F.col("text").alias("text"))
    short_bench = bench_set.select("qid",
                                   F.lit("tiny snippet").alias("text"))
    tiny = docs.union(
        docs.select(F.lit("t1"), F.lit("tiny snippet")))
    out = {r["doc_id"] for r in
           benchmark_contamination(tiny, short_bench, n=13).collect()}
    assert out == {"t1"}                    # whole-doc shingle matches


def test_md5_60_hash_variant_agrees(spark, corpus, bench_set):
    a = sorted(map(tuple, benchmark_contamination(
        corpus, bench_set, n=13).collect()))
    b = sorted(map(tuple, benchmark_contamination(
        corpus, bench_set, n=13, hash_fn="md5_60").collect()))
    assert a == b


def test_remove_contaminated(spark, corpus, bench_set):
    kept = {r["doc_id"] for r in
            remove_contaminated(corpus, bench_set, threshold=0.5,
                                n=13).collect()}
    # 'exact' (ratio 1.0) and 'prefixed' (8/11 shingles = 0.727) are both
    # over the 0.5 threshold
    assert "exact" not in kept and "clean" in kept and "shuffled" in kept
    assert remove_contaminated(corpus, bench_set, threshold=2.0, n=13) \
        .count() == corpus.count()          # unreachable threshold: no-op


def test_min_overlap_validation(spark, corpus, bench_set):
    with pytest.raises(ValueError):
        benchmark_contamination(corpus, bench_set, min_overlap=0)


def test_benchmark_side_is_broadcast(spark, corpus, bench_set):
    plan = benchmark_contamination(corpus, bench_set)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_token_native_contamination(spark):
    from fhir_data_validation_spark.pipeline.contamination import \
        benchmark_contamination
    seq = list(range(100, 140))          # 40 tokens
    docs = spark.createDataFrame(
        [("hit", seq), ("part", [0] * 10 + seq[:20]),
         ("clean", list(range(500, 540))), ("tiny", [1, 2]),
         ("empty", [])],
        "doc_id string, tokens array<int>")
    bench = spark.createDataFrame([("b1", seq), ("b2", [1, 2])],
                                  "qid string, tokens array<int>")
    out = {r["doc_id"]: r for r in benchmark_contamination(
        docs, bench, n=13, tokens_col="tokens").collect()}
    assert set(out) == {"hit", "part", "tiny"}
    assert out["hit"]["ratio"] == 1.0
    # part: 30 tokens -> 18 shingles, 8 of which (windows fully inside
    # seq[:20]) overlap b1's shingle set
    assert out["part"]["n_overlap"] == 8
    assert out["tiny"]["ratio"] == 1.0   # whole-sequence shingle matches b2
