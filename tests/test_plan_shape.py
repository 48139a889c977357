"""Physical-plan regression tests (SURVEY §4.3): the engine's scale
properties are plan shapes, not constants — pin them.

* fused pass: rule conditions filter inside WholeStageCodegen BEFORE the
  exchange; explode only after (GenerateExec drops codegen when its child
  contains CodegenFallback HOFs — measured 10×).
* dataset plans: column pruning — Unique/Reference scans must not read
  ``tokens`` (the dominant bytes at corpus scale).
* Reference: broadcast (not sort-merge) anti-join for small dims.
* stats: partial (map-side) aggregation before the shuffle.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark import ValidationEngine
from fhir_data_validation_spark.engine import predicate_violations
from fhir_data_validation_spark.rulesets import default_token_ruleset
from fhir_data_validation_spark.sources.synth import (sources_dim,
                                                      token_table)


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plans") / "tokens")
    token_table(spark, 1000).write.parquet(out)
    return spark.read.parquet(out)


@pytest.fixture(scope="module")
def plan(spark, corpus):
    from fhir_data_validation_spark.sources.synth import stats_baseline
    engine = ValidationEngine(
        default_token_ruleset(with_drift=True),
        dims={"sources_dim": sources_dim(spark),
              "stats_baseline": stats_baseline(token_table(spark, 1000))})
    return engine.compile(corpus)


def test_fused_pass_filter_before_exchange(spark, corpus, plan):
    s = explain_str(predicate_violations(corpus, plan))
    # formatted explain prints ROOT first: Generate … Exchange … Filter …
    # Scan means execution order Scan → Filter → Exchange → Generate
    i_filter = s.index("Filter")
    i_exchange = s.index("Exchange")
    i_generate = s.index("Generate")
    assert i_generate < i_exchange < i_filter
    # the full-input Filter condition is pure native functions (codegen-able)
    # — the CASE WHEN violation structs live only in Generate's arguments,
    # after the exchange
    cond = s[s.index("(2) Filter"):s.index("(3) Exchange")]
    assert "CASE WHEN" not in cond
    assert "array_min" in cond and "array_max" in cond  # native token-domain
    gen = s[s.index("(4) Generate"):]
    assert "CASE WHEN" in gen


def test_dataset_plans_prune_tokens_column(spark, corpus, plan):
    for dp in plan.dataset_plans:
        if dp.rule.type in ("Unique", "Reference", "RequiredResources"):
            s = explain_str(dp.execute(corpus, plan))
            read_schemas = [ln for ln in s.splitlines()
                            if "ReadSchema" in ln]
            assert read_schemas, s
            assert all("tokens" not in ln for ln in read_schemas), \
                (dp.rule.id, read_schemas)


def test_reference_uses_broadcast_join(spark, corpus, plan):
    ref = next(dp for dp in plan.dataset_plans if dp.rule.type == "Reference")
    s = explain_str(ref.execute(corpus, plan))
    assert "BroadcastHashJoin" in s or "BroadcastExchange" in s
    assert "SortMergeJoin" not in s


def test_drift_scan_reads_only_needed_columns(spark, corpus, plan):
    drift = [dp for dp in plan.dataset_plans if dp.rule.type == "Drift"]
    assert drift
    s = explain_str(drift[0].execute(corpus, plan))
    # the drift scan reads only (source, n_tok) — histograms reduce BEFORE
    # the Arrow stage, which must see O(groups × buckets), not rows
    read = [ln for ln in s.splitlines() if "ReadSchema" in ln
            and "tokens" not in ln.split("ReadSchema")[1]]
    assert read
    assert "MapInPandas" in s or "FlatMapGroupsInPandas" in s
    assert s.index("HashAggregate") < s.index("Scan parquet")  # agg below scan in root-first print means agg AFTER scan


def test_stats_partial_aggregation(spark, corpus):
    from fhir_data_validation_spark import stats
    s = explain_str(stats.histogram(corpus, "n_tok", 64, group_col="source"))
    # partial+final hash aggregation around one exchange
    assert s.count("HashAggregate") >= 2
    assert all("tokens" not in ln for ln in s.splitlines()
               if "ReadSchema" in ln)


def test_parquet_filter_pushdown(spark, corpus):
    s = explain_str(corpus.where(F.col("n_tok") > 100).select("doc_id"))
    pushed = [ln for ln in s.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThan(n_tok,100)" in pushed[0]