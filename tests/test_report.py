"""One-call QualityReport tests."""

from fhir_data_validation_spark.report import quality_report
from fhir_data_validation_spark.rulesets import default_token_ruleset
from fhir_data_validation_spark.sources.synth import (dirty_token_table,
                                                      sources_dim,
                                                      token_table)


def test_quality_report_dirty(spark):
    df = dirty_token_table(spark, 1000).drop("_row_id")
    rep = quality_report(df, default_token_ruleset(),
                         dims={"sources_dim": sources_dim(spark)})
    s = rep.summary
    assert s["rows"] == 1000
    assert s["errors"] > 0 and not rep.passed()
    assert s["duplicate_keys"] == 1          # one duplicated doc_id per 1000
    assert s["groups"] >= 5                  # 4 sources + junk (+ <null>)
    assert rep.profile.count() == s["groups"]
    assert rep.duplicate_keys.collect()[0]["cnt"] == 6


def test_quality_report_clean(spark):
    df = token_table(spark, 500)
    rep = quality_report(df, default_token_ruleset(),
                         dims={"sources_dim": sources_dim(spark)},
                         profile_columns=["n_tok"])
    assert rep.passed()
    assert rep.summary["violations"] == 0
    assert rep.summary["rows"] == 500


def test_quality_report_with_suggestions(spark):
    from fhir_data_validation_spark import quality_report
    from fhir_data_validation_spark.model import RuleSet
    from fhir_data_validation_spark.sources.synth import dirty_token_table
    df = dirty_token_table(spark, 200).drop("_row_id")
    rs = RuleSet.parse({"rules": [
        {"id": "REQ-1", "type": "Required", "column": "tokens"}]})
    rep = quality_report(df, rs, suggest=True)
    assert rep.suggestions is not None and len(rep.suggestions) > 0
    assert all({"rule", "detector", "confidence", "rationale"}
               <= set(s) for s in rep.suggestions)
    # default stays off — no profiler pass unless asked
    assert quality_report(df, rs).suggestions is None
