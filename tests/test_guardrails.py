"""Architecture guardrails (StructureValidationGuardrailTests.cs analog):
cross-cutting invariants every engine run must keep — stage provenance,
row completeness, no duplicate errors, spec-hint separation."""

import pytest

from fhir_data_validation_spark import EngineConfig, ValidationEngine
from fhir_data_validation_spark.compiler import RULE_STAGES
from fhir_data_validation_spark.model import RuleDefinition, RuleSet
from fhir_data_validation_spark.rulesets import default_token_ruleset
from fhir_data_validation_spark.sources.synth import (dirty_token_table,
                                                      sources_dim)


@pytest.fixture(scope="module")
def default_rows(spark):
    """One shared validate of the dirty corpus (the pattern of
    test_engine.py's `result` fixture) — every guardrail asserts over
    these collected rows."""
    df = dirty_token_table(spark, 2000).drop("_row_id")
    res = ValidationEngine(default_token_ruleset(),
                           dims={"sources_dim": sources_dim(spark)}
                           ).validate(df)
    rows = res.violations.collect()
    res.unpersist()
    assert rows                      # the dirty corpus must fire something
    return rows


def test_stage_provenance_matches_rule_type(spark):
    """OnlyJsonNodeStructuralValidator_MayEmitStructureErrors analog:
    a violation's stage is ALWAYS the one its rule type declares — for
    BOTH the fused predicate lane and every dataset plan (the public
    violations frame drops stage, so provenance is asserted on the
    internal lanes)."""
    from fhir_data_validation_spark.engine import predicate_violations
    df = dirty_token_table(spark, 2000).drop("_row_id")
    eng = ValidationEngine(default_token_ruleset(),
                           dims={"sources_dim": sources_dim(spark)})
    plan = eng.compile(df)
    staged = predicate_violations(df, plan).collect()
    assert staged
    for dp in plan.dataset_plans:
        staged += dp.execute(df, plan).collect()
    for r in staged:
        assert r["stage"] == RULE_STAGES[r["rule_type"]], (
            r["rule_id"], r["rule_type"], r["stage"])


def test_no_duplicate_error_rows(default_rows):
    """StructureValidation_MustNotEmitDuplicateErrors analog: after A5
    dedup, no two violation rows share (doc_id, rule_id, error_code,
    column, detail)."""
    rows = default_rows
    seen = set()
    for r in rows:
        key = (r["doc_id"], r["rule_id"], r["error_code"], r["column"],
               tuple(sorted((r["detail"] or {}).items())))
        assert key not in seen, key
        seen.add(key)


def test_errors_carry_required_properties(default_rows):
    """StructureErrors_MustHaveRequiredProperties analog: every emitted
    violation names its rule, code, severity, and group; per-row families
    always carry a doc identity (only dataset-level rollups may not)."""
    from fhir_data_validation_spark.compiler import DATASET_RULE_TYPES
    rows = default_rows
    for r in rows:
        assert r["rule_id"] and r["error_code"], r
        assert r["severity"] in ("error", "warning", "info"), r
        # per-row families always carry a doc identity; their source may
        # be null only when the violated column IS the group column (a
        # missing group value is itself the finding). Dataset-level
        # rollups (RequiredResources dataset row) legitimately carry
        # neither.
        if r["rule_type"] not in DATASET_RULE_TYPES:
            assert r["doc_id"] is not None, r
            if r["column"] != "source":
                assert r["source"] is not None, r


def test_structural_rules_never_emit_spec_hints(spark, default_rows):
    """JsonNodeStructuralValidator_MustNotEmitSpecHint analog: the
    validation surface and the spec-hint surface stay separate — an
    engine run never produces spec-hint rows, and the spec-hint pass
    never produces violation-shaped rows."""
    rows = default_rows
    assert all(r["error_code"] != "SPEC_HINT" for r in rows)
    from fhir_data_validation_spark.spechints import SpecHint, scan
    df = dirty_token_table(spark, 500).drop("_row_id")
    hints = scan(df, [SpecHint(path="doc_id",
                               reason="identifier expected")])
    cols = set(hints.columns)
    assert "error_code" not in cols      # advisory surface, not violations
    assert {"path", "reason", "severity"} <= cols


def test_notices_respect_guardrails(spark):
    """Compile-time notices obey the same row contract (stage matches the
    Enum family's STRUCTURE stage; required properties present)."""
    df = spark.createDataFrame([("d1", "web", "x")],
                               "doc_id string, source string, status string")
    eng = ValidationEngine(
        RuleSet(rules=(RuleDefinition.parse(
            {"id": "E-VS", "type": "Enum", "column": "status",
             # round 5: a binding is required for the notice to exist at
             # all (missing/'example' bindings suppress it entirely)
             "params": {"valueSet": "http://vs",
                        "binding": "required"}}),)),
        config=EngineConfig(key_col="doc_id", group_col="source"))
    plan = eng.compile(df)
    assert len(plan.notices) == 1
    n = plan.notices[0]
    assert n["stage"] == RULE_STAGES["Enum"]
    assert n["rule_id"] and n["error_code"] and n["severity"]
