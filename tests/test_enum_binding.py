"""Phase B enum semantics (JsonNodeStructuralValidatorPhaseBTests
analog): binding strength drives severity
(MapBindingStrengthToSeverity :534-545) and a declared-but-unresolvable
valueSet emits ONE ENUM_VALIDATION_SKIPPED transparency notice instead
of guessing or refusing the run (CreateEnumValidationSkippedError
:549-578)."""

import pytest

from fhir_data_validation_spark import (EngineConfig,
                                        RuleConfigurationError,
                                        ValidationEngine, validate_details)
from fhir_data_validation_spark.model import RuleDefinition, RuleSet


def _df(spark):
    return spark.createDataFrame(
        [("d1", "web", "active"), ("d2", "web", "bogus"),
         ("d3", "app", "retired")],
        "doc_id string, source string, status string")


def _run(spark, rule):
    res = ValidationEngine(
        RuleSet(rules=(RuleDefinition.parse(rule),)),
        config=EngineConfig(key_col="doc_id", group_col="source")
    ).validate(_df(spark))
    out = res.violations.collect()
    res.unpersist()
    return out


@pytest.mark.parametrize("binding,severity", [
    ("required", "error"), ("extensible", "warning"),
    ("preferred", "info"), ("example", "info")])
def test_binding_strength_maps_to_severity(spark, binding, severity):
    out = _run(spark, {"id": "E-B", "type": "Enum", "column": "status",
                       "params": {"values": ["active", "retired"],
                                  "binding": binding}})
    assert [r["doc_id"] for r in out] == ["d2"]
    assert out[0]["severity"] == severity
    assert out[0]["error_code"] == "INVALID_ENUM_VALUE"


def test_unknown_binding_raises_at_compile(spark):
    with pytest.raises(RuleConfigurationError):
        _run(spark, {"id": "E-X", "type": "Enum", "column": "status",
                     "params": {"values": ["a"], "binding": "mandatory"}})


def test_unresolvable_valueset_emits_skip_notice(spark):
    out = _run(spark, {"id": "E-VS", "type": "Enum", "column": "status",
                       "params": {"valueSet": "http://hl7.org/fhir/"
                                              "ValueSet/observation-status",
                                  "binding": "extensible"}})
    assert len(out) == 1
    n = out[0]
    assert n["error_code"] == "ENUM_VALIDATION_SKIPPED"
    assert n["doc_id"] is None          # dataset-level, no row identity
    assert n["source"] == "<dataset>"
    assert n["severity"] == "warning"   # extensible → warning
    assert n["detail"]["bindingStrength"] == "extensible"
    assert "observation-status" in n["detail"]["valueSet"]
    # detail keys are exactly the reference's frozen schema
    assert validate_details(n["error_code"], n["detail"]) == []


def test_skip_notice_does_not_fail_run_unless_required(spark):
    """A skipped extensible/preferred binding is a warning — the run
    still passes; a skipped REQUIRED binding is an error-severity notice
    and fails the run (the binding demanded enforcement)."""
    soft = ValidationEngine(
        RuleSet(rules=(RuleDefinition.parse(
            {"id": "E-S", "type": "Enum", "column": "status",
             "params": {"valueSet": "http://vs", "binding": "example"}}),)),
        config=EngineConfig(key_col="doc_id", group_col="source")
    ).validate(_df(spark))
    assert soft.passed()
    soft.unpersist()
    hard = ValidationEngine(
        RuleSet(rules=(RuleDefinition.parse(
            {"id": "E-H", "type": "Enum", "column": "status",
             "params": {"valueSet": "http://vs"}}),)),   # default required
        config=EngineConfig(key_col="doc_id", group_col="source")
    ).validate(_df(spark))
    assert not hard.passed()
    hard.unpersist()


def test_enum_without_values_or_valueset_still_raises(spark):
    with pytest.raises(RuleConfigurationError):
        _run(spark, {"id": "E-N", "type": "Enum", "column": "status",
                     "params": {}})


def test_skip_notice_honors_severity_overrides(spark):
    """round-4 review regressions: the skip lane goes THROUGH the
    governance-override machinery — a downgrade applies to the notice
    (with provenance), an invalid override severity still raises."""
    rule = RuleDefinition.parse(
        {"id": "E-VS", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs"}})    # required → error
    res = ValidationEngine(
        RuleSet(rules=(rule,)),
        config=EngineConfig(key_col="doc_id", group_col="source",
                            severity_overrides=(("E-VS", "warning"),))
    ).validate(_df(spark))
    rows = res.violations.collect()
    res.unpersist()
    assert len(rows) == 1
    assert rows[0]["severity"] == "warning"
    assert rows[0]["detail"]["downgradedFrom"] == "error"
    with pytest.raises(RuleConfigurationError):
        ValidationEngine(
            RuleSet(rules=(rule,)),
            config=EngineConfig(key_col="doc_id", group_col="source",
                                severity_overrides=(("E-VS", "bogus"),))
        ).validate(_df(spark))


def test_skip_lane_column_preflight(spark):
    """round-4 review regressions: a typo'd column on a skip-lane rule
    must fail compile like every other rule (total pre-flight)."""
    with pytest.raises(RuleConfigurationError):
        _run(spark, {"id": "E-T", "type": "Enum", "column": "no_such",
                     "params": {"valueSet": "http://vs"}})


def test_notice_binding_consistent_with_severity(spark):
    """round-4 review regressions: with no declared binding, the notice
    reports the strength consistent with its severity (an info notice
    claiming bindingStrength=required would contradict its own effect)."""
    out = _run(spark, {"id": "E-I", "type": "Enum", "column": "status",
                       "severity": "info",
                       "params": {"valueSet": "http://vs"}})
    assert out[0]["severity"] == "info"
    assert out[0]["detail"]["bindingStrength"] == "example"


def test_validate_stream_rejects_skip_lane(spark):
    """round-4 review regressions: a streaming projection cannot carry
    the static dataset-level notice — reject at compile, never drop."""
    from fhir_data_validation_spark.streaming.validate import \
        validate_stream
    stream = (spark.readStream.format("rate").load()
              .selectExpr("CAST(value AS STRING) AS doc_id",
                          "'web' AS source", "'x' AS status"))
    rs = RuleSet(rules=(RuleDefinition.parse(
        {"id": "E-VS", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs"}}),))
    with pytest.raises(RuleConfigurationError):
        validate_stream(stream, rs, EngineConfig(key_col="doc_id",
                                                 group_col="source"))


def test_review_blocks_unknown_binding():
    """round-4 review regressions: review must predict the compile-time
    rejection of an unknown binding strength."""
    from fhir_data_validation_spark.governance import BLOCKED, review_rule
    rule = RuleDefinition.parse(
        {"id": "E-X", "type": "Enum", "column": "status",
         "params": {"values": ["a"], "binding": "mandatory"}})
    result = review_rule(rule)
    assert result.status == BLOCKED
    assert any(i.code == "ENUM_INVALID_BINDING" for i in result.issues)


def test_governance_and_registry_cover_skip_lane():
    from fhir_data_validation_spark.governance import review_rule
    from fhir_data_validation_spark.plans import emitted_error_codes
    rule = RuleDefinition.parse(
        {"id": "E-VS", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs", "binding": "preferred"}})
    result = review_rule(rule)
    codes = {i.code for i in result.issues}
    assert "ENUM_VALUESET_UNRESOLVED" in codes
    assert "ALLOWED_VALUES_EMPTY" not in codes
    assert not any(i.severity == "BLOCKED" for i in result.issues)
    assert emitted_error_codes(rule) == ("ENUM_VALIDATION_SKIPPED",)
    # and the explanation surface reports the same
    from fhir_data_validation_spark import explain_rule
    exp = explain_rule(rule)
    assert exp["error_codes"] == ["ENUM_VALIDATION_SKIPPED"]
    assert any("not resolvable" in c for c in exp["checks"])
