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
    # round-5 (advice): skip-notice severity is CAPPED — only a required
    # binding reaches warning; extensible/preferred are info (:379)
    assert n["severity"] == "info"
    assert n["detail"]["bindingStrength"] == "extensible"
    assert "observation-status" in n["detail"]["valueSet"]
    # detail keys are exactly the reference's frozen schema
    assert validate_details(n["error_code"], n["detail"]) == []


def test_skip_notice_never_fails_run(spark):
    """round-5 review regressions (advice item 1): a skipped enum NEVER
    fails a run — the notice severity is capped at warning for a
    required binding (JsonNodeStructuralValidator.cs:379), info
    otherwise, while the binding's own severity applies only to actual
    INVALID_ENUM_VALUE rows."""
    hard = ValidationEngine(
        RuleSet(rules=(RuleDefinition.parse(
            {"id": "E-H", "type": "Enum", "column": "status",
             "params": {"valueSet": "http://vs",
                        "binding": "required"}}),)),
        config=EngineConfig(key_col="doc_id", group_col="source")
    ).validate(_df(spark))
    rows = hard.violations.collect()
    assert hard.passed()                 # warning, not error
    assert len(rows) == 1 and rows[0]["severity"] == "warning"
    assert rows[0]["detail"]["bindingStrength"] == "required"
    hard.unpersist()


def test_skip_notice_suppressed_for_missing_or_example_binding(spark):
    """round-5 review regressions (advice item 1): the reference emits
    NO skip notice when the binding is missing or 'example'
    (JsonNodeStructuralValidator.cs:366-369) — the run passes clean."""
    for params in ({"valueSet": "http://vs"},
                   {"valueSet": "http://vs", "binding": "example"}):
        res = ValidationEngine(
            RuleSet(rules=(RuleDefinition.parse(
                {"id": "E-S", "type": "Enum", "column": "status",
                 "params": params}),)),
            config=EngineConfig(key_col="doc_id", group_col="source")
        ).validate(_df(spark))
        assert res.passed()
        assert res.violations.count() == 0
        res.unpersist()
    # and the authoring registry agrees: nothing is emitted
    from fhir_data_validation_spark.plans import emitted_error_codes
    rule = RuleDefinition.parse(
        {"id": "E-S", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs", "binding": "example"}})
    assert emitted_error_codes(rule) == ()


def test_enum_without_values_or_valueset_still_raises(spark):
    with pytest.raises(RuleConfigurationError):
        _run(spark, {"id": "E-N", "type": "Enum", "column": "status",
                     "params": {}})


def test_skip_notice_honors_severity_overrides(spark):
    """round-4 review regressions (updated round 5): the skip lane goes
    THROUGH the governance-override machinery — an explicit override
    applies to the notice with provenance against the CAPPED severity
    (required caps at warning), and an invalid override still raises."""
    rule = RuleDefinition.parse(
        {"id": "E-VS", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs", "binding": "required"}})
    res = ValidationEngine(
        RuleSet(rules=(rule,)),
        config=EngineConfig(key_col="doc_id", group_col="source",
                            severity_overrides=(("E-VS", "info"),))
    ).validate(_df(spark))
    rows = res.violations.collect()
    res.unpersist()
    assert len(rows) == 1
    assert rows[0]["severity"] == "info"
    assert rows[0]["detail"]["downgradedFrom"] == "warning"
    with pytest.raises(RuleConfigurationError):
        ValidationEngine(
            RuleSet(rules=(rule,)),
            config=EngineConfig(key_col="doc_id", group_col="source",
                                severity_overrides=(("E-VS", "bogus"),))
        ).validate(_df(spark))


def test_skip_notice_override_cannot_raise_past_cap(spark):
    """round-5 review regressions (batch 2): an 'error' override on a
    skip notice would break the never-fails-a-run invariant and record
    an upgrade as downgradedFrom — overrides are downgrade-only on the
    notice, so the cap wins and no provenance is recorded."""
    rule = RuleDefinition.parse(
        {"id": "E-VS", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs", "binding": "required"}})
    res = ValidationEngine(
        RuleSet(rules=(rule,)),
        config=EngineConfig(key_col="doc_id", group_col="source",
                            severity_overrides=(("E-VS", "error"),))
    ).validate(_df(spark))
    rows = res.violations.collect()
    assert res.passed()
    res.unpersist()
    assert len(rows) == 1
    assert rows[0]["severity"] == "warning"          # capped, not raised
    assert "downgradedFrom" not in (rows[0]["detail"] or {})


def test_skip_lane_column_preflight(spark):
    """round-4 review regressions: a typo'd column on a skip-lane rule
    must fail compile like every other rule (total pre-flight) — even
    when the missing binding means no notice would be emitted."""
    with pytest.raises(RuleConfigurationError):
        _run(spark, {"id": "E-T", "type": "Enum", "column": "no_such",
                     "params": {"valueSet": "http://vs"}})


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
         "params": {"valueSet": "http://vs", "binding": "required"}}),))
    with pytest.raises(RuleConfigurationError):
        validate_stream(stream, rs, EngineConfig(key_col="doc_id",
                                                 group_col="source"))
    # a suppressed skip lane (no binding) emits nothing — the stream
    # compiles fine (round-5: suppression per the reference :366-369)
    rs_ok = RuleSet(rules=(RuleDefinition.parse(
        {"id": "E-VS", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs"}}),))
    q = validate_stream(stream, rs_ok, EngineConfig(key_col="doc_id",
                                                    group_col="source"))
    assert q is not None


def test_unknown_binding_consistent_across_authoring_surfaces():
    """round-5 review regressions (batch 4): a typo'd binding must look
    the same everywhere — emitted_error_codes raises the compiler's
    RuleConfigurationError (never describes an emission for an
    uncompilable rule), and governance review does not emit an
    ENUM_VALUESET_UNRESOLVED issue contradicting its own BLOCKED
    ENUM_INVALID_BINDING."""
    from fhir_data_validation_spark.governance import review_rule
    from fhir_data_validation_spark.plans import emitted_error_codes
    rule = RuleDefinition.parse(
        {"id": "E-T", "type": "Enum", "column": "status",
         "params": {"valueSet": "http://vs", "binding": "requird"}})
    with pytest.raises(RuleConfigurationError):
        emitted_error_codes(rule)
    result = review_rule(rule)
    codes = {i.code for i in result.issues}
    assert "ENUM_INVALID_BINDING" in codes
    assert "ENUM_VALUESET_UNRESOLVED" not in codes


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
