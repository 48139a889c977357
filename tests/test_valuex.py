"""value[x] exclusivity (T5) — the reference's
``FhirValueXExclusivityValidationTests.cs`` (13 scenarios) ported to the
tabular ValueExclusivity rule: at most one of the value[x] columns may be
present per row; one violation per row regardless of how many collide;
other rules keep reporting alongside."""

from fhir_data_validation_spark import (EngineConfig, ValidationEngine,
                                        validate_details)
from fhir_data_validation_spark.model import RuleSet

SCHEMA = ("doc_id string, source string, valueString string, "
          "valueBoolean boolean, valueInteger int, status string")

RULE = {"id": "VX-1", "type": "ValueExclusivity",
        "params": {"columns": ["valueString", "valueBoolean",
                               "valueInteger"]}}


def _run(spark, rows, rules=(RULE,)):
    df = spark.createDataFrame(rows, SCHEMA)
    res = ValidationEngine(
        RuleSet.parse({"rules": list(rules)}),
        config=EngineConfig(key_col="doc_id", group_col="source")
    ).validate(df)
    out = res.violations.collect()
    res.unpersist()
    return out


def test_single_or_no_value_is_clean(spark):
    """ValidValueX_SingleValueString / SingleValueCodeableConcept /
    NoValueField / ValueWithOtherFields."""
    rows = [
        ("d1", "web", "final", None, None, "ok"),
        ("d2", "web", None, True, None, "ok"),
        ("d3", "web", None, None, None, "ok"),          # none present
        ("d4", "web", "x", None, None, "with-status"),  # other fields fine
    ]
    assert _run(spark, rows) == []


def test_two_and_three_values_emit_single_error_each(spark):
    """InvalidValueX_TwoValueFields / ThreeValueFields: exactly ONE
    violation per offending row (not one per colliding pair)."""
    rows = [
        ("two", "web", "str", True, None, "s"),
        ("three", "web", "str", True, 7, "s"),
        ("ok", "web", "only", None, None, "s"),
    ]
    out = _run(spark, rows)
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["doc_id"])] \
        == ["three", "two"]
    per_doc = {r["doc_id"]: r for r in out}
    assert per_doc["two"]["detail"]["presentCount"] == "2"
    assert per_doc["three"]["detail"]["presentCount"] == "3"
    for r in out:
        assert r["error_code"] == "VALUE_EXCLUSIVITY_VIOLATION"
        assert validate_details(r["error_code"], r["detail"]) == []


def test_does_not_suppress_other_errors(spark):
    """InvalidValueX_DoesNotSuppressOtherErrors: a Required failure on the
    same row reports alongside the exclusivity violation."""
    rows = [("d1", "web", "str", True, None, None)]   # status missing too
    req = {"id": "REQ-S", "type": "Required", "column": "status"}
    out = _run(spark, rows, rules=(RULE, req))
    codes = {r["error_code"] for r in out}
    assert codes == {"VALUE_EXCLUSIVITY_VIOLATION", "FIELD_REQUIRED"}


def test_per_row_independence(spark):
    """ValidValueX_MultipleBundleEntriesWithValues: different rows each
    carrying their own single value never cross-fire."""
    rows = [("a", "web", "x", None, None, "s"),
            ("b", "web", None, True, None, "s"),
            ("c", "app", None, None, 3, "s")]
    assert _run(spark, rows) == []
