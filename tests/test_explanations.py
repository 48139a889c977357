"""Structured explanations (ValidationExplanationService.cs:1-361 analog):
template-based, deterministic, confidence-scoped; every rule family
explained, pure driver-side (no Spark session in this module)."""

import pytest

from fhir_data_validation_spark.explanations import (explain_rule,
                                                     explain_ruleset,
                                                     explain_violation)
from fhir_data_validation_spark.model import RuleDefinition, RuleSet

RULES = [
    {"id": "E1", "type": "Required", "column": "req"},
    {"id": "E2", "type": "FixedValue", "column": "f",
     "params": {"value": "Y"}},
    {"id": "E3", "type": "AllowedValues", "column": "a",
     "params": {"values": ["x", "y"]}},
    {"id": "E3b", "type": "Enum", "column": "a",
     "params": {"values": ["x"]}},
    {"id": "E4", "type": "Regex", "column": "p",
     "params": {"pattern": "^[a-z]+$"}},
    {"id": "E5", "type": "ArrayLength", "column": "t",
     "params": {"min": 1, "max": 9}},
    {"id": "E6", "type": "Range", "column": "n",
     "params": {"min": 0, "max": 4}},
    {"id": "E7", "type": "CustomExpr", "expr": "n >= 0"},
    {"id": "E8", "type": "MaxLength", "column": "p",
     "params": {"maxLength": 4}},
    {"id": "E9", "type": "Precision", "column": "d",
     "params": {"precision": 3}},
    {"id": "E10", "type": "TypeCheck", "column": "p",
     "params": {"dataType": "int"}},
    {"id": "E11", "type": "TokenDomain", "column": "t",
     "params": {"min": 0, "maxExclusive": 100}},
    {"id": "E12", "type": "ValueExclusivity",
     "params": {"columns": ["a", "b"]}},
    {"id": "E13", "type": "Unique", "column": "doc_id"},
    {"id": "E14", "type": "Membership", "column": "a",
     "params": {"dim": "codes", "on": "code"}},
    {"id": "E15", "type": "Reference", "column": "r",
     "params": {"dim": "refs", "on": "key",
                "expectedTypes": ["Patient"]}},
    {"id": "E16", "type": "CodeSystem", "column": "c",
     "params": {"system": "http://loinc", "systemColumn": "sys",
                "dim": "cs", "on": "code", "dimSystemColumn": "s"}},
    {"id": "E17", "type": "CodeMaster", "column": "ans",
     "params": {"dim": "cm", "keyColumn": "q", "dimKey": "k",
                "allowedColumn": "allowed", "multiValueColumn": "m",
                "screeningColumn": "scr"}},
    {"id": "E18", "type": "RequiredResources",
     "params": {"requirements": [{"source": "web", "min": 1, "max": 5}]}},
    {"id": "E19", "type": "SequenceShape", "column": "t",
     "params": {"bos": 1, "eos": 2}},
    {"id": "E20", "type": "JsonPath", "column": "js",
     "params": {"path": "$.a", "required": True}},
    {"id": "E21", "type": "VectorCheck", "column": "emb",
     "params": {"dim": 8, "finite": True, "normMin": 0.5}},
    {"id": "E22", "type": "Expectation",
     "params": {"checks": [{"metric": "row_count", "min": 10}]}},
    {"id": "E23", "type": "Outlier", "column": "m",
     "params": {"method": "zscore", "k": 3.0}},
    {"id": "E24", "type": "AggConsistency", "column": "n",
     "params": {"dim": "child", "on": "id", "dimKey": "pid",
                "agg": "sum", "valueColumn": "amt", "tolerance": 0.01}},
    {"id": "E25", "type": "GroupShare", "column": "src",
     "params": {"shares": {"web": {"min": 0.1, "max": 0.5}}}},
    {"id": "E26", "type": "DistinctBand", "column": "a",
     "params": {"by": "src", "bands": {"web": {"min": 2}}}},
    {"id": "E27", "type": "Monotonic", "column": "n",
     "params": {"keyColumn": "src", "orderBy": "id", "maxStep": 5}},
    {"id": "E28", "type": "FunctionalDependency", "column": "a",
     "params": {"determinants": ["b"]}},
    {"id": "E29", "type": "HeavyHitters", "column": "a",
     "params": {"k": 8, "maxShare": 0.2}},
    {"id": "E30", "type": "Drift", "column": "n",
     "params": {"baseline": "b", "psiMax": 0.2, "ksAlpha": 0.01}},
]


@pytest.mark.parametrize("raw", RULES, ids=[r["id"] + "_" + r["type"]
                                            for r in RULES])
def test_every_family_explains(raw):
    exp = explain_rule(RuleDefinition.parse(raw))
    assert exp["rule_id"] == raw["id"]
    assert exp["rule_type"] == raw["type"]
    assert exp["summary"] and exp["how"]
    assert exp["checks"], raw["type"]
    # every check line is concrete prose, not a placeholder
    assert all(len(c) > 10 for c in exp["checks"])
    assert exp["confidence"] in ("high", "medium", "low")
    assert exp["error_codes"]
    assert exp["stage"] in ("STRUCTURE", "BUSINESS", "CONSTRAINT",
                            "REFERENCE", "DATASET", "DRIFT")
    assert exp["scale_notes"]


def test_param_values_appear_in_checks():
    exp = explain_rule(RuleDefinition.parse(RULES[2]))   # AllowedValues
    assert "x, y" in " ".join(exp["checks"])
    exp = explain_rule(RuleDefinition.parse(RULES[6]))   # Range
    assert any("≥ 0" in c for c in exp["checks"])
    assert any("≤ 4" in c for c in exp["checks"])
    exp = explain_rule(RuleDefinition.parse(RULES[17]))  # CodeMaster
    assert set(exp["error_codes"]) == {
        "UNKNOWN_SCREENING_TYPE", "MISSING_QUESTION_CODE",
        "INVALID_QUESTION_CODE", "INVALID_ANSWER_VALUE",
        "MULTIPLE_VALUES_NOT_ALLOWED"}


def test_error_codes_come_from_plan_registry():
    """round-4 review regressions: explain_rule must report the SAME code
    set the dataset-plan compiler declares — CodeSystem's pair, the
    conditional Reference type lane, CodeMaster's screening gating."""
    from fhir_data_validation_spark.plans import emitted_error_codes
    cs = explain_rule(RuleDefinition.parse(RULES[16]))   # CodeSystem
    assert set(cs["error_codes"]) == {"CODESYSTEM_MISMATCH",
                                      "CODE_NOT_IN_VALUESET"}
    ref = explain_rule(RuleDefinition.parse(RULES[15]))  # typed Reference
    assert "REFERENCE_TYPE_MISMATCH" in ref["error_codes"]
    bare_ref = explain_rule(RuleDefinition.parse(
        {"id": "B", "type": "Reference", "column": "r",
         "params": {"dim": "d", "on": "k"}}))
    assert bare_ref["error_codes"] == ["REFERENCE_NOT_FOUND"]
    # CodeMaster WITHOUT screeningColumn: no screening codes
    cm = explain_rule(RuleDefinition.parse(
        {"id": "C", "type": "CodeMaster", "column": "a",
         "params": {"dim": "d", "keyColumn": "q", "dimKey": "k",
                    "allowedColumn": "al", "multiValueColumn": "m"}}))
    assert "UNKNOWN_SCREENING_TYPE" not in cm["error_codes"]
    # and all of the above equal the plans-side function verbatim
    for raw in RULES:
        rule = RuleDefinition.parse(raw)
        assert explain_rule(rule)["error_codes"] == \
            list(emitted_error_codes(rule))


def test_unknown_rule_type_raises_configuration_error():
    """round-5 review regressions (advice item 3): explain_rule /
    emitted_error_codes on an unknown rule type must raise the same
    RuleConfigurationError every other authoring surface raises, never
    a bare KeyError."""
    from fhir_data_validation_spark import RuleConfigurationError
    from fhir_data_validation_spark.plans import emitted_error_codes
    rule = RuleDefinition.parse(
        {"id": "W", "type": "Wavelength", "column": "x", "params": {}})
    with pytest.raises(RuleConfigurationError):
        emitted_error_codes(rule)
    with pytest.raises(RuleConfigurationError):
        explain_rule(rule)


def test_explain_severity_matches_compiled_emission():
    """round-5 review regressions: the structured severity field reports
    what the COMPILED rule emits — binding-driven severity for enum
    violations, the capped notice severity for skip lanes, and None for
    a suppressed skip lane that emits nothing."""
    base = {"id": "E", "type": "Enum", "column": "status"}
    # values + binding: binding severity applies to INVALID_ENUM_VALUE
    exp = explain_rule(RuleDefinition.parse(
        {**base, "params": {"values": ["a"], "binding": "extensible"}}))
    assert exp["severity"] == "warning"
    # skip lane, required binding: capped at warning
    exp = explain_rule(RuleDefinition.parse(
        {**base, "params": {"valueSet": "http://vs",
                            "binding": "required"}}))
    assert exp["severity"] == "warning"
    assert exp["error_codes"] == ["ENUM_VALIDATION_SKIPPED"]
    # skip lane, preferred binding: info
    exp = explain_rule(RuleDefinition.parse(
        {**base, "params": {"valueSet": "http://vs",
                            "binding": "preferred"}}))
    assert exp["severity"] == "info"
    # suppressed skip lane: nothing is emitted
    exp = explain_rule(RuleDefinition.parse(
        {**base, "params": {"valueSet": "http://vs"}}))
    assert exp["error_codes"] == [] and exp["severity"] is None
    # a typo'd binding raises exactly like the compiler would — the
    # authoring surface never describes an emission for an
    # uncompilable rule (round-5 review batch 2)
    from fhir_data_validation_spark import RuleConfigurationError
    with pytest.raises(RuleConfigurationError):
        explain_rule(RuleDefinition.parse(
            {**base, "params": {"valueSet": "http://vs",
                                "binding": "requird"}}))


def test_confidence_tiers_match_reference():
    """Reference tiers (:155-360): spec-deterministic = high, regex/code
    system = medium, custom condition = low."""
    conf = {r["type"]: explain_rule(RuleDefinition.parse(r))["confidence"]
            for r in RULES}
    assert conf["Required"] == "high"
    assert conf["ArrayLength"] == "high"
    assert conf["Regex"] == "medium"
    assert conf["CodeSystem"] == "medium"
    assert conf["CustomExpr"] == "low"


def test_custom_explanation_wins_verbatim():
    """RuleExplanation override (:113-129): author-provided what/how used
    as-is with high confidence."""
    raw = {"id": "C", "type": "CustomExpr", "expr": "a > b",
           "params": {"explanation": {"what": "A must exceed B.",
                                      "how": "Raise A or lower B."}}}
    exp = explain_rule(RuleDefinition.parse(raw))
    assert exp["summary"] == "A must exceed B."
    assert exp["how"] == "Raise A or lower B."
    assert exp["confidence"] == "high"


def test_explain_ruleset_order():
    rs = RuleSet(rules=tuple(RuleDefinition.parse(r) for r in RULES[:3]))
    out = explain_ruleset(rs)
    assert [e["rule_id"] for e in out] == ["E1", "E2", "E3"]


def test_explain_violation_templates():
    ref = explain_violation("REFERENCE_NOT_FOUND", "ref",
                            {"value": "Patient/9"})
    assert "does not exist" in ref["what"]
    assert "'Patient/9'" in ref["how"]
    assert ref["confidence"] == "high"
    tm = explain_violation("REFERENCE_TYPE_MISMATCH", "ref",
                           {"expectedTypes": "[Patient]",
                            "actualType": "Group"})
    assert "Group" in tm["how"]
    drift = explain_violation("DISTRIBUTION_DRIFT", "n_tok",
                              {"psi": "0.8", "ks": "0.4"})
    assert "0.8" in drift["how"] and drift["confidence"] == "medium"
    # deterministic: no invented values when details absent
    bare = explain_violation("REFERENCE_NOT_FOUND", None, None)
    assert "'" not in bare["how"].replace("reference value", "")
    unk = explain_violation("SOMETHING_ELSE", "c", {"k": "v"})
    assert "SOMETHING_ELSE" in unk["what"]


def test_surface_exported():
    import fhir_data_validation_spark as pkg
    assert pkg.explain_rule is explain_rule
    assert callable(pkg.explain_violation)
