"""Canonical details-schema contract per error code.

The reference freezes each error code's ``details`` key set and validates
every emitted error against it at runtime
(``Models/ValidationErrorDetailsValidator.cs:1-322``).  These tests drive
one firing rule per family and assert the emitted detail maps carry
exactly their canonical keys — plus the validator's own semantics
(optional details, unknown codes, missing/extra keys) and the
``governance.review`` BLOCKED lane for contract-less custom codes.
"""

import pytest

from fhir_data_validation_spark import EngineConfig, ValidationEngine
from fhir_data_validation_spark.details_contract import (DETAILS_CONTRACT,
                                                         contract_report,
                                                         validate_details)
from fhir_data_validation_spark.errors import ErrorCode
from fhir_data_validation_spark.model import RuleDefinition, RuleSet


@pytest.fixture(scope="module")
def base_df(spark):
    rows = [
        ("d1", "web", None, "X", "zz", "bad value!", [1, 2, 2, 9999],
         [0.1, float("nan")], 5, 123.456789, "Patient/999", "{bad json",
         3.0),
        ("d1", "web", "", "X", "zz", "bad", [1], [0.2, 0.3], -1, 1.0,
         "nope", '{"a": 1}', 4.0),
        ("d3", "app", "ok", "Y", "aa", "text", [1, 2], [0.5, 0.5], 2, 2.5,
         "urn:uuid:550e8400-e29b-41d4-a716-446655440000", '{"a": null}',
         100.0),
        # functional-dependency conflict: fixed=Y maps to both aa and qq
        ("d4", "app", "ok", "Y", "qq", "text", [1, 2], [0.5, 0.5], 3, 2.5,
         "Patient/123", '{"a": 2}', 5.0),
    ]
    schema = ("doc_id string, source string, req string, fixed string, "
              "allow string, pat string, tokens array<int>, "
              "emb array<double>, n_tok int, dec double, ref string, "
              "js string, metric double")
    return spark.createDataFrame(rows, schema)


# one firing rule per family; (raw rule, codes the battery must produce)
BATTERY = [
    ({"id": "R1", "type": "Required", "column": "req"},
     {ErrorCode.FIELD_REQUIRED}),
    ({"id": "R2", "type": "FixedValue", "column": "fixed",
      "params": {"value": "Y"}}, {ErrorCode.FIXED_VALUE_MISMATCH}),
    ({"id": "R3", "type": "AllowedValues", "column": "allow",
      "params": {"values": ["aa", "qq"]}}, {ErrorCode.VALUE_NOT_ALLOWED}),
    ({"id": "R3b", "type": "Enum", "column": "allow",
      "params": {"values": ["aa", "qq"]}}, {ErrorCode.INVALID_ENUM_VALUE}),
    ({"id": "R4", "type": "Regex", "column": "pat",
      "params": {"pattern": "^[a-z]+$"}}, {ErrorCode.PATTERN_MISMATCH}),
    ({"id": "R5", "type": "ArrayLength", "column": "tokens",
      "params": {"min": 2, "max": 3}},
     {ErrorCode.ARRAY_LENGTH_OUT_OF_RANGE}),
    ({"id": "R6", "type": "Range", "column": "n_tok",
      "params": {"min": 0, "max": 4}}, {ErrorCode.ANSWER_OUT_OF_RANGE}),
    ({"id": "R7", "type": "CustomExpr", "expr": "n_tok >= 0"},
     {ErrorCode.CUSTOM_CONDITION_FAILED}),
    ({"id": "R8", "type": "MaxLength", "column": "pat",
      "params": {"maxLength": 4}}, {ErrorCode.MAX_LENGTH_EXCEEDED}),
    ({"id": "R9", "type": "Precision", "column": "dec",
      "params": {"precision": 3}}, {ErrorCode.PRECISION_VIOLATION}),
    ({"id": "R10", "type": "TypeCheck", "column": "pat",
      "params": {"dataType": "int"}}, {ErrorCode.INVALID_PRIMITIVE}),
    ({"id": "R11", "type": "TokenDomain", "column": "tokens",
      "params": {"min": 0, "maxExclusive": 100}},
     {ErrorCode.VALUE_NOT_ALLOWED}),
    ({"id": "R12", "type": "ValueExclusivity",
      "params": {"columns": ["req", "fixed"]}},
     {ErrorCode.VALUE_EXCLUSIVITY_VIOLATION}),
    ({"id": "R13", "type": "Unique", "column": "doc_id"},
     {ErrorCode.DUPLICATE_KEY}),
    ({"id": "R14", "type": "Membership", "column": "allow",
      "params": {"dim": "codes", "on": "code"}},
     {ErrorCode.CODE_NOT_IN_VALUESET}),
    ({"id": "R16", "type": "RequiredResources",
      "params": {"requirements": [{"source": "ghost", "min": 1}]}},
     {ErrorCode.RESOURCE_REQUIREMENT_VIOLATION}),
    ({"id": "R17", "type": "SequenceShape", "column": "tokens",
      "params": {"bos": 7}}, {ErrorCode.SEQUENCE_SHAPE_VIOLATION}),
    ({"id": "R18", "type": "JsonPath", "column": "js",
      "params": {"path": "$.a", "required": True}},
     {ErrorCode.JSON_PATH_VIOLATION}),
    ({"id": "R19", "type": "VectorCheck", "column": "emb",
      "params": {"dim": 2, "finite": True}},
     {ErrorCode.VECTOR_CHECK_FAILED}),
    ({"id": "R20", "type": "Monotonic", "column": "n_tok",
      "params": {"keyColumn": "source", "orderBy": "doc_id"}},
     {ErrorCode.MONOTONICITY_VIOLATION}),
    ({"id": "R21", "type": "Outlier", "column": "metric",
      "params": {"method": "zscore", "k": 0.5}},
     {ErrorCode.OUTLIER_VALUE}),
    ({"id": "R22", "type": "Expectation",
      "params": {"checks": [{"metric": "row_count", "min": 100}]}},
     {ErrorCode.EXPECTATION_VIOLATION}),
    ({"id": "R23", "type": "GroupShare", "column": "allow",
      "params": {"shares": {"zz": {"max": 0.1}}}},
     {ErrorCode.GROUP_SHARE_VIOLATION}),
    ({"id": "R24", "type": "DistinctBand", "column": "allow",
      "params": {"by": "source", "bands": {"web": {"min": 5}}}},
     {ErrorCode.DISTINCT_BAND_VIOLATION}),
    ({"id": "R25", "type": "FunctionalDependency", "column": "allow",
      "params": {"determinants": ["fixed"]}},
     {ErrorCode.FUNCTIONAL_DEPENDENCY_VIOLATION}),
    ({"id": "R26", "type": "HeavyHitters", "column": "allow",
      "params": {"k": 4, "maxShare": 0.1}},
     {ErrorCode.HEAVY_HITTER_VIOLATION}),
    ({"id": "R27", "type": "AggConsistency", "column": "n_tok",
      "params": {"dim": "child", "on": "doc_id", "dimKey": "pkey",
                 "agg": "sum", "valueColumn": "amt",
                 "tolerance": 0.01}},
     {ErrorCode.AGGREGATE_MISMATCH}),
    ({"id": "R28", "type": "Reference", "column": "ref",
      "params": {"dim": "refs", "on": "key"}},
     {ErrorCode.REFERENCE_NOT_FOUND}),
    ({"id": "R29", "type": "Reference", "column": "ref",
      "params": {"dim": "refs", "on": "key", "typeColumn": "target_type",
                 "expectedTypes": ["Patient"]}},
     {ErrorCode.REFERENCE_TYPE_MISMATCH}),
    ({"id": "R30", "type": "CodeSystem", "column": "allow",
      "params": {"system": "http://loinc", "systemColumn": "fixed",
                 "dim": "codes2", "on": "code", "dimSystemColumn": "sys"}},
     {ErrorCode.CODESYSTEM_MISMATCH}),
]


def _dims(spark):
    return {
        "codes": spark.createDataFrame([("aa", "s")],
                                       "code string, system string"),
        "codes2": spark.createDataFrame([("aa", "http://other"),
                                         ("zz", "http://other")],
                                        "code string, sys string"),
        "refs": spark.createDataFrame([("Patient/123", "Group")],
                                      "key string, target_type string"),
        # child rollup for AggConsistency: d3's children sum to 99 but
        # the parent row carries n_tok=2 — the mismatch lane must fire
        "child": spark.createDataFrame([("d3", 99.0)],
                                       "pkey string, amt double"),
    }


@pytest.mark.parametrize("raw,codes", BATTERY,
                         ids=[r[0]["id"] + "_" + r[0]["type"]
                              for r in BATTERY])
def test_family_details_match_contract(spark, base_df, raw, codes):
    rs = RuleSet(rules=(RuleDefinition.parse(raw),))
    res = ValidationEngine(rs, dims=_dims(spark),
                           config=EngineConfig(key_col="doc_id",
                                               group_col="source")
                           ).validate(base_df)
    rows = res.violations.collect()
    res.unpersist()
    got_codes = {r["error_code"] for r in rows}
    assert codes <= got_codes, (raw["id"], got_codes)
    for r in rows:
        problems = validate_details(r["error_code"], r["detail"])
        assert not problems, (raw["id"], r["error_code"],
                              sorted((r["detail"] or {}).keys()), problems)


def test_required_on_array_element_path_details(spark):
    """round-5 review regressions (advice item 2): a plain Required rule
    on an array element path ('a[*].b') emits the array-summary detail
    {badCount, examples}, and perElement adds index/value — BOTH shapes
    must pass the frozen FIELD_REQUIRED contract (the summary keys were
    missing from the contract, so a fully valid run exited 4 under
    --audit-details and dropped the WAP branch)."""
    from fhir_data_validation_spark.model import RuleSet as _RS
    df = spark.createDataFrame(
        [("d1", "web", [("x",), (None,)]), ("d2", "web", [(None,)])],
        "doc_id string, source string, a array<struct<b:string>>")
    for params in ({}, {"perElement": True}):
        rs = _RS(rules=(RuleDefinition.parse(
            {"id": "RQ-E", "type": "Required", "column": "a[*].b",
             "params": params}),))
        res = ValidationEngine(rs, config=EngineConfig(
            key_col="doc_id", group_col="source")).validate(df)
        rows = res.violations.collect()
        res.unpersist()
        assert rows, params
        for r in rows:
            assert r["error_code"] == ErrorCode.FIELD_REQUIRED
            problems = validate_details(r["error_code"], r["detail"])
            assert not problems, \
                (params, sorted((r["detail"] or {}).keys()), problems)


def test_codemaster_screening_details(spark):
    """All five CodeMaster outcome codes fire and carry contract-compliant
    details (CodeMasterEngine two-level dispatch), incl. the multi-value
    lane over an array answer to a multi=False question."""
    df = spark.createDataFrame(
        [("d1", "bp", "sys", ["high"], "web"),
         ("d2", "bp", "dia", ["purple"], "web"),
         ("d3", "xx", "sys", ["high"], "web"),
         ("d4", "bp", None, ["high"], "web"),
         ("d6", "bp", "zz", ["high"], "web"),
         ("d7", "bp", "dia", ["high", "low"], "web")],   # multi on single
        "doc_id string, screening string, q string, "
        "answer array<string>, source string")
    dim = spark.createDataFrame(
        [("bp", "sys", ["high", "low"], True),
         ("bp", "dia", ["high", "low"], False)],
        "scr string, q string, allowed array<string>, multi boolean")
    rs = RuleSet(rules=(RuleDefinition.parse(
        {"id": "CM", "type": "CodeMaster", "column": "answer",
         "params": {"dim": "cm", "keyColumn": "q", "dimKey": "q",
                    "allowedColumn": "allowed",
                    "multiValueColumn": "multi",
                    "screeningColumn": "screening",
                    "dimScreening": "scr"}}),))
    res = ValidationEngine(rs, dims={"cm": dim},
                           config=EngineConfig(key_col="doc_id",
                                               group_col="source")
                           ).validate(df)
    rows = res.violations.collect()
    res.unpersist()
    got = {r["error_code"] for r in rows}
    assert {"INVALID_ANSWER_VALUE", "UNKNOWN_SCREENING_TYPE",
            "MISSING_QUESTION_CODE", "INVALID_QUESTION_CODE",
            "MULTIPLE_VALUES_NOT_ALLOWED"} <= got
    for r in rows:
        problems = validate_details(r["error_code"], r["detail"])
        assert not problems, (r["error_code"],
                              sorted((r["detail"] or {}).keys()), problems)


def test_grammar_rules_details_match_contract(spark):
    """round-4 review regressions: grammar rules override errorCode to
    INVALID_PRIMITIVE while compiling to Regex / CustomExpr lanes — the
    contract must accept their {pattern,...} / {expression} detail shapes
    (the date calendar lane shipped emitting {expression} against a
    contract that only knew {dataType})."""
    from fhir_data_validation_spark.grammars import grammar_rule
    rows = [("g1", "ok-code", "web"), ("b1", "two words", "web"),
            ("b2", "2024-02-30", "web")]
    df = spark.createDataFrame(rows, "doc_id string, v string, source string")
    for prim in ("code", "date", "id", "boolean"):
        rs = RuleSet(rules=(grammar_rule(prim, "v"),))
        res = ValidationEngine(rs, config=EngineConfig(
            key_col="doc_id", group_col="source")).validate(df)
        rows_out = res.violations.collect()
        res.unpersist()
        assert rows_out, prim          # something must fire per primitive
        for r in rows_out:
            problems = validate_details(r["error_code"], r["detail"])
            assert not problems, (prim, sorted((r["detail"] or {}).keys()),
                                  problems)


def test_drift_details_match_contract(spark):
    from fhir_data_validation_spark.sources.synth import (stats_baseline,
                                                          token_table)
    clean = token_table(spark, 5000, seed=42)
    base = stats_baseline(clean, "n_tok", 512)
    other = token_table(spark, 5000, seed=43)
    shifted = other.withColumn("n_tok", other["n_tok"] * 3)
    rs = RuleSet(rules=(RuleDefinition.parse(
        {"id": "DRF", "type": "Drift", "column": "n_tok",
         "params": {"baseline": "b", "psiMax": 0.05,
                    "ksAlpha": 0.05, "bucketWidth": 512}}),))
    res = ValidationEngine(rs, dims={"b": base}).validate(shifted)
    rows = res.violations.collect()
    res.unpersist()
    assert rows and all(r["error_code"] == ErrorCode.DISTRIBUTION_DRIFT
                        for r in rows)
    for r in rows:
        assert not validate_details(r["error_code"], r["detail"]), (
            sorted(r["detail"].keys()))


def test_battery_covers_contract():
    """Every code the engine can emit from compiled rules has BOTH a
    contract entry and a firing exercise above — so the contract cannot
    silently rot as families are added."""
    exercised = set().union(*(codes for _, codes in BATTERY)) | {
        "INVALID_ANSWER_VALUE", "UNKNOWN_SCREENING_TYPE",
        "MISSING_QUESTION_CODE", "INVALID_QUESTION_CODE",
        ErrorCode.MULTIPLE_VALUES_NOT_ALLOWED,
        ErrorCode.DISTRIBUTION_DRIFT}
    assert exercised <= set(DETAILS_CONTRACT)
    assert len(exercised) >= 29
    # declared-but-unemitted codes documented by their absence here:
    dormant = set(DETAILS_CONTRACT) - exercised
    # ANSWER_* fire in test_questions.py, FHIR_EXTENSION_* in
    # test_extensions.py, ENUM_VALIDATION_SKIPPED in
    # test_enum_binding.py (all contract-checked there)
    assert dormant <= {ErrorCode.ARRAY_LENGTH_VIOLATION,
                       ErrorCode.UNEXPECTED_RESOURCE,
                       ErrorCode.ENUM_VALIDATION_SKIPPED,
                       "ANSWER_REQUIRED", "INVALID_ANSWER_TYPE",
                       "ANSWER_NOT_IN_VALUESET",
                       "FHIR_EXTENSION_MISSING_URL",
                       "FHIR_EXTENSION_INVALID_SHAPE"}, dormant


def test_validate_details_semantics():
    # details optional (ValidationErrorDetailsValidator.cs:47-49)
    assert validate_details(ErrorCode.PATTERN_MISMATCH, None) == []
    assert validate_details(ErrorCode.PATTERN_MISMATCH, {}) == []
    # unknown code → single note, not a crash (:104-108)
    notes = validate_details("TOTALLY_NEW", {"x": "1"})
    assert len(notes) == 1 and "unknown errorCode" in notes[0]
    # missing required key
    assert validate_details(ErrorCode.PATTERN_MISMATCH, {"actual": "x"})
    # extra undeclared key
    assert validate_details(ErrorCode.PATTERN_MISMATCH,
                            {"pattern": "p", "bogus": "1"})
    # compliant
    assert validate_details(ErrorCode.PATTERN_MISMATCH,
                            {"pattern": "p", "actual": "x"}) == []
    # variant dispatch: TokenDomain's numeric-domain VALUE_NOT_ALLOWED
    assert validate_details(ErrorCode.VALUE_NOT_ALLOWED,
                            {"min": "0", "maxExclusive": "100",
                             "badCount": "2", "examples": "[9999]"}) == []


def test_contract_report_reduced(spark, base_df):
    rs = RuleSet(rules=(RuleDefinition.parse(
        {"id": "R4", "type": "Regex", "column": "pat",
         "params": {"pattern": "^[a-z]+$"}}),))
    res = ValidationEngine(rs, config=EngineConfig(
        key_col="doc_id", group_col="source")).validate(base_df)
    assert contract_report(res.violations) == []
    res.unpersist()


def test_contract_report_unknown_code_flag_and_truncation(spark,
                                                          monkeypatch):
    """round-4 review regressions: unknown codes are flagged (callers
    warn, never fail — reference semantics) and an over-cap combo count
    surfaces a <truncated> sentinel instead of silently passing."""
    import fhir_data_validation_spark.details_contract as dc
    rows = [("d1", "MYSTERY_CODE", {"a": "1"}),
            ("d2", "MYSTERY_CODE", {"b": "1"}),
            ("d3", "MYSTERY_CODE", {"c": "1"})]
    df = spark.createDataFrame(
        rows, "doc_id string, error_code string, detail map<string,string>")
    rep = dc.contract_report(df)
    assert len(rep) == 3 and all(b["unknown_code"] for b in rep)
    monkeypatch.setattr(dc, "_COMBO_CAP", 2)
    rep2 = dc.contract_report(df)
    assert rep2[0]["error_code"] == "<truncated>"
    assert not rep2[0]["unknown_code"]


def test_cli_audit_warns_not_fails_on_custom_code(spark, tmp_path):
    """round-4 review regressions: --audit-details must not flip the exit
    code over a user ruleset's contract-less custom errorCode (the
    reference warns and skips unknown codes)."""
    import json

    from jobs.run_validation import main
    rules = {"version": "1", "rules": [
        {"id": "ORG-1", "type": "CustomExpr", "expr": "n_tok >= 0",
         "errorCode": "ORG_SPECIFIC_CODE"}]}
    rules_path = tmp_path / "rules.json"
    rules_path.write_text(json.dumps(rules))
    rc = main(["--synth", "50", "--no-resume", "--audit-details",
               "--rules", str(rules_path),
               "--output", str(tmp_path / "out")])
    assert rc in (0, 1), rc        # 4 would mean the warning failed the run


def test_governance_blocks_contract_less_custom_code():
    from fhir_data_validation_spark.governance import BLOCKED, review_rule
    rule = RuleDefinition.parse(
        {"id": "X", "type": "Regex", "column": "c",
         "params": {"pattern": "^a$"}, "errorCode": "MY_SPECIAL_CODE"})
    result = review_rule(rule)
    assert result.status == BLOCKED
    assert any(i.code == "CUSTOM_ERROR_CODE_NO_CONTRACT"
               for i in result.issues)
    # an override to a CONTRACTED code stays approved
    ok = RuleDefinition.parse(
        {"id": "Y", "type": "Regex", "column": "c",
         "params": {"pattern": "^a$"},
         "errorCode": ErrorCode.INVALID_PRIMITIVE})
    assert not any(i.code == "CUSTOM_ERROR_CODE_NO_CONTRACT"
                   for i in review_rule(ok).issues)


def test_governance_accepts_unicode_class_patterns():
    """The grammar registry's \\p{Z}/\\p{Cc} patterns must review clean
    (the Python-re probe translates them, same as model.require_pattern)."""
    from fhir_data_validation_spark.governance import review_rule
    from fhir_data_validation_spark.grammars import grammar_rule
    for prim in ("code", "uri", "url", "canonical", "reference"):
        result = review_rule(grammar_rule(prim, "v"))
        assert not any(i.code == "REGEX_INVALID_PATTERN"
                       for i in result.issues), prim
