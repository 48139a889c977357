"""Governance rule review (RuleReviewEngine.cs analog) and dataset lint
(LintValidationService.cs analog)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from fhir_data_validation_spark.governance import (APPROVED, BLOCKED, WARNING,
                                                   review_report, review_rule,
                                                   review_ruleset)
from fhir_data_validation_spark.lint import (lint_dataset, lint_report,
                                             referenced_columns)
from fhir_data_validation_spark.model import RuleDefinition, RuleSet

TOKEN_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("tokens", ArrayType(IntegerType())),
    StructField("n_tok", IntegerType()),
    StructField("source", StringType()),
])


def rule(**kw):
    kw.setdefault("id", "R-1")
    kw.setdefault("type", "Required")
    kw.setdefault("column", "doc_id")
    return RuleDefinition(**kw)


def codes(result):
    return {i.code for i in result.issues}


class TestReviewRule:
    def test_clean_rule_approved(self):
        r = review_rule(rule(), schema=TOKEN_SCHEMA)
        assert r.status == APPROVED and not r.issues

    def test_unknown_type_blocked(self):
        r = review_rule(rule(type="Frobnicate"))
        assert r.status == BLOCKED and codes(r) == {"UNKNOWN_RULE_TYPE"}

    def test_empty_column_blocked(self):
        r = review_rule(rule(column=None))
        assert "EMPTY_FIELD_PATH" in codes(r) and r.status == BLOCKED

    def test_column_free_types_pass_without_column(self):
        for t, params in [("CustomExpr", {}), ("Drift", {"baseline": "b"}),
                          ("RequiredResources",
                           {"requirements": [{"source": "s", "min": 1}]})]:
            r = review_rule(RuleDefinition(id="x", type=t, expr="n_tok > 0",
                                           params=params))
            assert "EMPTY_FIELD_PATH" not in codes(r), t

    def test_reference_sweep_counts_as_column(self):
        r = review_rule(rule(type="Reference", column=None,
                             params={"columns": ["doc_id"], "dim": "d"}))
        assert "EMPTY_FIELD_PATH" not in codes(r)

    def test_expectation_passes_without_column(self):
        # dataset-stat checks carry no column; review must not block a
        # ruleset the engine compiles and runs (regression: EMPTY_FIELD_PATH
        # blocked every Expectation rule)
        r = review_rule(rule(type="Expectation", column=None,
                             params={"checks": [{"metric": "row_count",
                                                 "min": 2}]}),
                        schema=TOKEN_SCHEMA)
        assert "EMPTY_FIELD_PATH" not in codes(r)

    def test_unique_composite_key_counts_as_column(self):
        r = review_rule(rule(type="Unique", column=None,
                             params={"columns": ["doc_id", "source"]}),
                        schema=TOKEN_SCHEMA)
        assert "EMPTY_FIELD_PATH" not in codes(r)
        # a Unique rule with NEITHER column NOR columns is still blocked
        r2 = review_rule(rule(type="Unique", column=None, params={}))
        assert "EMPTY_FIELD_PATH" in codes(r2)

    def test_review_blocks_what_compile_rejects(self):
        # pre-flight parity: shapes the engine raises on must not pass
        # review (a deploy gate approving them would fail at compile)
        r = review_rule(rule(type="Expectation", column=None, params={}))
        assert "EXPECTATION_MISSING_CHECKS" in codes(r) and r.status == BLOCKED
        r = review_rule(rule(type="Expectation", column=None,
                             params={"checks": []}))
        assert "EXPECTATION_MISSING_CHECKS" in codes(r)
        # a bare string is truthy but compile requires a non-empty list
        r = review_rule(rule(type="Unique", column=None,
                             params={"columns": "doc_id"}))
        assert "MALFORMED_COLUMNS_SWEEP" in codes(r) and r.status == BLOCKED
        r = review_rule(rule(type="Reference", column=None,
                             params={"columns": [], "dim": "d"}))
        assert "MALFORMED_COLUMNS_SWEEP" in codes(r)

    def test_codesystem_missing_params_blocked(self):
        r = review_rule(rule(type="CodeSystem", params={}))
        assert "CODESYSTEM_MISSING_PARAMS" in codes(r)
        issue = next(i for i in r.issues
                     if i.code == "CODESYSTEM_MISSING_PARAMS")
        assert set(issue.facts["missingParams"]) == {
            "dim", "systemColumn", "system"}

    def test_codesystem_manual_codes_warning(self):
        r = review_rule(rule(type="CodeSystem",
                             params={"dim": "d", "systemColumn": "s",
                                     "system": "urn:x", "codes": ["a"]}))
        assert r.status == WARNING
        assert "CODESYSTEM_MANUAL_CODES_PROVIDED" in codes(r)

    def test_codemaster_error_code_ignored_warning(self):
        r = review_rule(rule(
            type="CodeMaster", error_code="MY_CODE",
            params={"dim": "d", "keyColumn": "k", "dimKey": "dk",
                    "allowedColumn": "a"}))
        assert "CODEMASTER_ERROR_CODE_IGNORED" in codes(r)
        assert r.status == WARNING

    def test_regex_bad_pattern_blocked(self):
        r = review_rule(rule(type="Regex", params={"pattern": "[unclosed"}))
        assert "REGEX_INVALID_PATTERN" in codes(r)

    def test_range_min_above_max_blocked(self):
        r = review_rule(rule(type="Range", column="n_tok",
                             params={"min": 10, "max": 1}))
        assert "RANGE_MIN_ABOVE_MAX" in codes(r)

    def test_range_without_bounds_blocked(self):
        r = review_rule(rule(type="Range", column="n_tok", params={}))
        assert "RANGE_WITHOUT_BOUNDS" in codes(r)

    def test_allowed_values_empty_blocked(self):
        r = review_rule(rule(type="AllowedValues", params={"values": []}))
        assert "ALLOWED_VALUES_EMPTY" in codes(r)

    def test_fixed_value_without_value_blocked(self):
        r = review_rule(rule(type="FixedValue", params={}))
        assert "FIXED_VALUE_WITHOUT_CONSTRAINTS" in codes(r)

    def test_fixed_value_none_is_a_constraint(self):
        # explicit null is a legal fixed value (field must be null)
        r = review_rule(rule(type="FixedValue", params={"value": None}))
        assert "FIXED_VALUE_WITHOUT_CONSTRAINTS" not in codes(r)

    def test_schema_invalid_path_blocked(self):
        r = review_rule(rule(column="nope"), schema=TOKEN_SCHEMA)
        assert "INVALID_FIELD_PATH" in codes(r)

    def test_schema_pattern_on_non_string_blocked(self):
        r = review_rule(rule(type="Regex", column="n_tok",
                             params={"pattern": "x"}), schema=TOKEN_SCHEMA)
        assert "PATTERN_ON_NON_STRING" in codes(r)

    def test_schema_arraylength_on_non_array_blocked(self):
        r = review_rule(rule(type="ArrayLength", column="n_tok",
                             params={"min": 1}), schema=TOKEN_SCHEMA)
        assert "ARRAYLENGTH_ON_NON_ARRAY" in codes(r)

    def test_schema_arraylength_on_array_ok(self):
        r = review_rule(rule(type="ArrayLength", column="tokens",
                             params={"min": 1}), schema=TOKEN_SCHEMA)
        assert r.status == APPROVED

    def test_terminal_wildcard_warning(self):
        r = review_rule(rule(type="Required", column="tokens[*]"))
        assert "TERMINAL_WILDCARD_PATH" in codes(r)
        assert r.status == WARNING

    def test_requirements_validation(self):
        bad = rule(type="RequiredResources", column=None, params={
            "requirements": [
                {"source": "a", "min": 1},
                {"source": "a", "min": 2},          # duplicate source
                {"source": "b"},                     # missing min
                {"source": "c", "min": 0},           # min < 1
                {"source": "d", "min": 5, "max": 2},  # max < min
                {"source": "e", "min": 1, "max": 3},  # range mode → warning
                {"source": "f", "min": 1,
                 "where": [{"column": "x", "op": "regex", "value": "y"}]},
            ]})
        r = review_rule(bad)
        blocked = [i for i in r.issues if i.severity == BLOCKED]
        reasons = {i.facts.get("reason", "") for i in blocked}
        assert r.status == BLOCKED
        assert any("duplicate source" in x for x in reasons)
        assert any("must specify 'min'" in x for x in reasons)
        assert any("min must be >= 1" in x for x in reasons)
        assert any("unsatisfiable" in x for x in reasons)
        assert any("where op" in x for x in reasons)
        assert "REQUIRED_RESOURCES_RANGE_MODE" in codes(r)


class TestReviewRuleSet:
    def test_duplicate_rule_warning(self):
        rs = [rule(id="A"), rule(id="B")]
        results = {r.rule_id: r for r in review_ruleset(rs)}
        assert results["A"].status == APPROVED
        assert "DUPLICATE_RULE" in codes(results["B"])
        dup = next(i for i in results["B"].issues
                   if i.code == "DUPLICATE_RULE")
        assert dup.facts["duplicateOf"] == "A"

    def test_error_code_conflict_warning(self):
        rs = [rule(id="A", error_code="CODE_1"),
              rule(id="B", type="Regex", params={"pattern": "x"},
                   error_code="CODE_2")]
        results = {r.rule_id: r for r in review_ruleset(rs)}
        assert "FIELD_ERROR_CODE_CONFLICT" in codes(results["A"])
        assert "FIELD_ERROR_CODE_CONFLICT" in codes(results["B"])

    def test_no_conflict_when_codes_agree(self):
        rs = [rule(id="A", error_code="SAME"),
              rule(id="B", type="Regex", params={"pattern": "x"},
                   error_code="SAME")]
        results = {r.rule_id: r for r in review_ruleset(rs)}
        assert "FIELD_ERROR_CODE_CONFLICT" not in codes(results["A"])

    def test_multiple_required_resources_blocked(self):
        rr = {"requirements": [{"source": "s", "min": 1}]}
        rs = [rule(id="A", type="RequiredResources", column=None, params=rr),
              rule(id="B", type="RequiredResources", column=None,
                   params={"requirements": [{"source": "t", "min": 2}]})]
        results = {r.rule_id: r for r in review_ruleset(rs)}
        assert results["A"].status == APPROVED
        assert "DUPLICATE_BUNDLE_RESOURCE_RULE" in codes(results["B"])

    def test_accepts_ruleset_object_and_default_ruleset_clean(self):
        from fhir_data_validation_spark.rulesets import default_token_ruleset
        rs = default_token_ruleset()
        results = review_ruleset(rs, schema=TOKEN_SCHEMA)
        assert all(r.status == APPROVED for r in results), [
            (r.rule_id, r.issues) for r in results if r.status != APPROVED]

    def test_report_shape(self):
        rs = [rule(id="A"), rule(id="B", type="Regex",
                                 params={"pattern": "["})]
        rep = review_report(review_ruleset(rs))
        assert rep["ruleCount"] == 2
        assert rep["blocked"] == 1 and rep["approved"] == 1
        assert rep["canExport"] is False
        assert any(i["code"] == "REGEX_INVALID_PATTERN"
                   for i in rep["issues"])


class TestCli:
    def test_review_blocks_bad_ruleset(self, spark, tmp_path):
        import json

        from jobs.run_validation import main
        rules = {"version": "1", "rules": [
            {"id": "BAD-1", "type": "Regex", "column": "doc_id",
             "params": {"pattern": "["}}]}
        rules_path = tmp_path / "rules.json"
        rules_path.write_text(json.dumps(rules))
        rc = main(["--synth", "50", "--no-resume", "--review",
                   "--rules", str(rules_path),
                   "--output", str(tmp_path / "out")])
        assert rc == 2
        assert not (tmp_path / "out").exists()

    def test_review_passes_default_ruleset(self, spark, tmp_path):
        from jobs.run_validation import main
        rc = main(["--synth", "50", "--no-resume", "--review", "--lint",
                   "--output", str(tmp_path / "out")])
        # rc 1 = ran to completion with failed verdicts (dirty synth data);
        # only rc 2 would mean the review gate refused to run
        assert rc in (0, 1)
        assert (tmp_path / "out" / "verdicts").exists()

    def test_audit_details_clean_on_default_ruleset(self, spark, tmp_path):
        """--audit-details: the default rule set's violations all satisfy
        the frozen details contract, so the audit never flips the exit
        code (4 would mean the library's own lanes break the contract)."""
        from jobs.run_validation import main
        rc = main(["--synth", "50", "--no-resume", "--audit-details",
                   "--output", str(tmp_path / "out")])
        assert rc in (0, 1)


class TestLint:
    def test_referenced_columns_sweeps_params(self):
        rs = [rule(column="a[*].b"),
              rule(id="R2", type="CodeSystem",
                   params={"dim": "d", "systemColumn": "sys",
                           "system": "urn:x"}),
              rule(id="R3", type="Reference", column=None,
                   params={"columns": ["x", "y.z"], "dim": "d"})]
        # "doc_id" is R2's code column (the helper's default)
        assert referenced_columns(rs) == {"a", "doc_id", "sys", "x", "y"}

    def test_unknown_and_missing_and_type_findings(self, spark):
        df = spark.createDataFrame(
            [("d1", 1, "extra")], "doc_id string, n_tok int, surprise string")
        expected = StructType([
            StructField("doc_id", StringType()),
            StructField("n_tok", LongType()),       # df has int → widens
            StructField("tokens", ArrayType(IntegerType())),  # absent
            StructField("source", IntegerType()),   # absent, unreferenced
        ])
        rs = [rule(column="tokens")]
        findings = lint_dataset(df, rs, expected_schema=expected)
        by_code = {}
        for f_ in findings:
            by_code.setdefault(f_.code, []).append(f_)
        assert [f_.column for f_ in by_code["UNKNOWN_ELEMENT"]] == ["surprise"]
        missing = {f_.column: f_.severity
                   for f_ in by_code["MISSING_REQUIRED_FIELD"]}
        # rule-referenced absence is an error; unreferenced is a warning
        assert missing == {"tokens": "error", "source": "warning"}
        assert [f_.column for f_ in by_code["TYPE_WIDENS"]] == ["n_tok"]
        assert "TYPE_MISMATCH" not in by_code

    def test_type_mismatch_warning(self, spark):
        df = spark.createDataFrame([("d1",)], "n_tok string")
        expected = StructType([StructField("n_tok", IntegerType())])
        findings = lint_dataset(df, expected_schema=expected)
        assert [f_.code for f_ in findings] == ["TYPE_MISMATCH"]

    def test_scan_flags_all_null_and_constant(self, spark):
        df = spark.createDataFrame(
            [("d", None, "same"), ("e", None, "same")],
            "doc_id string, n_tok int, source string")
        rs = [rule(column="n_tok", id="R1"), rule(column="source", id="R2"),
              rule(column="doc_id", id="R3")]
        findings = lint_dataset(df, rs, scan=True)
        by_code = {f_.code: f_ for f_ in findings}
        assert by_code["ALL_NULL_COLUMN"].column == "n_tok"
        assert by_code["CONSTANT_COLUMN"].column == "source"
        # doc_id is distinct per row: no finding
        assert len(findings) == 2

    def test_lint_report_counts(self, spark):
        df = spark.createDataFrame([("d1",)], "n_tok string")
        expected = StructType([StructField("n_tok", IntegerType())])
        rep = lint_report(lint_dataset(df, expected_schema=expected))
        assert rep["findingCount"] == 1 and rep["warnings"] == 1
        assert rep["findings"][0]["code"] == "TYPE_MISMATCH"


def test_lint_covers_orderby_determinants_and_by(spark):
    """round-5 review regressions (batch 10): lint must flag the columns
    the compiler would reject — orderBy (Monotonic), determinants
    (FunctionalDependency) and by (DistinctBand) were missed, and an
    expected-schema + ruleset overlap double-counted the finding."""
    from pyspark.sql.types import StructType

    from fhir_data_validation_spark.lint import lint_dataset
    from fhir_data_validation_spark.model import RuleDefinition
    df = spark.createDataFrame([("d1", 1, "w")],
                               "doc_id string, v int, source string")
    rules = [
        RuleDefinition.parse({"id": "M", "type": "Monotonic",
                              "column": "v",
                              "params": {"keyColumn": "doc_id",
                                         "orderBy": "ts"}}),
        RuleDefinition.parse({"id": "F", "type": "FunctionalDependency",
                              "column": "v",
                              "params": {"determinants": ["det"]}}),
        RuleDefinition.parse({"id": "D", "type": "DistinctBand",
                              "column": "v",
                              "params": {"by": "region",
                                         "bands": {"x": {"min": 1}}}}),
    ]
    missing = {f.column for f in lint_dataset(df, rules)
               if f.code == "MISSING_REQUIRED_FIELD"}
    assert {"ts", "det", "region"} <= missing
    # overlap dedup: expected schema + rule both referencing a missing
    # column → ONE finding, not two
    exp = StructType.fromDDL("doc_id string, v int, source string, "
                             "ts timestamp")
    findings = lint_dataset(df, rules, expected_schema=exp)
    assert sum(1 for f in findings
               if f.code == "MISSING_REQUIRED_FIELD"
               and f.column == "ts") == 1
