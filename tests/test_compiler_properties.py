"""Property-based compiler tests (hypothesis): arbitrary rule JSON either
compiles or raises RuleConfigurationError — never anything else, and never
reaches execution. The reference's pre-flight contract
(``FhirPathRuleEngine.cs:94-124``) as a fuzzed invariant."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fhir_data_validation_spark.compiler import (EngineConfig,
                                                 compile_ruleset)
from fhir_data_validation_spark.errors import RuleConfigurationError
from fhir_data_validation_spark.model import RuleSet

SCHEMA_COLS = ["doc_id", "tokens", "n_tok", "source"]

rule_types = st.sampled_from(
    ["Required", "FixedValue", "AllowedValues", "Enum", "Regex",
     "ArrayLength", "TokenDomain", "CustomExpr", "Range", "MaxLength",
     "Precision", "TypeCheck", "ValueExclusivity", "Unique", "Reference",
     "Membership", "CodeSystem", "CodeMaster", "RequiredResources",
     "Drift", "Bogus"])

param_values = st.one_of(
    st.none(), st.integers(-10, 10**6), st.text(max_size=8),
    st.lists(st.text(max_size=4), max_size=3),
    st.lists(st.integers(0, 100), max_size=3), st.booleans())

params = st.dictionaries(
    st.sampled_from(["value", "values", "pattern", "min", "max",
                     "maxExclusive", "maxLength", "precision", "dataType",
                     "columns", "dim", "on", "requirements", "baseline",
                     "keyColumn", "dimKey", "allowedColumn"]),
    param_values, max_size=4)

rules = st.fixed_dictionaries(
    {"id": st.text(min_size=1, max_size=6),
     "type": rule_types},
    optional={
        "column": st.sampled_from(SCHEMA_COLS + ["nope", "",
                                                 "tokens[*]", "tokens[*].x",
                                                 "n_tok[*]", "a[*].b[*]",
                                                 "source.x[*]"]),
        "expr": st.sampled_from(["n_tok > 0", "size(tokens) = n_tok",
                                 "this is )( not sql", ""]),
        "severity": st.sampled_from(["error", "warning", "info", "fatal"]),
        "scope": st.sampled_from([None, {"kind": "all"}, {"kind": "first"},
                                  {"kind": "filter",
                                   "condition": "n_tok > 5"},
                                  {"kind": "filter"},
                                  {"kind": "weird"}]),
        "params": params,
    })


@pytest.fixture(scope="module")
def schema(spark):
    from fhir_data_validation_spark.sources.synth import token_table
    return token_table(spark, 1).schema


@given(rule_dicts=st.lists(rules, max_size=4))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_compile_total(spark, schema, rule_dicts):
    """Compilation is total: valid plan or RuleConfigurationError."""
    try:
        ruleset = RuleSet.parse({"rules": rule_dicts})
        plan = compile_ruleset(ruleset, schema, EngineConfig(), {})
    except RuleConfigurationError:
        return
    # compiled plans carry exactly the accepted rules, ids preserved
    assert sorted(plan.rule_ids) == sorted(r["id"] for r in rule_dicts)


@given(pattern=st.text(max_size=12))
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_regex_rule_compile_total(spark, schema, pattern):
    """Arbitrary regex strings either compile or are rejected as config
    errors (``require_pattern`` pre-validates with ``re.compile``)."""
    try:
        plan = compile_ruleset(
            RuleSet.parse({"rules": [{"id": "R", "type": "Regex",
                                      "column": "doc_id",
                                      "params": {"pattern": pattern}}]}),
            schema, EngineConfig(), {})
        assert plan.rule_ids == ["R"]
    except RuleConfigurationError:
        pass


@given(arrays=st.lists(
    st.lists(st.one_of(st.none(), st.sampled_from(["a", "b", "c", "z", ""])),
             max_size=5),
    min_size=1, max_size=8))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_element_path_allowed_values_model(spark, arrays):
    """P5 element-lane AllowedValues agrees with a direct Python model:
    a row fires iff any element of a[*].v is null or outside the allowed
    set (null-aware on both the native and lambda lanes)."""
    from fhir_data_validation_spark import ValidationEngine
    allowed = {"a", "b"}
    rows = [(str(i), [{"v": v} for v in arr], "g")
            for i, arr in enumerate(arrays)]
    df = spark.createDataFrame(
        rows, "doc_id string, items array<struct<v:string>>, source string")
    rs = RuleSet.parse({"rules": [
        {"id": "P", "type": "AllowedValues", "column": "items[*].v",
         "params": {"values": sorted(allowed)}}]})
    res = ValidationEngine(rs).validate(df)
    got = {r["doc_id"] for r in res.violations.collect()}
    want = {str(i) for i, arr in enumerate(arrays)
            if arr and any(v is None or v not in allowed for v in arr)}
    assert got == want
