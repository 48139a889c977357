"""Extension grammar (T7) — the reference's
``FhirExtensionGrammarValidationTests.cs`` (683 LoC, 14 scenarios) ported
to tabular extension arrays: url presence per element, value[x] XOR
nested-extension shape, multiple-value[x] exclusivity."""

import pytest

from fhir_data_validation_spark import (EngineConfig, RuleConfigurationError,
                                        ValidationEngine, validate_details)
from fhir_data_validation_spark.grammars import extension_rules
from fhir_data_validation_spark.model import RuleSet

SCHEMA = ("doc_id string, source string, ext array<struct<"
          "url string, valueString string, valueCode string, "
          "extension array<struct<url string, valueString string>>>>")

V = ["valueString", "valueCode"]


def _run(spark, rows, rules=None):
    df = spark.createDataFrame(rows, SCHEMA)
    rs = RuleSet(rules=rules or extension_rules("ext", V))
    res = ValidationEngine(rs, config=EngineConfig(
        key_col="doc_id", group_col="source")).validate(df)
    out = res.violations.collect()
    res.unpersist()
    return out


# each scenario mirrors a test method of the reference battery
def _ext(url=None, vs=None, vc=None, nested=None):
    return (url, vs, vc, nested)


def test_valid_extension_shapes_are_clean(spark):
    """ValidExtension_UrlAndValueString / UrlAndNestedExtensions /
    MultipleIndependentExtensions / EmptyExtensionArray: no errors."""
    rows = [
        ("d1", "web", [_ext("http://example.org/ethnicity",
                            vs="Hispanic")]),
        ("d2", "web", [_ext("http://example.org/address",
                            nested=[("http://example.org/city", "Boston"),
                                    ("http://example.org/state", "MA")])]),
        ("d3", "web", [_ext("http://example.org/ethnicity", vs="Hispanic"),
                       _ext("http://example.org/race", vc="2106-3")]),
        ("d4", "web", []),                        # empty array
        ("d5", "web", None),                      # column absent entirely
    ]
    assert _run(spark, rows) == []


def test_missing_url_fires_per_element(spark):
    """InvalidExtension_MissingUrl / EmptyUrl: per-element indexed
    violations under FHIR_EXTENSION_MISSING_URL."""
    rows = [
        ("d1", "web", [_ext(None, vs="Hispanic")]),
        ("d2", "web", [_ext("", vs="Hispanic")]),
        ("d3", "web", [_ext("http://ok.org/a", vs="x"),
                       _ext(None, vs="no url")]),   # index 1 only
    ]
    out = [r for r in _run(spark, rows)
           if r["error_code"] == "FHIR_EXTENSION_MISSING_URL"]
    got = {(r["doc_id"], r["detail"].get("index")) for r in out}
    assert got == {("d1", "0"), ("d2", "0"), ("d3", "1")}
    for r in out:
        assert validate_details(r["error_code"], r["detail"]) == []


def test_shape_violations(spark):
    """InvalidExtension_UrlOnly (empty) and
    InvalidExtension_BothValueAndNestedExtensions (both)."""
    rows = [
        ("empty1", "web", [_ext("http://example.org/ethnicity")]),
        ("both1", "web", [_ext("http://example.org/address",
                               vs="123 Main St",
                               nested=[("http://example.org/city",
                                        "Boston")])]),
        ("ok1", "web", [_ext("http://example.org/a", vs="x")]),
    ]
    out = [r for r in _run(spark, rows)
           if r["error_code"] == "FHIR_EXTENSION_INVALID_SHAPE"]
    assert {r["doc_id"] for r in out} == {"empty1", "both1"}
    for r in out:
        assert validate_details(r["error_code"], r["detail"]) == []


def test_multiple_value_fields_fire_exclusivity(spark):
    """InvalidExtension_MultipleValueFields → value[x] exclusivity."""
    rows = [
        ("d1", "web", [_ext("http://example.org/test", vs="abc",
                            vc="also-set")]),
        ("d2", "web", [_ext("http://example.org/test", vs="only-one")]),
    ]
    out = [r for r in _run(spark, rows)
           if r["error_code"] == "VALUE_EXCLUSIVITY_VIOLATION"]
    assert {r["doc_id"] for r in out} == {"d1"}


def test_multiple_invalid_extensions_emit_multiple_errors(spark):
    """InvalidExtension_MultipleInvalidExtensions: one document carrying
    several broken extensions reports every lane."""
    rows = [("d1", "web", [
        _ext(None, vs="no url"),                        # missing url
        _ext("http://example.org/empty"),               # url only
        _ext("http://example.org/both", vs="test",
             nested=[("http://example.org/n", "x")]),   # both
    ])]
    out = _run(spark, rows)
    codes = {r["error_code"] for r in out}
    assert codes == {"FHIR_EXTENSION_MISSING_URL",
                     "FHIR_EXTENSION_INVALID_SHAPE"}


def test_valid_extension_does_not_suppress_other_errors(spark):
    """ValidExtension_DoesNotSuppressOtherErrors: an id-grammar failure
    on the same document still reports alongside extension findings."""
    from fhir_data_validation_spark.grammars import grammar_rule
    rows = [("invalid@id", "web",
             [_ext("http://example.org/empty")])]      # empty shape
    rules = extension_rules("ext", V) + (grammar_rule("id", "doc_id"),)
    out = _run(spark, rows, rules=rules)
    codes = {r["error_code"] for r in out}
    assert "FHIR_EXTENSION_INVALID_SHAPE" in codes
    assert "INVALID_PRIMITIVE" in codes


def test_nested_extension_missing_url(spark):
    """InvalidExtension_NestedExtensionMissingUrl: rules over the nested
    level compile against the inner array path."""
    rows = [("d1", "web", [_ext("http://example.org/address",
                                nested=[(None, "Boston")])])]
    rules = (extension_rules("ext", V)
             + extension_rules("ext[*].extension", ["valueString"],
                               rule_prefix="NEST", nested_field=None))
    # the nested lane needs the inner struct's fields only
    out = _run(spark, rows, rules=rules)
    nested = [r for r in out
              if r["rule_id"] == "NEST-URL"]
    assert nested, [r["rule_id"] for r in out]


def test_nested_level_shape_lanes_fire(spark):
    """round-4 review regressions: nested levels get REAL shape lanes
    (one forall per array depth), not just the url rule — a nested
    element with no value[x] must fire SHAPE (the reference validates
    recursively at every depth, ValidateExtensionGrammar)."""
    rows = [
        # nested element with a value → clean at the nested level
        ("ok", "web", [_ext("http://x/a",
                            nested=[("http://x/n", "val")])]),
        # nested element with NO value and nothing to nest → empty shape
        ("empty", "web", [_ext("http://x/a",
                               nested=[("http://x/n", None)])]),
    ]
    rules = extension_rules("ext[*].extension", ["valueString"],
                            rule_prefix="NEST", nested_field=None)
    assert len(rules) == 3          # url + shape + valuex, not url-only
    out = _run(spark, rows, rules=rules)
    shape = {r["doc_id"] for r in out
             if r["error_code"] == "FHIR_EXTENSION_INVALID_SHAPE"}
    assert shape == {"empty"}


def test_dotted_struct_path_resolves(spark):
    """round-4 review regressions: a dotted struct path (meta.ext) must
    quote per segment — one literal identifier crashed mid-validate with
    UNRESOLVED_COLUMN instead of resolving the nested struct."""
    schema = ("doc_id string, source string, meta struct<ext: array<"
              "struct<url string, valueString string, valueCode string, "
              "extension array<struct<url string, valueString string"
              ">>>>>")
    rows = [("d1", "web", ([("http://x/a", None, None, None)],)),  # empty
            ("d2", "web", ([("http://x/a", "v", None, None)],))]   # ok
    df = spark.createDataFrame(rows, schema)
    rs = RuleSet(rules=extension_rules("meta.ext", V))
    res = ValidationEngine(rs, config=EngineConfig(
        key_col="doc_id", group_col="source")).validate(df)
    out = res.violations.collect()
    res.unpersist()
    shape = {r["doc_id"] for r in out
             if r["error_code"] == "FHIR_EXTENSION_INVALID_SHAPE"}
    assert shape == {"d1"}


def test_governance_and_explanations_cover_extension_rules():
    from fhir_data_validation_spark import explain_rule, review_rule
    for rule in extension_rules("ext", V):
        assert not any(i.severity == "BLOCKED"
                       for i in review_rule(rule).issues), rule.id
        exp = explain_rule(rule)
        assert exp["summary"] and exp["error_codes"]


def test_forall_lanes_are_hof_chunked(spark):
    """round-4 review regressions: the forall shape/value[x] lanes are
    CodegenFallback — they must carry hof=True so the engine chunks them
    apart and co-compiled plain rules keep their whole-stage-codegen
    scan filter (same treatment as the VectorCheck norm lane)."""
    from fhir_data_validation_spark.compiler import compile_ruleset
    from fhir_data_validation_spark.model import RuleDefinition
    df = spark.createDataFrame([], SCHEMA)
    plain = RuleDefinition.parse(
        {"id": "PLAIN", "type": "CustomExpr", "expr": "doc_id IS NOT NULL"})
    rs = RuleSet(rules=extension_rules("ext", V) + (plain,))
    plan = compile_ruleset(rs, df.schema,
                           EngineConfig(key_col="doc_id",
                                        group_col="source"), {})
    hof_by_id = {p.rule.id: p.hof for p in plan.predicates}
    assert hof_by_id["EXT-SHAPE"] is True
    assert hof_by_id["EXT-VALUEX"] is True
    assert hof_by_id["PLAIN"] is False


def test_bad_inputs_raise():
    with pytest.raises(RuleConfigurationError):
        extension_rules("ext", [])
    with pytest.raises(RuleConfigurationError):
        extension_rules("ext", ["value`String"])
