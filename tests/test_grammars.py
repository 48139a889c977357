"""Primitive-format grammar registry (T2): lexical fidelity against the
reference's validators (JsonNodeStructuralValidator.cs:84-97, 738-827,
1209-1286)."""

import pytest

from fhir_data_validation_spark import (RuleConfigurationError,
                                        ValidationEngine)
from fhir_data_validation_spark.grammars import (PRIMITIVE_GRAMMARS,
                                                 grammar_rule,
                                                 grammar_ruleset)

# (primitive, valid values, invalid values) — each invalid value must fire
CASES = [
    ("boolean", ["true", "false"], ["True", "yes", "1"]),
    # int32 like C# int.TryParse: 3_000_000_000 overflows and must fire
    ("integer", ["0", "-17", "42"], ["4.2", "x", "1e3", "3000000000"]),
    # decimal.TryParse rejects NaN/Infinity/exponent notation but trims
    # whitespace and accepts trailing points
    ("decimal", ["4.2", "-0.1", "7", ".5", "+3.25", "7.", " 4.2 "],
     ["x", "1,5", "NaN", "Infinity", "1e3", "."]),
    ("date", ["2024", "2024-01", "2024-01-31"], ["2024-1-3", "24-01-01",
                                                 "2024/01/01"]),
    ("dateTime", ["2024-01-31T10:00:00Z", "2024-01-31"], ["not a date"]),
    ("id", ["abc-123.X", "a" * 64], ["a" * 65, "with space", "uns@fe"]),
    ("string", ["hello world", ""], ["line\nbreak", "cr\rhere"]),
    ("code", ["active", "a-b.c"], ["two words", "tab\tsep"]),
    ("uri", ["urn:uuid:1234", "relative/path"], ["has space"]),
    ("url", ["https://x.org/a", "urn:x"], ["no-scheme-here", "ht tp://x"]),
    ("canonical", ["https://x.org/vs|1.0", "https://x.org/vs"],
     ["https://x.org/a|1|2", "https://x.org/a|"]),
]


@pytest.mark.parametrize("prim,good,bad", CASES,
                         ids=[c[0] for c in CASES])
def test_grammar_fidelity(spark, prim, good, bad):
    rows = [(f"g{i}", v, "web") for i, v in enumerate(good)]
    rows += [(f"b{i}", v, "web") for i, v in enumerate(bad)]
    df = spark.createDataFrame(rows, "doc_id string, v string, source string")
    from fhir_data_validation_spark.model import RuleSet
    rs = RuleSet(rules=(grammar_rule(prim, "v"),))
    res = ValidationEngine(rs).validate(df)
    fired = {r["doc_id"] for r in res.violations.collect()}
    assert fired == {f"b{i}" for i in range(len(bad))}, (prim, fired)


def test_grammar_ruleset_and_unknown_primitive():
    rs = grammar_ruleset({"doc_id": "id", "status": "code"})
    assert [r.type for r in rs.rules] == ["Regex", "Regex"]
    assert all(r.error_code == "INVALID_PRIMITIVE" for r in rs.rules)
    with pytest.raises(RuleConfigurationError):
        grammar_rule("wavelength", "c")
    assert len(PRIMITIVE_GRAMMARS) == 11


def test_trailing_newline_rejected_everywhere(spark):
    """Java's $ matches before a final newline — every grammar must use
    \\z so 'ABC\\n' style values are violations, not clean."""
    from fhir_data_validation_spark import EngineConfig, ValidationEngine
    from fhir_data_validation_spark.grammars import grammar_ruleset
    rows = [("d1", "abc\n", "web"), ("d2", "abc", "web"),
            ("d3", "line1\nline2", "web")]
    df = spark.createDataFrame(rows, "doc_id string, v string, source string")
    for prim in ("code", "id", "uri", "string"):
        res = ValidationEngine(
            grammar_ruleset({"v": prim}),
            config=EngineConfig(key_col="doc_id", group_col="source")
        ).validate(df)
        bad = {r["doc_id"] for r in res.violations.collect()}
        assert "d1" in bad, prim          # trailing \n must violate
        assert "d2" not in bad, prim
        assert "d3" in bad, prim          # embedded newline too
