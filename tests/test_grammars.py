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
    assert len(PRIMITIVE_GRAMMARS) == 12


# ---------------------------------------------------------------------------
# The reference's grammar batteries, ported as value vectors.  Each entry is
# (value, expect_violation); vectors come verbatim from the xUnit InlineData /
# test bodies of the cited file.  Empty strings are EXCLUDED where the
# reference rejects them (code/uri/url/canonical/reference): presence is a
# separate Required rule under the engine-wide skip-empty contract
# (grammars.py module docstring).
REFERENCE_BATTERY = {
    # FhirIdGrammarValidationTests.cs:45-96
    "id": [
        ("abc123", False), ("ABC123", False), ("a1b2c3", False),
        ("test-id", False), ("test.id", False), ("test-id.123", False),
        ("a", False), ("1234567890" * 6 + "1234", False),      # 64 chars
        ("abc def", True), ("abc@123", True), ("abc#123", True),
        ("abc$123", True), ("abc%123", True), ("abc&123", True),
        ("abc*123", True), ("abc(123", True), ("abc)123", True),
        ("abc/123", True), ("abc\\123", True),
        ("1234567890" * 6 + "12345", True),                    # 65 chars
        ("invalid id with spaces", True), ("invalid@id", True),
        ("valid-id-123", False),
    ],
    # FhirCodeGrammarValidationTests.cs:40-48 (valid Theory) + the
    # whitespace/control Facts at :80-330
    "code": [
        ("final", False), ("in-progress", False),
        ("entered-in-error", False), ("ABC_123", False),
        ("unknown", False), ("preliminary", False), ("amended", False),
        ("corrected", False), ("unknown-status", False),
        ("in progress", True), (" final", True), ("final ", True),
        ("in\tprogress", True), ("in\nprogress", True),
        ("bad\u0001code", True),                 # control char :259
        ("bad\u007fcode", True),                 # DEL :296
        ("bad\u0085nel", True),           # NEL is Cc - C# IsControl
        ("a\u00a0b", True),               # NBSP is Zs - IsWhiteSpace
        ("in valid", True),
    ],
    # FhirStringMarkdownGrammarValidationTests.cs — string forbids \n/\r,
    # tabs and spaces fine (markdown is deliberately unvalidated, like the
    # reference's registry which has no markdown validator)
    "string": [
        ("John Doe", False), ("John  \t  Doe", False),
        ("Line 1\nLine 2", True), ("Line 1\r\nLine 2", True),
        ("Line 1\nLine 2\nLine 3\nLine 4", True),
        ("Line 1\rLine 2", True), ("Invalid\nString", True),
    ],
    # FhirUriUrlCanonicalGrammarValidationTests.cs:41-220
    "uri": [
        ("Patient/123", False),
        ("urn:uuid:550e8400-e29b-41d4-a716-446655440000", False),
        ("https://example.org/fhir/Patient/123", False),
        ("abc def", True), ("xyz   123", True),
        ("http://example.org\u0000/path", True),  # control char :190
    ],
    # :223-374
    "url": [
        ("https://example.org/fhir/Questionnaire/123", False),
        ("http://example.org/fhir/Questionnaire/123", False),
        ("Patient/123", True),
        ("https://example.org/path with spaces", True),
        ("relative/path", True),
    ],
    # :376-527
    "canonical": [
        ("https://example.org/StructureDefinition/foo", False),
        ("https://example.org/StructureDefinition/foo|1.0.0", False),
        ("Patient/foo", True),
        ("https://example.org/foo|", True),       # empty version suffix
        ("relative/path", True),
    ],
    # FhirReferenceGrammarValidationTests.cs:36-500 (Reference.reference
    # format vectors; the reference-vs-identifier combination rule is the
    # separate ValueExclusivity lane)
    "reference": [
        ("Patient/123", False), ("Practitioner/456", False),
        ("Practitioner/123", False),
        ("urn:uuid:550e8400-e29b-41d4-a716-446655440000", False),
        ("https://example.org/fhir/Patient/123", False),
        ("abc", True), ("patient/123", True),      # lowercase type
        ("Patient", True),                         # missing id
        ("Patient / 123", True),                   # embedded whitespace
        ("urn:uuid:not-a-valid-uuid", True),
        ("invalid-ref", True), ("invalid", True),
    ],
    # JsonNodeStructuralValidator.cs:744-761 — full dates calendar-checked
    # via DateTime.TryParse, partials shape-only (so 2024-13 passes)
    "date": [
        ("2024", False), ("2024-01", False), ("2024-01-31", False),
        ("2024-02-29", False),                     # leap year
        ("2024-13", False),                        # partial: shape-only
        ("2024-02-30", True), ("2023-02-29", True),
        ("2024-13-01", True), ("not-a-date", True),
        ("2024-1-3", True), ("24-01-01", True), ("2024/01/01", True),
        # round-4 review regressions: the RLIKE must use \z — Java's $
        # matches before a final newline, and try_cast trims it
        ("2024\n", True), ("2024-01-31\n", True),
    ],
    # PrimitiveValidators registry :86-88
    "boolean": [
        ("true", False), ("false", False), ("True", True), ("yes", True),
        ("1", True),
    ],
    "integer": [
        ("0", False), ("-17", False), ("42", False),
        ("4.2", True), ("x", True), ("1e3", True),
        ("3000000000", True),                      # overflows int32
    ],
    "decimal": [
        ("4.2", False), ("-0.1", False), ("7", False), (".5", False),
        ("+3.25", False), ("7.", False), (" 4.2 ", False),
        ("x", True), ("NaN", True), ("Infinity", True), ("1e3", True),
        (".", True),
    ],
}


@pytest.mark.parametrize("prim", sorted(REFERENCE_BATTERY),
                         ids=sorted(REFERENCE_BATTERY))
def test_reference_battery(spark, prim):
    """Every ported value vector judged in one engine pass per primitive."""
    vec = REFERENCE_BATTERY[prim]
    rows = [(f"v{i}", v, "web") for i, (v, _) in enumerate(vec)]
    df = spark.createDataFrame(rows, "doc_id string, v string, source string")
    from fhir_data_validation_spark.model import RuleSet
    res = ValidationEngine(
        RuleSet(rules=(grammar_rule(prim, "v"),))).validate(df)
    fired = {r["doc_id"] for r in res.violations.collect()}
    expect = {f"v{i}" for i, (_, bad) in enumerate(vec) if bad}
    assert fired == expect, (
        prim,
        {f"v{i}": vec[i][0] for i in range(len(vec))
         if (f"v{i}" in fired) != (f"v{i}" in expect)})


def test_reference_battery_size():
    """The ported battery must stay at least as large as the reference's
    grammar coverage mandate (>=100 value cases across the primitives)."""
    n = sum(len(v) for v in REFERENCE_BATTERY.values())
    assert n >= 100, n


def test_grammar_duckdb_parity(spark):
    """The Regex grammars must judge IDENTICALLY in Spark (Java regex) and
    DuckDB (RE2) — \\p{Z}/\\p{Cc} classes and \\z anchors are the portable
    subset both engines implement; a drift here would silently poison
    every oracle comparison involving grammar rules."""
    import duckdb
    from pyspark.sql import functions as F
    vals = sorted({v for vec in REFERENCE_BATTERY.values()
                   for v, _ in vec})
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    con = duckdb.connect()
    for prim, spec in PRIMITIVE_GRAMMARS.items():
        if spec["type"] != "Regex":
            continue
        pat = spec["pattern"]
        spark_res = {r["v"]: r["m"] for r in
                     df.select("v", F.col("v").rlike(pat).alias("m"))
                       .collect()}
        for v in vals:
            duck = con.execute("SELECT regexp_matches(?, ?)",
                               [v, pat]).fetchone()[0]
            assert spark_res[v] == duck, (prim, repr(v))


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
