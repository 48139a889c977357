"""Terminology/constraint-dim rule tests: Membership (R6), Reference type
check (J2), CodeMaster (J4/J5), nested-path navigation (P5)."""

import pytest

from fhir_data_validation_spark import EngineConfig, RuleSet, ValidationEngine
from fhir_data_validation_spark.errors import RuleConfigurationError
from fhir_data_validation_spark.sources.synth import token_table, vocab_dim


def _run(spark, df, rules, dims=None, **cfg):
    engine = ValidationEngine(RuleSet.parse({"rules": rules}), dims=dims,
                              config=EngineConfig(**cfg) if cfg else None)
    return engine.validate(df)


# -------------------------------------------------------- Membership (R6) ---

def test_membership_array_column(spark):
    """Out-of-vocab token elements flagged per distinct element (A6 dedup)."""
    df = spark.createDataFrame(
        [("d1", [1, 2, 3], "web"),
         ("d2", [1, 99999, 99999, 2], "web"),   # dup bad value → ONE violation
         ("d3", [88888, 99999], "web")],
        "doc_id string, tokens array<int>, source string")
    res = _run(spark, df,
               [{"id": "MEM-1", "type": "Membership", "column": "tokens",
                 "params": {"dim": "vocab", "on": "token_id"}}],
               dims={"vocab": vocab_dim(spark, 50257)})
    rows = res.violations.collect()
    got = {(r["doc_id"], r["detail"]["value"]) for r in rows}
    assert got == {("d2", "99999"), ("d3", "88888"), ("d3", "99999")}
    assert all(r["error_code"] == "CODE_NOT_IN_VALUESET" for r in rows)


def test_membership_scalar_column(spark):
    df = spark.createDataFrame(
        [("d1", "web"), ("d2", "junk")], "doc_id string, source string")
    dim = spark.createDataFrame([("web",), ("wiki",)], "s string")
    res = _run(spark, df,
               [{"id": "MEM-2", "type": "Membership", "column": "source",
                 "params": {"dim": "src", "on": "s"}}], dims={"src": dim})
    assert [r["doc_id"] for r in res.violations.collect()] == ["d2"]


def test_membership_requires_dim(spark):
    df = token_table(spark, 10)
    with pytest.raises(RuleConfigurationError):
        _run(spark, df, [{"id": "MEM-3", "type": "Membership",
                          "column": "tokens",
                          "params": {"dim": "nope", "on": "x"}}])


# ------------------------------------------------- Reference type check (J2) -

def test_reference_type_check(spark):
    df = spark.createDataFrame(
        [("d1", "r1", "g"), ("d2", "r2", "g"), ("d3", "r9", "g")],
        "doc_id string, ref string, source string")
    dim = spark.createDataFrame(
        [("r1", "Patient"), ("r2", "Device")],
        "key string, target_type string")
    res = _run(spark, df,
               [{"id": "REF-T", "type": "Reference", "column": "ref",
                 "params": {"dim": "d", "on": "key",
                            "typeColumn": "target_type",
                            "expectedTypes": ["Patient", "Group"]}}],
               dims={"d": dim})
    got = {r["doc_id"]: r["error_code"] for r in res.violations.collect()}
    assert got == {"d2": "REFERENCE_TYPE_MISMATCH",
                   "d3": "REFERENCE_NOT_FOUND"}
    mism = res.violations.where("doc_id = 'd2'").collect()[0]
    assert mism["detail"]["actualType"] == "Device"


def test_reference_expected_types_needs_type_column(spark):
    df = spark.createDataFrame([("d1", "r1", "g")],
                               "doc_id string, ref string, source string")
    dim = spark.createDataFrame([("r1",)], "key string")
    with pytest.raises(RuleConfigurationError):
        _run(spark, df,
             [{"id": "REF-B", "type": "Reference", "column": "ref",
               "params": {"dim": "d", "on": "key",
                          "expectedTypes": ["Patient"]}}], dims={"d": dim})


# ------------------------------------------------------- CodeMaster (J4/J5) -

@pytest.fixture()
def qa_frame(spark):
    return spark.createDataFrame(
        [("d1", "Q1", ["yes"], "scr"),          # ok
         ("d2", "Q1", ["maybe"], "scr"),        # invalid answer
         ("d3", "Q9", ["yes"], "scr"),          # unknown question
         ("d4", "Q2", ["a", "b"], "scr"),       # multi not allowed
         ("d5", "Q2", ["a"], "scr"),            # ok
         ("d6", "Q1", ["yes", "no", "huh"], "scr")],  # multi ok + 1 invalid
        "doc_id string, qcode string, answers array<string>, source string")


@pytest.fixture()
def qa_dim(spark):
    return spark.createDataFrame(
        [("Q1", ["yes", "no"], True), ("Q2", ["a", "b"], False)],
        "code string, allowed array<string>, multi boolean")


def test_codemaster(spark, qa_frame, qa_dim):
    res = _run(spark, qa_frame,
               [{"id": "CM-1", "type": "CodeMaster", "column": "answers",
                 "params": {"dim": "cm", "keyColumn": "qcode",
                            "dimKey": "code", "allowedColumn": "allowed",
                            "multiValueColumn": "multi"}}],
               dims={"cm": qa_dim})
    got = {(r["doc_id"], r["error_code"]) for r in res.violations.collect()}
    assert got == {("d2", "INVALID_ANSWER_VALUE"),
                   ("d3", "INVALID_QUESTION_CODE"),
                   ("d4", "MULTIPLE_VALUES_NOT_ALLOWED"),
                   ("d6", "INVALID_ANSWER_VALUE")}
    bad = {r["doc_id"]: r["detail"] for r in res.violations
           .where("error_code = 'INVALID_ANSWER_VALUE'").collect()}
    assert bad["d2"]["value"] == "maybe" and bad["d6"]["value"] == "huh"


def test_codemaster_missing_dim_column(spark, qa_frame, qa_dim):
    with pytest.raises(RuleConfigurationError):
        _run(spark, qa_frame,
             [{"id": "CM-2", "type": "CodeMaster", "column": "answers",
               "params": {"dim": "cm", "keyColumn": "qcode",
                          "dimKey": "nope", "allowedColumn": "allowed"}}],
             dims={"cm": qa_dim})


# ------------------------------------------------- nested-path rules (P5) ---

def test_nested_struct_path(spark):
    df = spark.createDataFrame(
        [("d1", {"a": {"b": 5}}, "g"), ("d2", {"a": {"b": 50}}, "g")],
        "doc_id string, payload struct<a: struct<b: int>>, source string")
    res = _run(spark, df,
               [{"id": "NST-1", "type": "Range", "column": "payload.a.b",
                 "params": {"min": 0, "max": 10}}])
    assert [r["doc_id"] for r in res.violations.collect()] == ["d2"]


def test_nested_path_rejects_bad_segment(spark):
    df = spark.createDataFrame(
        [("d1", {"a": 1}, "g")],
        "doc_id string, payload struct<a: int>, source string")
    with pytest.raises(RuleConfigurationError):
        _run(spark, df, [{"id": "NST-2", "type": "Range",
                          "column": "payload.a.b", "params": {"min": 0}}])


# -------------------------------- J3: multi-column reference extraction ----

def test_reference_multi_column_sweep(spark):
    """params.columns sweeps scalar + array + nested element paths through
    one extraction pass; the violation's column names the offender."""
    df = spark.createDataFrame(
        [("d1", "u1", ["u2", "u9"],
          [{"ref": "u3"}, {"ref": "u8"}], "web"),
         ("d2", "u7", None, None, "web")],
        "doc_id string, owner string, members array<string>, "
        "links array<struct<ref:string>>, source string")
    dim = spark.createDataFrame([("u1",), ("u2",), ("u3",)], "uid string")
    res = _run(spark, df,
               [{"id": "REF-M", "type": "Reference",
                 "params": {"columns": ["owner", "members", "links[*].ref"],
                            "dim": "users", "on": "uid"}}],
               dims={"users": dim})
    got = {(r["doc_id"], r["column"], r["detail"]["value"])
           for r in res.violations.collect()}
    assert got == {("d1", "members", "u9"), ("d1", "links[*].ref", "u8"),
                   ("d2", "owner", "u7")}


def test_reference_join_keeps_native_types(spark):
    """Numerically-equal keys of different widths must match (double 42.0
    vs bigint 42) — the join compares natively, never through strings."""
    df = spark.createDataFrame([("d1", 42.0, "g"), ("d2", 7.5, "g")],
                               "doc_id string, ref double, source string")
    dim = spark.createDataFrame([(42,)], "k long")
    res = _run(spark, df,
               [{"id": "REF-T", "type": "Reference", "column": "ref",
                 "params": {"dim": "d", "on": "k"}}], dims={"d": dim})
    assert [r["doc_id"] for r in res.violations.collect()] == ["d2"]


def test_reference_mixed_leaf_types_rejected(spark):
    df = spark.createDataFrame([("d1", 1, "x", "g")],
                               "doc_id string, a long, b string, source string")
    dim = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(RuleConfigurationError):
        _run(spark, df, [{"id": "REF-MIX", "type": "Reference",
                          "params": {"columns": ["a", "b"],
                                     "dim": "d", "on": "k"}}],
             dims={"d": dim})


def test_dedupe_triggered_by_swept_column_collision(spark):
    """needs_dedupe must see each swept column of a multi-column Reference:
    a scalar rule on 'owner' and a sweep including 'owner' collide."""
    df = spark.createDataFrame([("d1", "u9", "g")],
                               "doc_id string, owner string, source string")
    dim = spark.createDataFrame([("u1",)], "uid string")
    res = _run(spark, df, [
        {"id": "REF-A", "type": "Reference", "column": "owner",
         "params": {"dim": "users", "on": "uid"}},
        {"id": "REF-B", "type": "Reference",
         "params": {"columns": ["owner"], "dim": "users", "on": "uid"}},
    ], dims={"users": dim})
    rows = res.violations.collect()
    # one violation survives (earlier rule id wins), not two duplicates
    assert len(rows) == 1 and rows[0]["rule_id"] == "REF-A"


# ------------------------------- CodeSystem (system, code) pair lane (R6) --

def _codeset_dim(spark):
    return spark.createDataFrame(
        [("http://loinc", "A"), ("http://loinc", "B"),
         ("http://snomed", "Z")],
        "sys string, code string")


def test_codesystem_scalar_pair(spark):
    """system ≠ expected ⇒ CODESYSTEM_MISMATCH (code unchecked); system
    matches but code outside the system's CodeSet ⇒ CODE_NOT_IN_VALUESET
    (FhirPathRuleEngine.cs:1645-1693)."""
    df = spark.createDataFrame(
        [("d1", "http://loinc", "A", "web"),     # clean
         ("d2", "http://snomed", "Q", "web"),    # wrong system, bad code
         ("d3", "http://loinc", "Z", "web"),     # right system, foreign code
         ("d4", None, "A", "web")],              # null system
        "doc_id string, sys string, code string, source string")
    res = _run(spark, df,
               [{"id": "CS-1", "type": "CodeSystem", "column": "code",
                 "params": {"system": "http://loinc", "systemColumn": "sys",
                            "dim": "codes", "on": "code",
                            "dimSystemColumn": "sys"}}],
               dims={"codes": _codeset_dim(spark)})
    got = {(r["doc_id"], r["error_code"]) for r in res.violations.collect()}
    assert got == {("d2", "CODESYSTEM_MISMATCH"),
                   ("d4", "CODESYSTEM_MISMATCH"),
                   ("d3", "CODE_NOT_IN_VALUESET")}
    details = {r["doc_id"]: r["detail"] for r in res.violations.collect()}
    assert details["d2"]["actualSystem"] == "http://snomed"
    assert details["d2"]["expectedSystem"] == "http://loinc"
    assert details["d3"]["code"] == "Z"


def test_codesystem_element_pairs(spark):
    """codings[*].system / codings[*].code element paths: per-element
    verdicts with the arrayIndex hint, indexes aligned by construction."""
    df = spark.createDataFrame(
        [("d1", [{"system": "http://loinc", "code": "A"},
                 {"system": "http://other", "code": "A"},
                 {"system": "http://loinc", "code": "QQ"}], "web")],
        "doc_id string, "
        "codings array<struct<system:string,code:string>>, source string")
    res = _run(spark, df,
               [{"id": "CS-2", "type": "CodeSystem",
                 "column": "codings[*].code",
                 "params": {"system": "http://loinc",
                            "systemColumn": "codings[*].system",
                            "dim": "codes", "on": "code",
                            "dimSystemColumn": "sys"}}],
               dims={"codes": _codeset_dim(spark)})
    got = {(r["error_code"], r["detail"]["index"])
           for r in res.violations.collect()}
    assert got == {("CODESYSTEM_MISMATCH", "1"),
                   ("CODE_NOT_IN_VALUESET", "2")}


def test_codesystem_config_errors(spark):
    df = spark.createDataFrame([("d1", "s", "c", "g")],
                               "doc_id string, sys string, code string, "
                               "source string")
    dim = _codeset_dim(spark)
    with pytest.raises(RuleConfigurationError):  # missing systemColumn
        _run(spark, df, [{"id": "CS-X", "type": "CodeSystem",
                          "column": "code",
                          "params": {"system": "s", "dim": "codes"}}],
             dims={"codes": dim})
    with pytest.raises(RuleConfigurationError):  # mixed scalar/element paths
        _run(spark, df, [{"id": "CS-Y", "type": "CodeSystem",
                          "column": "code",
                          "params": {"system": "s",
                                     "systemColumn": "sys[*].x",
                                     "dim": "codes"}}],
             dims={"codes": dim})
    # element paths over DIFFERENT base arrays: the zip would pad and pair
    # unrelated elements — rejected at compile
    df2 = spark.createDataFrame(
        [("d1", [{"code": "A"}], [{"system": "s"}], "g")],
        "doc_id string, codings array<struct<code:string>>, "
        "idents array<struct<system:string>>, source string")
    with pytest.raises(RuleConfigurationError):
        _run(spark, df2, [{"id": "CS-Z", "type": "CodeSystem",
                           "column": "codings[*].code",
                           "params": {"system": "s",
                                      "systemColumn": "idents[*].system",
                                      "dim": "codes"}}],
             dims={"codes": dim})
    # raw array column + scalar system: no silent zip-pad — rejected
    df3 = spark.createDataFrame(
        [("d1", ["A"], "s", "g")],
        "doc_id string, codes array<string>, sys string, source string")
    with pytest.raises(RuleConfigurationError):
        _run(spark, df3, [{"id": "CS-W", "type": "CodeSystem",
                           "column": "codes",
                           "params": {"system": "s", "systemColumn": "sys",
                                      "dim": "codes"}}],
             dims={"codes": dim})


def test_codemaster_skips_null_and_empty_answers(spark):
    """Null/empty answer elements are neither flagged invalid nor counted
    for multiplicity (CodeMasterEngine.cs IsNullOrEmpty extraction); the
    multiplicity count keeps duplicates (it is a list, not a set)."""
    df = spark.createDataFrame(
        [("d1", "q1", [None, "", "ok"], "web"),    # one real value → clean
         ("d2", "q1", ["ok", "ok"], "web"),        # dup values → MULTI
         ("d3", "q1", [None, None], "web")],       # nothing extracted
        "doc_id string, q string, ans array<string>, source string")
    dim = spark.createDataFrame([("q1", ["ok"], False)],
                                "k string, allowed array<string>, m boolean")
    res = _run(spark, df,
               [{"id": "CM-N", "type": "CodeMaster", "column": "ans",
                 "params": {"dim": "cm", "keyColumn": "q", "dimKey": "k",
                            "allowedColumn": "allowed",
                            "multiValueColumn": "m"}}],
               dims={"cm": dim})
    got = {(r["doc_id"], r["error_code"]) for r in res.violations.collect()}
    assert got == {("d2", "MULTIPLE_VALUES_NOT_ALLOWED")}


def test_codemaster_two_level_screening(spark):
    """Two-level dispatch (CodeMasterEngine.cs:22-143): null screening
    skipped, unknown screening → UNKNOWN_SCREENING_TYPE, known screening +
    null question key → MISSING_QUESTION_CODE, unknown (screening, key)
    pair → INVALID_QUESTION_CODE, plus the usual answer lanes."""
    df = spark.createDataFrame(
        [("d1", "bp", "sys", "high", "web"),      # clean
         ("d2", "bp", "dia", "purple", "web"),    # bad answer value
         ("d3", "xx", "sys", "high", "web"),      # unknown screening
         ("d4", "bp", None, "high", "web"),       # missing question code
         ("d5", None, "sys", "high", "web"),      # null screening → skipped
         ("d6", "bp", "zz", "high", "web")],      # unknown question in bp
        "doc_id string, screening string, q string, answer string, "
        "source string")
    dim = spark.createDataFrame(
        [("bp", "sys", ["high", "low"], True),
         ("bp", "dia", ["high", "low"], True),
         ("hr", "sys", ["x"], True)],
        "scr string, q string, allowed array<string>, multi boolean")
    res = _run(spark, df,
               [{"id": "CM-2", "type": "CodeMaster", "column": "answer",
                 "params": {"dim": "cm", "keyColumn": "q",
                            "dimKey": "q", "allowedColumn": "allowed",
                            "multiValueColumn": "multi",
                            "screeningColumn": "screening",
                            "dimScreening": "scr"}}],
               dims={"cm": dim})
    got = {(r["doc_id"], r["error_code"]) for r in res.violations.collect()}
    assert got == {("d2", "INVALID_ANSWER_VALUE"),
                   ("d3", "UNKNOWN_SCREENING_TYPE"),
                   ("d4", "MISSING_QUESTION_CODE"),
                   ("d6", "INVALID_QUESTION_CODE")}
    d6 = {r["doc_id"]: r["detail"] for r in res.violations.collect()}["d6"]
    assert d6["screeningType"] == "bp" and d6["key"] == "zz"


# ----------------------------------- P5: array-of-struct element paths -----

def _components_df(spark):
    return spark.createDataFrame(
        [("d1", [{"code": "A", "value": 5.0}, {"code": "ZZ", "value": 50.0}],
          "web"),
         ("d2", [{"code": "B", "value": 7.0}], "web"),
         ("d3", [], "web"),
         ("d4", None, "web"),
         ("d5", [{"code": None, "value": None}], "web")],
        "doc_id string, components array<struct<code:string,value:double>>, "
        "source string")


def test_element_path_allowed_values(spark):
    """a[*].b compiles to native GetArrayStructFields + the array lanes:
    one violation per doc with index-aware detail."""
    res = _run(spark, _components_df(spark),
               [{"id": "NP-1", "type": "AllowedValues",
                 "column": "components[*].code",
                 "params": {"values": ["A", "B", "C"]}}])
    rows = {r["doc_id"]: r["detail"] for r in res.violations.collect()}
    assert set(rows) == {"d1", "d5"}          # ZZ and the null leaf
    assert rows["d1"]["badCount"] == "1"
    assert rows["d1"]["examples"] == '[{"i":1,"v":"ZZ"}]'


def test_element_path_range_per_element(spark):
    res = _run(spark, _components_df(spark),
               [{"id": "NP-2", "type": "Range",
                 "column": "components[*].value",
                 "params": {"min": 0, "max": 10, "perElement": True}}])
    rows = res.violations.collect()
    assert len(rows) == 1
    assert (rows[0]["doc_id"], rows[0]["detail"]["index"],
            rows[0]["detail"]["value"]) == ("d1", "1", "50.0")
    assert rows[0]["column"] == "components[*].value"


def test_element_path_required_and_regex(spark):
    res = _run(spark, _components_df(spark),
               [{"id": "NP-3", "type": "Required",
                 "column": "components[*].code"},
                {"id": "NP-4", "type": "Regex",
                 "column": "components[*].code",
                 "params": {"pattern": "^[A-Z]$"}}])
    got = {(r["rule_id"], r["doc_id"]) for r in res.violations.collect()}
    # d5's null code → Required; d1's 'ZZ' fails the single-letter grammar;
    # empty/missing arrays and null leaves are skipped by Regex
    assert got == {("NP-3", "d5"), ("NP-4", "d1")}


def test_element_path_bad_configs(spark):
    df = _components_df(spark)
    for col in ("components.code",            # array traversal needs [*]
                "components[*].nope",         # unknown leaf
                "doc_id[*]",                  # [*] on a non-array
                "components[*].code[*]"):     # two markers
        with pytest.raises(RuleConfigurationError):
            _run(spark, df, [{"id": "NP-X", "type": "Required",
                              "column": col}])


# ------------------------------------- nested repetition a[*].b[*].c (P5b) --

def _nested_df(spark):
    return spark.createDataFrame(
        [("d1", [{"name": "g0",
                  "items": [{"code": "A", "qty": 5.0},
                            {"code": "ZZ", "qty": 50.0}]},
                 {"name": "g1",
                  "items": [{"code": "B", "qty": 7.0}]}], "web"),
         ("d2", [{"name": "g0", "items": []},
                 {"name": "g1", "items": None},          # null inner array
                 {"name": "g2",
                  "items": [{"code": "C", "qty": 1.0}]}], "web"),
         ("d3", None, "web"),
         ("d4", [{"name": "g0",
                  "items": [{"code": None, "qty": None}]}], "web")],
        "doc_id string, groups array<struct<name:string,"
        "items:array<struct<code:string,qty:double>>>>, source string")


def test_nested_element_path_allowed_values(spark):
    """a[*].b[*].c flattens through both array levels; examples carry the
    composite (i, j) index (FhirPathRuleEngine.cs:648-723 arbitrary-depth
    repeated-element navigation, two levels)."""
    res = _run(spark, _nested_df(spark),
               [{"id": "NN-1", "type": "AllowedValues",
                 "column": "groups[*].items[*].code",
                 "params": {"values": ["A", "B", "C"]}}])
    rows = {r["doc_id"]: r["detail"] for r in res.violations.collect()}
    assert set(rows) == {"d1", "d4"}          # ZZ and the null leaf
    assert rows["d1"]["badCount"] == "1"
    assert rows["d1"]["examples"] == '[{"i":0,"j":1,"v":"ZZ"}]'
    assert rows["d4"]["examples"] == '[{"i":0,"j":0}]'  # null leaf v omitted


def test_nested_element_path_per_element(spark):
    """perElement over a nested path: one violation per bad (i, j) element
    with index + innerIndex detail."""
    res = _run(spark, _nested_df(spark),
               [{"id": "NN-2", "type": "Range",
                 "column": "groups[*].items[*].qty",
                 "params": {"min": 0, "max": 10, "perElement": True}}])
    rows = res.violations.collect()
    assert len(rows) == 1
    d = rows[0]["detail"]
    assert (rows[0]["doc_id"], d["index"], d["innerIndex"],
            d["value"]) == ("d1", "0", "1", "50.0")


def test_nested_element_path_null_inner_arrays(spark):
    """Null/empty inner arrays contribute no elements AND do not null out
    the whole row's lane (flatten(NULL-element) returns NULL — guarded)."""
    res = _run(spark, _nested_df(spark),
               [{"id": "NN-3", "type": "Regex",
                 "column": "groups[*].items[*].code",
                 "params": {"pattern": "^[A-Z]$"}}])
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"d1"}                       # d2's C passes, null inner ok


def test_nested_single_level_detail_unchanged(spark):
    """Single-level paths keep their exact example shape (no j key)."""
    res = _run(spark, _components_df(spark),
               [{"id": "NN-4", "type": "AllowedValues",
                 "column": "components[*].code",
                 "params": {"values": ["A", "B", "C"]}}])
    rows = {r["doc_id"]: r["detail"] for r in res.violations.collect()}
    assert rows["d1"]["examples"] == '[{"i":1,"v":"ZZ"}]'


def test_nested_same_value_elements_survive_dedup(spark):
    """A5 dedup keys on (index, innerIndex): two same-VALUE bad elements at
    different nested positions are distinct locations, not duplicates
    (regression: the dedup key ignored innerIndex and collapsed them)."""
    df = spark.createDataFrame(
        [("d1", [{"items": [{"v": 50.0}, {"v": 50.0}]}], "web")],
        "doc_id string, groups array<struct<items:array<struct<v:double>>>>,"
        " source string")
    # two rules sharing (error_code, column) force the dedup pass to run
    rules = [{"id": rid, "type": "Range",
              "column": "groups[*].items[*].v",
              "params": {"min": 0, "max": 10, "perElement": True}}
             for rid in ("RNG-A", "RNG-B")]
    rows = _run(spark, df, rules).violations.collect()
    locs = {(r["detail"]["index"], r["detail"]["innerIndex"]) for r in rows}
    assert locs == {("0", "0"), ("0", "1")}
    assert len(rows) == 2                      # one per element, deduped
    assert {r["rule_id"] for r in rows} == {"RNG-A"}   # earlier id wins


def test_nested_three_level_paths(spark):
    """Three [*] levels flatten like the reference's arbitrary-depth
    navigation (FhirPathRuleEngine.cs:648-723): i = outermost index,
    j = ordinal within the flattened remainder under i."""
    df = spark.createDataFrame(
        [("d1", [{"a": [{"b": [{"v": 1}, {"v": 99999}]},  # (i=0,j=0),(0,1)
                        {"b": [{"v": 2}]}]},              # (0,2)
                 {"a": [{"b": None},                      # contributes none
                        {"b": [{"v": 88888}]}]}], "web"),  # (i=1, j=0)
         ("d2", [{"a": None}], "web"),
         ("d3", None, "web")],
        "doc_id string, x array<struct<a:array<struct<"
        "b:array<struct<v:int>>>>>>, source string")
    res = _run(spark, df, [{"id": "NN-5", "type": "Range",
                            "column": "x[*].a[*].b[*].v",
                            "params": {"min": 0, "max": 1000,
                                       "perElement": True}}])
    rows = res.violations.collect()
    locs = {(r["doc_id"], r["detail"]["index"], r["detail"]["innerIndex"],
             r["detail"]["value"]) for r in rows}
    assert locs == {("d1", "0", "1", "99999"), ("d1", "1", "0", "88888")}


def test_nested_terminal_star_flattens_to_leaf_array(spark):
    """A TERMINAL [*] after earlier stars yields the fully-flattened leaf
    array as a plain array value (array-family rules see one array per
    row; element indices are flat ordinals)."""
    df = spark.createDataFrame(
        [("d1", [{"b": [1, 99999]}, {"b": [2]}], "web"),
         ("d2", [{"b": None}], "web")],
        "doc_id string, x array<struct<b:array<int>>>, source string")
    res = _run(spark, df, [{"id": "NN-6", "type": "TokenDomain",
                            "column": "x[*].b[*]",
                            "params": {"min": 0, "maxExclusive": 1000}}])
    rows = {r["doc_id"]: r["detail"] for r in res.violations.collect()}
    assert set(rows) == {"d1"}
    assert rows["d1"]["badCount"] == "1"
    assert rows["d1"]["examples"] == '[{"i":1,"v":99999}]'


# --------------------------------------------- per-element fan-out (R2/R3) --

def test_per_element_violations(spark):
    """params.perElement: one violation per bad array element with its
    index (FhirPathRuleEngine.cs:446-478 one-error-per-invalid-element)."""
    df = spark.createDataFrame(
        [("d1", [1, 99999, 2, 88888], "web"),
         ("d2", [1, 2], "web")],
        "doc_id string, tokens array<int>, source string")
    res = _run(spark, df,
               [{"id": "DOM-E", "type": "TokenDomain", "column": "tokens",
                 "params": {"min": 0, "maxExclusive": 50257,
                            "perElement": True}}])
    rows = res.violations.collect()
    got = {(r["doc_id"], r["detail"]["index"], r["detail"]["value"])
           for r in rows}
    assert got == {("d1", "1", "99999"), ("d1", "3", "88888")}


def test_null_array_elements_fixed_value(spark):
    """Null elements are mismatches in BOTH lanes: the native has_bad
    (array_remove retains nulls) and the lambda-built detail/elements must
    agree, otherwise perElement fan-out silently drops the violation."""
    df = spark.createDataFrame(
        [("d1", ["x", None, "x"], "web"),     # null-only mismatch
         ("d2", ["x", "y", None], "web"),     # mixed
         ("d3", ["x", "x"], "web")],          # clean
        "doc_id string, vals array<string>, source string")
    res = _run(spark, df,
               [{"id": "FIX-N", "type": "FixedValue", "column": "vals",
                 "params": {"value": "x"}}])
    rows = {r["doc_id"]: r["detail"] for r in res.violations.collect()}
    assert set(rows) == {"d1", "d2"}
    assert rows["d1"]["badCount"] == "1"      # the null element is counted
    assert rows["d2"]["badCount"] == "2"


def test_null_array_elements_per_element(spark):
    """perElement with a null-only mismatch must still emit a violation
    (regression: empty elements array made the row vanish in the fan-out)."""
    df = spark.createDataFrame(
        [("d1", ["a", None], "web")],
        "doc_id string, vals array<string>, source string")
    res = _run(spark, df,
               [{"id": "ALW-N", "type": "AllowedValues", "column": "vals",
                 "params": {"values": ["a", "b"], "perElement": True}}])
    rows = res.violations.collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == "d1" and rows[0]["detail"]["index"] == "1"
    assert rows[0]["detail"]["value"] is None


def test_per_element_off_by_default(spark):
    df = spark.createDataFrame(
        [("d1", [1, 99999, 2, 88888], "web")],
        "doc_id string, tokens array<int>, source string")
    res = _run(spark, df,
               [{"id": "DOM-R", "type": "TokenDomain", "column": "tokens",
                 "params": {"min": 0, "maxExclusive": 50257}}])
    rows = res.violations.collect()
    assert len(rows) == 1 and rows[0]["detail"]["badCount"] == "2"


# --------------------------------------------- round-3 review regressions ---

def test_membership_null_elements_and_dotted_paths(spark):
    """Null array elements are skipped (Required owns missingness — same
    open-world convention as the scalar lane), dotted struct paths
    resolve, and a typo'd column raises at COMPILE, not KeyError mid-run."""
    df = spark.createDataFrame(
        [("d1", [1, None, 99999], {"code": "A"}, "web"),
         ("d2", [None, None], {"code": "ZZZ"}, "web")],
        "doc_id string, tokens array<int>, coding struct<code:string>, "
        "source string")
    vocab = spark.createDataFrame([(1,), (2,)], "token_id int")
    res = _run(spark, df,
               [{"id": "MEM-N", "type": "Membership", "column": "tokens",
                 "params": {"dim": "vocab", "on": "token_id"}}],
               dims={"vocab": vocab})
    got = {(r["doc_id"], r["detail"]["value"])
           for r in res.violations.collect()}
    assert got == {("d1", "99999")}          # nulls never flagged
    # dotted struct path
    codes = spark.createDataFrame([("A",), ("B",)], "c string")
    res2 = _run(spark, df,
                [{"id": "MEM-D", "type": "Membership",
                  "column": "coding.code",
                  "params": {"dim": "codes", "on": "c"}}],
                dims={"codes": codes})
    assert [r["doc_id"] for r in res2.violations.collect()] == ["d2"]
    # typo'd column -> compile-time RuleConfigurationError
    with pytest.raises(RuleConfigurationError):
        _run(spark, df,
             [{"id": "MEM-T", "type": "Membership", "column": "tokenz",
               "params": {"dim": "vocab", "on": "token_id"}}],
             dims={"vocab": vocab})


def test_codesystem_parallel_array_length_mismatch(spark):
    """Two independent parallel arrays of unequal length cannot align:
    the row emits ONE lengthMismatch violation instead of zip-padding
    and judging elements that have no counterpart."""
    df = spark.createDataFrame(
        [("d1", ["s", "s"], ["A", "B"], "web"),       # aligned, fine
         ("d2", ["s"], ["A", "B"], "web"),            # mismatch
         ("d3", None, ["A"], "web")],                 # one side null
        "doc_id string, systems array<string>, codes array<string>, "
        "source string")
    dim = spark.createDataFrame([("A",), ("B",)], "code string")
    res = _run(spark, df,
               [{"id": "CS-P", "type": "CodeSystem", "column": "codes",
                 "params": {"system": "s", "systemColumn": "systems",
                            "dim": "cs", "on": "code"}}],
               dims={"cs": dim})
    rows = res.violations.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert "d1" not in by_doc
    assert len(by_doc["d2"]) == 1
    assert by_doc["d2"][0]["detail"]["check"] == "lengthMismatch"
    assert len(by_doc["d3"]) == 1
    assert by_doc["d3"][0]["detail"]["check"] == "lengthMismatch"


def test_value_exclusivity_rejects_element_paths(spark):
    df = spark.createDataFrame(
        [("d1", [{"v": "x"}], "y", "web")],
        "doc_id string, comp array<struct<v:string>>, alt string, "
        "source string")
    with pytest.raises(RuleConfigurationError, match="element path"):
        _run(spark, df,
             [{"id": "VX-1", "type": "ValueExclusivity", "column": "alt",
               "params": {"columns": ["alt", "comp[*].v"]}}])


def test_jsonpath_in_values_type_validation(spark):
    df = spark.createDataFrame(
        [("d1", '{"a": 1}', "web")],
        "doc_id string, payload string, source string")
    with pytest.raises(RuleConfigurationError, match="does not match"):
        _run(spark, df,
             [{"id": "JP-IV", "type": "JsonPath", "column": "payload",
               "params": {"path": "$.a", "op": "inValues",
                          "asType": "long", "values": ["a", "b"]}}])
