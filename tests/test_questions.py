"""Questions-dim ingest → per-answerType rule generation (Q1).

The generator is the tabular analog of the reference's AnswerType dispatch
(QuestionAnswerValidator.cs:458-490) with QuestionConstraints
(QuestionConstraints.cs) — each question compiles to Contract-class rules
that fuse into the ordinary one-scan pass.
"""

import json

import pytest

from fhir_data_validation_spark import (EngineConfig, RuleConfigurationError,
                                        ValidationEngine, question_rules,
                                        question_rules_from_json)

QUESTIONS = [
    {"id": "Q-HR", "column": "hr", "answerType": "integer",
     "required": True, "constraints": {"min": 20, "max": 250}},
    {"id": "Q-TEMP", "column": "temp", "answerType": "decimal",
     "constraints": {"min": 30, "max": 45, "precision": 1}},
    {"id": "Q-SMOKER", "column": "smoker", "answerType": "boolean"},
    {"id": "Q-NOTE", "column": "note", "answerType": "string",
     "constraints": {"maxLength": 10, "regex": "^[a-z ]*$"}},
    {"id": "Q-SEX", "column": "sex", "answerType": "code",
     "valueSet": ["m", "f", "x"]},
]


def test_generated_rule_shapes():
    rs = question_rules(QUESTIONS)
    by_id = {r.id: r for r in rs.rules}
    assert set(by_id) == {"Q-HR-REQ", "Q-HR-TYPE", "Q-HR-RNG",
                          "Q-TEMP-TYPE", "Q-TEMP-RNG", "Q-TEMP-PRC",
                          "Q-SMOKER-TYPE",
                          "Q-NOTE-LEN", "Q-NOTE-RGX",
                          "Q-SEX-VS"}
    # Contract class everywhere — governance can't downgrade these
    assert all(r.validation_class == "Contract" for r in rs.rules)
    assert by_id["Q-HR-REQ"].error_code == "ANSWER_REQUIRED"
    assert by_id["Q-SEX-VS"].error_code == "ANSWER_NOT_IN_VALUESET"
    assert by_id["Q-HR-TYPE"].error_code == "INVALID_ANSWER_TYPE"
    assert by_id["Q-TEMP-PRC"].params == {"precision": 1}


def test_generated_rules_validate_answers(spark):
    df = spark.createDataFrame(
        [("p1", "72", 36.6, "false", "ok", "m", "web"),
         ("p2", "999", 36.66, "maybe", "WAY TOO LONG NOTE", "q", "web"),
         ("p3", None, None, None, None, None, "web")],
        "doc_id string, hr string, temp double, smoker string, "
        "note string, sex string, source string")
    engine = ValidationEngine(question_rules(QUESTIONS))
    res = engine.validate(df)
    got = {(r["rule_id"], r["doc_id"]) for r in res.violations.collect()}
    assert got == {
        ("Q-HR-RNG", "p2"),          # 999 out of [20, 250]
        ("Q-TEMP-PRC", "p2"),        # 36.66 exceeds precision 1
        ("Q-SMOKER-TYPE", "p2"),     # 'maybe' is not boolean-castable
        ("Q-NOTE-LEN", "p2"), ("Q-NOTE-RGX", "p2"),
        ("Q-SEX-VS", "p2"),
        ("Q-HR-REQ", "p3"),          # required answer missing
    }


def test_generated_rules_refuse_downgrade(spark):
    df = spark.createDataFrame([("p1", "72", "web")],
                               "doc_id string, hr string, source string")
    rs = question_rules([QUESTIONS[0]])
    with pytest.raises(RuleConfigurationError):
        ValidationEngine(rs, config=EngineConfig(
            severity_overrides=(("Q-HR-REQ", "warning"),))).validate(df)


@pytest.mark.parametrize("bad", [
    {"id": "Qx", "answerType": "integer"},                      # no column
    {"id": "Qx", "column": "c", "answerType": "wavelength"},    # bad type
    {"id": "Qx", "column": "c", "answerType": "string",
     "constraints": {"min": 1}},                                # min on string
    {"id": "Qx", "column": "c", "answerType": "integer",
     "constraints": {"precision": 2}},                          # precision on int
    {"id": "Qx", "column": "c", "answerType": "code",
     "valueSet": []},                                           # empty set
])
def test_malformed_questions_rejected(bad):
    with pytest.raises(RuleConfigurationError):
        question_rules([bad])


def test_duplicate_question_id_rejected():
    with pytest.raises(RuleConfigurationError):
        question_rules([QUESTIONS[0], QUESTIONS[0]])


def test_from_json(tmp_path):
    p = tmp_path / "questions.json"
    p.write_text(json.dumps({"questions": QUESTIONS}))
    assert len(question_rules_from_json(str(p)).rules) == 10


def test_from_json_missing_key_is_config_error(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"items": []}')
    with pytest.raises(RuleConfigurationError):
        question_rules_from_json(str(p))


def test_range_on_string_answer_never_aborts(spark):
    """Numeric Range on a string answer column compares through try_cast:
    non-numeric values neither fire Range (TypeCheck's lane) nor abort the
    scan under ANSI."""
    df = spark.createDataFrame(
        [("p1", "72", "web"), ("p2", "999", "web"),
         ("p3", "not-a-number", "web"), ("p4", None, "web")],
        "doc_id string, hr string, source string")
    engine = ValidationEngine(question_rules([
        {"id": "Q-HR", "column": "hr", "answerType": "integer",
         "constraints": {"min": 20, "max": 250}}]))
    res = engine.validate(df)
    got = {(r["rule_id"], r["doc_id"]) for r in res.violations.collect()}
    assert got == {("Q-HR-RNG", "p2"), ("Q-HR-TYPE", "p3")}


# --------------------------------------------- round-3 review regressions ---

def test_integer_answer_is_int32_and_decimal_rejects_nan(spark):
    """integer answers use 32-bit semantics (C# int.TryParse) and
    decimal/quantity answers use the digit grammar — NaN/Infinity/
    exponent forms and int32 overflows are INVALID_ANSWER_TYPE."""
    from fhir_data_validation_spark import EngineConfig, ValidationEngine
    from fhir_data_validation_spark.questions import question_rules
    df = spark.createDataFrame(
        [("a1", "3000000000", "7.5", "web"),    # int32 overflow
         ("a2", "42", "NaN", "web"),            # NaN decimal
         ("a3", "7", "1e5", "web"),             # exponent decimal
         ("a4", "-12", "3.25", "web")],         # clean
        "doc_id string, int_ans string, dec_ans string, source string")
    rs = question_rules([
        {"id": "QI", "column": "int_ans", "answerType": "integer"},
        {"id": "QD", "column": "dec_ans", "answerType": "decimal"}])
    res = ValidationEngine(rs, config=EngineConfig(
        key_col="doc_id", group_col="source")).validate(df)
    got = {(r["doc_id"], r["rule_id"]) for r in res.violations.collect()}
    assert ("a1", "QI-TYPE") in got
    assert ("a2", "QD-TYPE") in got
    assert ("a3", "QD-TYPE") in got
    assert not any(d == "a4" for d, _ in got)


def test_length_and_regex_constraints_need_string_answer():
    from fhir_data_validation_spark.errors import RuleConfigurationError
    from fhir_data_validation_spark.questions import question_rules
    with pytest.raises(RuleConfigurationError, match="maxLength"):
        question_rules([{"id": "QB", "column": "c",
                         "answerType": "boolean",
                         "constraints": {"maxLength": 2}}])
    with pytest.raises(RuleConfigurationError, match="regex"):
        question_rules([{"id": "QN", "column": "c",
                         "answerType": "integer",
                         "constraints": {"regex": "^x$"}}])


def test_boolean_answer_grammar_rejects_trybool_lookalikes(spark):
    """round-5 review regressions (batch 10): Spark's string→boolean
    try_cast accepts y/n/t/f/yes/no/0/1 — C# bool.TryParse does not, so
    the boolean TYPE lane is a trimmed case-insensitive grammar."""
    from fhir_data_validation_spark import EngineConfig, ValidationEngine
    from fhir_data_validation_spark.questions import question_rules
    rs = question_rules([{"id": "QB", "column": "ans",
                          "answerType": "boolean"}])
    df = spark.createDataFrame(
        [("d1", "true", "w"), ("d2", " False ", "w"), ("d3", "TRUE", "w"),
         ("d4", "yes", "w"), ("d5", "1", "w"), ("d6", "t", "w"),
         ("d7", "n", "w")],
        "doc_id string, ans string, source string")
    res = ValidationEngine(rs, config=EngineConfig(
        key_col="doc_id", group_col="source")).validate(df)
    bad = sorted(r["doc_id"] for r in res.violations.collect())
    res.unpersist()
    assert bad == ["d4", "d5", "d6", "d7"]


def test_precision_constraint_compiles_on_string_answer_column(spark):
    """round-5 review regressions (batch 10): a precision constraint on
    a decimal answerType must run on the string answer column the
    questions-dim pattern uses (try_cast lane, like Range); unparseable
    strings stay the TYPE lane's finding."""
    from fhir_data_validation_spark import EngineConfig, ValidationEngine
    from fhir_data_validation_spark.questions import question_rules
    rs = question_rules([{"id": "QD", "column": "ans",
                          "answerType": "decimal",
                          "constraints": {"precision": 2}}])
    df = spark.createDataFrame(
        [("d1", "1.25", "w"), ("d2", "1.257", "w"), ("d3", "oops", "w")],
        "doc_id string, ans string, source string")
    res = ValidationEngine(rs, config=EngineConfig(
        key_col="doc_id", group_col="source")).validate(df)
    by_code = {}
    for r in res.violations.collect():
        by_code.setdefault(r["error_code"], []).append(r["doc_id"])
    res.unpersist()
    assert by_code.get("PRECISION_VIOLATION") == ["d2"]
    assert by_code.get("INVALID_ANSWER_TYPE") == ["d3"]
