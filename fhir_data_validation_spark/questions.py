"""Questions-dim ingest → per-answerType rule generation (Q1).

The reference consumes a ``questions[]`` dimension and dispatches each
answer through a per-type validator
(``Validation/QuestionAnswer/QuestionAnswerValidator.cs:458-490``: Code /
Quantity / Integer / Decimal / String / Boolean), applying the question's
constraints (``Models/Questions/QuestionConstraints.cs``: min / max /
precision / maxLength / regex) and emitting the QuestionAnswer error codes
(``Validation/QuestionAnswer/Models/QuestionAnswerErrorCodes.cs``).

Here the same dimension compiles AT DRIVER TIME into ordinary engine rules
— the generated set fuses into the one-scan predicate pass (plus a
broadcast-join Membership plan per bound value set), so "question/answer
validation" costs nothing beyond the rule families that already exist.
Generated rules are Contract-class: like the reference's contract checks
(``QuestionAnswerValidator.cs:19-23``), governance severity overrides
refuse to downgrade them.

Question spec (one dict per question)::

    {"id": "Q1", "column": "hr_value", "answerType": "integer",
     "required": true,
     "constraints": {"min": 20, "max": 250, "precision": 0,
                     "maxLength": 8, "regex": "^[0-9]+$"},
     "valueSet": ["a", "b"]          # inline closed world, or
     "valueSetDim": "codes",          # Membership against a broadcast dim
     "valueSetOn": "code"}

``column`` binds the question to its answer column — the tabular analog of
the reference's FHIRPath answer extraction (fixed schema: extraction is
column addressing, not tree navigation).
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from .errors import ErrorCode, RuleConfigurationError
from .model import RuleDefinition, RuleSet

# answerType → the TypeCheck target used for the type-conformance lane
# (ValidateIntegerAnswer / ValidateDecimalAnswer / ValidateBooleanAnswer,
# QuestionAnswerValidator.cs:615-760, re-expressed as try_cast probes)
ANSWER_TYPES = {
    "code": None,          # membership-checked, no cast lane
    "string": None,
    # 32-bit like C# int.TryParse — a bigint cast would wave through
    # values that overflow int32 (grammars.py documents the same choice)
    "integer": "int",
    # decimal.TryParse rejects NaN/Infinity/exponent forms a double cast
    # accepts — the TYPE lane for these is the decimal digit GRAMMAR,
    # not a cast (see _DECIMAL_GRAMMAR below)
    "decimal": "decimal-grammar",
    "quantity": "decimal-grammar",
    # bool.TryParse accepts trimmed, case-insensitive true/false and
    # NOTHING else — Spark's string→boolean try_cast also waves through
    # 'y'/'n'/'t'/'f'/'yes'/'no'/'0'/'1', so the TYPE lane is a grammar,
    # not a cast (round-5 review batch 10)
    "boolean": "boolean-grammar",
}

# the SHARED decimal grammar (grammars.PRIMITIVE_GRAMMARS) — importing,
# not copying, so a fix there propagates (round-5 review batch 10)
from .grammars import PRIMITIVE_GRAMMARS as _PG  # noqa: E402

_DECIMAL_GRAMMAR = _PG["decimal"]["pattern"]
# C# bool.TryParse: trimmed + case-insensitive (unlike FHIR's strict
# lowercase boolean in grammars.py — different spec, different grammar)
_BOOLEAN_GRAMMAR = (r"^[ \t\n\f\r]*(?i:true|false)"
                    r"[ \t\n\f\r]*\z")

ANSWER_REQUIRED = "ANSWER_REQUIRED"
ANSWER_NOT_IN_VALUESET = "ANSWER_NOT_IN_VALUESET"
INVALID_ANSWER_TYPE = "INVALID_ANSWER_TYPE"


def question_rules(questions: Iterable[dict[str, Any]],
                   source: str = "*") -> RuleSet:
    """Compile a questions dimension into a Contract-class RuleSet.

    Per question, by answerType (``QuestionAnswerValidator.cs:458-490``):

    * ``required`` → Required (ANSWER_REQUIRED)
    * integer/decimal/quantity/boolean → TypeCheck (INVALID_ANSWER_TYPE)
    * constraints.min/max → Range (ANSWER_OUT_OF_RANGE)
    * constraints.precision → Precision (decimal/quantity)
    * constraints.maxLength / regex → MaxLength / Regex (string/code)
    * ``valueSet`` inline → AllowedValues; ``valueSetDim`` → Membership
      (both ANSWER_NOT_IN_VALUESET)

    Malformed questions fail here with RULE_CONFIGURATION_ERROR — the
    pre-flight contract, nothing reaches executors.
    """
    rules: list[RuleDefinition] = []
    seen: set[str] = set()
    for q in questions:
        qid = q.get("id")
        col = q.get("column")
        atype = str(q.get("answerType", "")).lower()
        if not qid or not col:
            raise RuleConfigurationError(
                str(qid or "<question>"), ErrorCode.RULE_CONFIGURATION_ERROR,
                "question needs 'id' and 'column'")
        if qid in seen:
            raise RuleConfigurationError(
                qid, ErrorCode.RULE_CONFIGURATION_ERROR,
                "duplicate question id")
        seen.add(qid)
        if atype not in ANSWER_TYPES:
            raise RuleConfigurationError(
                qid, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"unknown answerType {atype!r} "
                f"(expected one of {sorted(ANSWER_TYPES)})")
        cons = q.get("constraints") or {}

        def add(suffix: str, rtype: str, params: dict[str, Any] | None = None,
                error_code: str | None = None) -> None:
            rules.append(RuleDefinition.parse({
                "id": f"{qid}-{suffix}", "type": rtype, "column": col,
                "source": source, "validationClass": "Contract",
                **({"errorCode": error_code} if error_code else {}),
                **({"params": params} if params else {}),
            }))

        if q.get("required"):
            add("REQ", "Required", error_code=ANSWER_REQUIRED)
        cast_target = ANSWER_TYPES[atype]
        if cast_target == "decimal-grammar":
            add("TYPE", "Regex", {"pattern": _DECIMAL_GRAMMAR},
                error_code=INVALID_ANSWER_TYPE)
        elif cast_target == "boolean-grammar":
            add("TYPE", "Regex", {"pattern": _BOOLEAN_GRAMMAR},
                error_code=INVALID_ANSWER_TYPE)
        elif cast_target:
            add("TYPE", "TypeCheck", {"dataType": cast_target},
                error_code=INVALID_ANSWER_TYPE)
        if cons.get("min") is not None or cons.get("max") is not None:
            if atype not in ("integer", "decimal", "quantity"):
                raise RuleConfigurationError(
                    qid, ErrorCode.RULE_CONFIGURATION_ERROR,
                    f"min/max constraints need a numeric answerType, "
                    f"got {atype!r}")
            add("RNG", "Range", {k: cons[k] for k in ("min", "max")
                                 if cons.get(k) is not None})
        if cons.get("precision") is not None:
            if atype not in ("decimal", "quantity"):
                raise RuleConfigurationError(
                    qid, ErrorCode.RULE_CONFIGURATION_ERROR,
                    "precision constraint needs decimal/quantity answerType")
            add("PRC", "Precision", {"precision": cons["precision"]})
        if cons.get("maxLength") is not None:
            if atype not in ("string", "code"):
                raise RuleConfigurationError(
                    qid, ErrorCode.RULE_CONFIGURATION_ERROR,
                    f"maxLength constraint needs string/code answerType, "
                    f"got {atype!r}")
            add("LEN", "MaxLength", {"maxLength": cons["maxLength"]})
        if cons.get("regex"):
            if atype not in ("string", "code"):
                raise RuleConfigurationError(
                    qid, ErrorCode.RULE_CONFIGURATION_ERROR,
                    f"regex constraint needs string/code answerType, "
                    f"got {atype!r}")
            add("RGX", "Regex", {"pattern": cons["regex"]})
        if q.get("valueSet") is not None:
            vs = q["valueSet"]
            if not isinstance(vs, list) or not vs:
                raise RuleConfigurationError(
                    qid, ErrorCode.RULE_CONFIGURATION_ERROR,
                    "inline valueSet must be a non-empty list")
            add("VS", "AllowedValues", {"values": vs},
                error_code=ANSWER_NOT_IN_VALUESET)
        elif q.get("valueSetDim"):
            add("VS", "Membership",
                {"dim": q["valueSetDim"],
                 "on": q.get("valueSetOn", "code")},
                error_code=ANSWER_NOT_IN_VALUESET)
    return RuleSet(version="questions-1", rules=tuple(rules))


def question_rules_from_json(path: str, source: str = "*") -> RuleSet:
    """Load ``{"questions": [...]}`` (or a bare list) from a JSON file."""
    with open(path, encoding="utf-8") as fh:
        raw = json.load(fh)
    if isinstance(raw, dict):
        if "questions" not in raw:
            raise RuleConfigurationError(
                path, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"questions file has no 'questions' key "
                f"(top-level keys: {sorted(raw)})")
        raw = raw["questions"]
    return question_rules(raw, source=source)
