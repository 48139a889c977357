"""Canonical ``details`` schema per error code (frozen contract).

The reference freezes a per-errorCode details schema and validates every
emitted error against it at runtime
(``Models/ValidationErrorDetailsValidator.cs:1-322``: required keys per
code, throw in dev / warn in prod, unknown codes warned but not
validated).  This module is that contract re-keyed to this engine's
violation rows: each error code maps to one or more allowed SHAPES —
variant lanes of the same rule family (scalar vs. array-summary vs.
per-element) legitimately emit different key sets, so a detail map
satisfies the contract when ANY variant accepts it (all of the variant's
required keys present, no keys outside required ∪ optional).

Differences from the C# validator, deliberate and documented:

* details here are ``map<string,string>`` columns built inside the fused
  scan (compiler.py ``_smap``), so "must be an array"-style type checks
  become key-presence checks — the stringified payload is the contract.
* array lanes add ``badCount``/``examples`` summaries and per-element
  lanes add ``index``/``value`` (+ ``innerIndex`` for nested ``a[*].b[*]``
  paths, compiler.py:241-449) — modeled as optional keys on every
  per-row family rather than reference-side unknown keys.
* codes the reference reserves but never emits (FHIR_ARRAY_EXPECTED …)
  are not carried; codes this engine adds beyond the reference (drift,
  expectation, outlier …) get first-class shapes of their own.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from .errors import ErrorCode

# element-lane keys any per-row predicate family may add
_ELEMENT = frozenset({"index", "value", "innerIndex"})
# array-summary lane keys (non-perElement array rules)
_ARRAY_SUMMARY = frozenset({"badCount", "examples"})


def _shape(required: Iterable[str] = (),
           optional: Iterable[str] = ()) -> dict[str, frozenset]:
    return {"required": frozenset(required), "optional": frozenset(optional)}


DETAILS_CONTRACT: dict[str, list[dict[str, frozenset]]] = {
    # --- per-row predicate family (ValidationErrorDetailsValidator.cs
    #     names where the reference defines the code) -------------------
    # ValidateRequiredFieldMissing (:188-198): {required: true} — this
    # engine's Required lane emits an EMPTY detail (absence needs no
    # payload); element lanes add index/value, and a non-perElement
    # Required on an array element path ('a[*].b') reports the array
    # summary {badCount, examples} like every other array rule
    # (round-5, advice item 2 — the summary lane was missing here and
    # a fully valid run failed --audit-details)
    ErrorCode.FIELD_REQUIRED: [_shape((), _ELEMENT | _ARRAY_SUMMARY)],
    # ValidateFixedValueMismatch (:182-186): {actual?, expected}
    ErrorCode.FIXED_VALUE_MISMATCH: [
        _shape(("expected",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT)],
    # ValidateValueNotAllowed (:122-133): {actual?, allowed, valueType}
    # (valueType folds into the stringified allowed list); TokenDomain
    # emits the same code with numeric domain bounds instead of a list
    ErrorCode.VALUE_NOT_ALLOWED: [
        _shape(("allowed",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT),
        _shape(("min", "maxExclusive"), _ARRAY_SUMMARY | _ELEMENT),
    ],
    # ValidatePatternMismatch (:174-180): {actual?, pattern, description?}
    ErrorCode.PATTERN_MISMATCH: [
        _shape(("pattern",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT)],
    # ValidateArrayLengthOutOfRange (:213-226): {min?, max?, actual}
    ErrorCode.ARRAY_LENGTH_OUT_OF_RANGE: [
        _shape(("min", "max", "actual"))],
    ErrorCode.ARRAY_LENGTH_VIOLATION: [
        _shape(("min", "max", "actual")),
        # the size(tokens)=n_tok invariant (rulesets.py INV-001) reports
        # this code from a CustomExpr lane
        _shape(("expression",))],
    ErrorCode.CUSTOM_CONDITION_FAILED: [_shape(("expression",))],
    ErrorCode.ANSWER_OUT_OF_RANGE: [
        _shape(("min", "max"), {"actual", "maxExclusive"}
               | _ARRAY_SUMMARY | _ELEMENT)],
    ErrorCode.MAX_LENGTH_EXCEEDED: [
        _shape(("maxLength",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT)],
    ErrorCode.PRECISION_VIOLATION: [
        _shape(("precision",), {"actual"} | _ELEMENT)],
    ErrorCode.INVALID_PRIMITIVE: [
        _shape(("dataType",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT),
        # grammar lanes that compile to Regex / CustomExpr but report the
        # primitive's code (grammars.py date calendar check)
        _shape(("pattern",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT),
        _shape(("expression",)),
        # the lenient-ingest lane (sources/ingest.corrupt_record_
        # violations): a strict-parse-rejected line reports its bounded
        # raw snippet — without this shape a run whose only "defect" is
        # a malformed input line failed --audit-details (round-5 review
        # batch 9)
        _shape(("raw",))],
    ErrorCode.VALUE_EXCLUSIVITY_VIOLATION: [
        _shape(("columns", "presentCount")),
        _shape(("expression",))],       # extension value[x] forall lane
    # extension grammar (T7, JsonNodeStructuralValidator.cs:1087-1208):
    # the url lane reports per element (index/value), the shape lane is a
    # forall CustomExpr
    "FHIR_EXTENSION_MISSING_URL": [_shape((), _ELEMENT | _ARRAY_SUMMARY)],
    "FHIR_EXTENSION_INVALID_SHAPE": [_shape(("expression",))],
    ErrorCode.INVALID_ENUM_VALUE: [
        _shape(("allowed",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT)],
    # ValidateEnumValidationSkipped (:154-173): Phase B.2 transparency
    # notice when a declared valueSet cannot be enforced
    ErrorCode.ENUM_VALIDATION_SKIPPED: [
        _shape(("valueSet", "bindingStrength", "reason"),
               {"downgradedFrom"})],
    # --- dataset / join family ----------------------------------------
    ErrorCode.DUPLICATE_KEY: [_shape(("count",))],
    # ValidateReferenceNotFound (:240-244): {reference, expectedType?} —
    # this engine keys the offending value as `value`
    ErrorCode.REFERENCE_NOT_FOUND: [
        _shape(("value",), {"column", "expectedTypes"})],
    # ValidateReferenceTypeMismatch (:246-258):
    # {reference, expectedTypes, actualType}
    ErrorCode.REFERENCE_TYPE_MISMATCH: [
        _shape(("value", "expectedTypes", "actualType"), {"column"})],
    ErrorCode.RESOURCE_REQUIREMENT_VIOLATION: [
        _shape(("expected", "actual"),
               {"missing", "outOfRange", "unexpected"})],
    ErrorCode.UNEXPECTED_RESOURCE: [
        _shape(("expected", "actual"),
               {"missing", "outOfRange", "unexpected"})],
    # --- terminology family -------------------------------------------
    # ValidateCodeNotInValueSet (:233-238): {system, code, valueSet} —
    # the Membership lane's `value` is the offending code; system/
    # valueSet live in the rule params, not per row
    ErrorCode.CODE_NOT_IN_VALUESET: [
        _shape(("value",), {"system", "index"})],
    # ValidateCodeSystemMismatch (:227-231): {expectedSystem, actualSystem?}
    ErrorCode.CODESYSTEM_MISMATCH: [
        _shape(("expectedSystem",), {"actualSystem", "index"})],
    ErrorCode.UNKNOWN_SCREENING_TYPE: [
        _shape((), {"value", "key", "screeningType"})],
    ErrorCode.MISSING_QUESTION_CODE: [_shape((), {"key"})],
    ErrorCode.INVALID_QUESTION_CODE: [
        _shape((), {"key", "value", "screeningType"})],
    ErrorCode.INVALID_ANSWER_VALUE: [
        _shape((), {"key", "value", "allowed", "index"})],
    ErrorCode.MULTIPLE_VALUES_NOT_ALLOWED: [
        _shape((), {"key", "count", "values"})],
    # question-rule dispatch codes (questions.py:61-63 — the reference's
    # QuestionAnswer vocabulary: ANSWER_REQUIRED / INVALID_ANSWER_TYPE /
    # ANSWER_NOT_IN_VALUESET reuse the Required / TypeCheck+Regex /
    # AllowedValues detail shapes under their own codes)
    "ANSWER_REQUIRED": [_shape((), _ELEMENT)],
    "INVALID_ANSWER_TYPE": [
        _shape(("dataType",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT),
        _shape(("pattern",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT)],
    "ANSWER_NOT_IN_VALUESET": [
        _shape(("allowed",), {"actual"} | _ARRAY_SUMMARY | _ELEMENT),
        _shape(("value",), {"system", "index"})],   # Membership lane
    # --- stats / drift / expectation family (north-rule additions) -----
    ErrorCode.DISTRIBUTION_DRIFT: [
        _shape(("psi", "ks"), {"jsd", "chi2", "ksCrit", "psiMax",
                               "jsdMax", "chi2Alpha", "mode",
                               "nBaseline", "nCurrent"})],
    ErrorCode.EXPECTATION_VIOLATION: [
        _shape(("checks", "failed"), {"observed"})],
    ErrorCode.OUTLIER_VALUE: [
        _shape(("method", "observed"), {"lo", "hi", "side", "k"})],
    ErrorCode.VECTOR_CHECK_FAILED: [
        _shape(("check",), {"dim", "size", "norm", "min", "max",
                            "observed"})],
    ErrorCode.SEQUENCE_SHAPE_VIOLATION: [
        _shape(("check",), {"bos", "eos", "pad", "first", "last",
                            "size", "observed"})],
    ErrorCode.JSON_PATH_VIOLATION: [
        _shape(("check", "path"), {"actual", "op", "expected"})],
    ErrorCode.AGGREGATE_MISMATCH: [
        _shape(("check",), {"agg", "on", "actual", "expected",
                            "nChildren"})],
    ErrorCode.GROUP_SHARE_VIOLATION: [
        _shape(("check", "share"), {"min", "max", "count", "total",
                                    "group", "n"})],
    ErrorCode.MONOTONICITY_VIOLATION: [
        _shape(("check", "observed", "prev"), {"key", "orderBy",
                                               "maxStep"})],
    ErrorCode.DISTINCT_BAND_VIOLATION: [
        _shape(("check", "distinct"), {"column", "group", "min", "max",
                                       "mode"})],
    ErrorCode.FUNCTIONAL_DEPENDENCY_VIOLATION: [
        _shape(("determinants",), {"dependent", "nValues", "minValue",
                                   "maxValue", "rows"})],
    ErrorCode.HEAVY_HITTER_VIOLATION: [
        _shape(("check", "value"), {"column", "k", "n", "countLo",
                                    "countHi", "shareLo", "errorBound",
                                    "maxShare", "maxCount"})],
}


def validate_details(error_code: str,
                     detail: Mapping[str, object] | None) -> list[str]:
    """Contract check for one violation's detail map.

    Mirrors the reference's runtime semantics
    (``ValidationErrorDetailsValidator.cs:47-120``): a missing/empty
    detail is fine (details are optional), an UNKNOWN error code returns
    a single ``unknown errorCode`` note (the reference logs and skips —
    callers decide severity), and a known code returns one message per
    missing required key / unexpected key, empty list when compliant.
    """
    shapes = DETAILS_CONTRACT.get(error_code)
    if shapes is None:
        return [f"unknown errorCode {error_code!r} - no details contract"]
    if not detail:
        return []
    keys = set(detail.keys())
    problems: list[str] = []
    for shape in shapes:
        missing = shape["required"] - keys
        extra = keys - shape["required"] - shape["optional"]
        if not missing and not extra:
            return []
        problems.append(
            f"variant requiring {sorted(shape['required'])}: "
            + "; ".join(
                ([f"missing required key(s) {sorted(missing)}"]
                 if missing else [])
                + ([f"unexpected key(s) {sorted(extra)}"]
                   if extra else [])))
    return [f"details {sorted(keys)} match no variant for "
            f"{error_code}: " + " | ".join(problems)]


_COMBO_CAP = 10_000


def contract_report(violations, limit: int = 20) -> list[dict]:
    """Driver-side audit of a violations DataFrame against the contract.

    Collects only the DISTINCT (error_code, key-set) combinations — a
    reduced frame bounded by |codes| x |lane shapes|, never by row count
    (safe at any scale) — and validates each. Returns a list of
    ``{"error_code", "keys", "problems", "unknown_code"}`` dicts for
    non-compliant combinations (empty = fully compliant).

    ``unknown_code=True`` marks codes with NO contract entry — the
    reference logs-and-skips these (``ValidationErrorDetailsValidator.cs
    :104-108``), so callers should treat them as warnings, not failures.
    If the distinct-combo count exceeds the safety cap (a pathological
    lane emitting data-derived detail keys), a ``<truncated>`` sentinel
    entry reports it rather than silently claiming full compliance.
    """
    from pyspark.sql import functions as F
    combos = (violations
              .select("error_code",
                      F.sort_array(F.map_keys("detail")).alias("keys"))
              .distinct()
              .limit(_COMBO_CAP + 1)
              .collect())
    out = []
    if len(combos) > _COMBO_CAP:
        combos = combos[:_COMBO_CAP]
        out.append({"error_code": "<truncated>", "keys": [],
                    "unknown_code": False,
                    "problems": [f"more than {_COMBO_CAP} distinct "
                                 f"(error_code, key-set) combinations — "
                                 f"audit truncated; a lane is emitting "
                                 f"data-derived detail keys"]})
    for row in combos:
        problems = validate_details(
            row["error_code"], {k: "" for k in (row["keys"] or [])})
        if problems:
            out.append({"error_code": row["error_code"],
                        "keys": list(row["keys"] or []),
                        "unknown_code":
                            row["error_code"] not in DETAILS_CONTRACT,
                        "problems": problems[:limit]})
    return out
