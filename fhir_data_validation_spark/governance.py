"""Rule-set governance review: pre-flight authoring checks over a RuleSet.

Analog of the reference's ``Governance/RuleReviewEngine.cs:35-964`` —
``Review`` (per-rule checks, ``:53-81``) and ``ReviewRuleSet`` (cross-rule
duplicate / conflict detection, ``:83-104``) — re-keyed to this engine's
column-oriented rule DSL. Each rule is graded ``APPROVED`` / ``WARNING`` /
``BLOCKED``; a BLOCKED finding predicts a ``RuleConfigurationError`` at
compile time (or a semantically-meaningless rule), a WARNING flags a rule
that will run but probably doesn't mean what its author intended.

Deliberately driver-side pure Python, like the reference service: rule
sets are authoring-scale (10^2–10^3 rules) — putting this on the cluster
would add a job per review for data that fits in one page. The *dataset*
side of linting (does the data match the schema the rules assume) lives in
:mod:`.lint`, which is Spark-side where it has to scan.

Deviations from the reference, by design:

- ``Reference`` / ``FullUrlIdMatch`` rules are BLOCKED by the reference's
  authoring layer (``RuleReviewEngine.cs:626-681``) because its runtime
  doesn't execute them; this engine executes both (SURVEY §2 J1–J3, R8),
  so they review like any other rule instead.
- The reference blocks ``min < max`` range mode for RequiredResources
  (``:521-555``, "no range support"); this engine's
  ``required_resources_plan`` supports true ranges, so range mode is
  reviewed as WARNING (intent flag) rather than BLOCKED.
- Schema-aware checks (``PatternOnNonString``, ``ArrayLengthOnNonArray``,
  path resolution) use the real DataFrame schema when one is supplied,
  instead of the reference's field-name heuristics
  (``RuleReviewEngine.cs:38-51``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Iterable, Mapping

from pyspark.sql.types import ArrayType, DataType, StringType, StructType

from .errors import RuleConfigurationError
from .model import RuleDefinition, RuleSet

# review statuses, most severe last (RuleReviewEngine.cs `RuleReviewStatus`)
APPROVED = "APPROVED"
WARNING = "WARNING"
BLOCKED = "BLOCKED"


@dataclass(frozen=True)
class ReviewIssue:
    """One governance finding (``Governance/RuleReviewEngine.cs`` —
    ``RuleReviewIssue(Code, Severity, RuleId, Facts)``)."""

    code: str
    severity: str  # WARNING | BLOCKED
    rule_id: str
    facts: Mapping[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class RuleReviewResult:
    """Per-rule verdict: worst severity across the rule's findings."""

    rule_id: str
    status: str  # APPROVED | WARNING | BLOCKED
    issues: tuple[ReviewIssue, ...] = ()


# rule types whose execution needs `column` (everything except the
# dataset-level / expression-level forms; Expectation is all
# dataset-stat checks, no column)
_NO_COLUMN_TYPES = {"CustomExpr", "RequiredResources", "Drift",
                    "ValueExclusivity", "Expectation"}
# types that take a column OR a params.columns sweep (Unique: composite
# keys; Reference: multi-column sweep) — keep in sync with the compile
# dispatch in plans/__init__.py or review blocks rules the engine runs
_COLUMNS_SWEEP_TYPES = {"Reference", "Unique"}

_KNOWN_TYPES = None  # resolved lazily from the compiler registry


def _known_types() -> frozenset[str]:
    global _KNOWN_TYPES
    if _KNOWN_TYPES is None:
        from .compiler import DEFAULT_ERROR_CODES
        _KNOWN_TYPES = frozenset(DEFAULT_ERROR_CODES)
    return _KNOWN_TYPES


def _resolve_type(rule: RuleDefinition, path: str,
                  schema: StructType) -> DataType | None:
    """Resolve a rule path against the schema using the compiler's own
    navigator, so governance and compile agree byte-for-byte on what is a
    valid path. Returns None (and lets the caller emit INVALID_FIELD_PATH)
    on failure instead of raising — review never aborts."""
    from .compiler import _field_type
    try:
        return _field_type(schema, path, rule)
    except RuleConfigurationError:
        return None


def review_rule(rule: RuleDefinition,
                schema: StructType | None = None) -> RuleReviewResult:
    """Review a single rule (``RuleReviewEngine.cs:53-81``).

    ``schema``, when given, upgrades the reference's name-pattern
    heuristics to real type checks against the DataFrame schema.
    """
    issues: list[ReviewIssue] = []
    t = rule.type

    if t not in _known_types():
        issues.append(ReviewIssue(
            "UNKNOWN_RULE_TYPE", BLOCKED, rule.id,
            {"ruleType": t, "known": sorted(_known_types())}))
        return RuleReviewResult(rule.id, BLOCKED, tuple(issues))

    # --- BLOCKED: empty column (CheckEmptyOrRootPath, :166-193) ---------
    needs_column = t not in _NO_COLUMN_TYPES
    # a sweep only counts when it is shaped the way compile accepts it —
    # a non-empty LIST (plans/__init__.py rejects e.g. a bare string);
    # review approving what compile raises on would defeat pre-flight
    sweep_val = rule.params.get("columns")
    has_sweep = (t in _COLUMNS_SWEEP_TYPES
                 and isinstance(sweep_val, list) and sweep_val)
    if needs_column and not rule.column and not has_sweep:
        issues.append(ReviewIssue(
            "EMPTY_FIELD_PATH", BLOCKED, rule.id,
            {"ruleType": t, "reason": "column is required for this rule type"}))
    if (t in _COLUMNS_SWEEP_TYPES and sweep_val is not None
            and not (isinstance(sweep_val, list) and sweep_val)):
        issues.append(ReviewIssue(
            "MALFORMED_COLUMNS_SWEEP", BLOCKED, rule.id,
            {"ruleType": t, "columns": sweep_val,
             "reason": "params.columns must be a non-empty list of "
                       "column names"}))
    if t == "Expectation":
        checks = rule.params.get("checks")
        if not (isinstance(checks, list) and checks):
            issues.append(ReviewIssue(
                "EXPECTATION_MISSING_CHECKS", BLOCKED, rule.id,
                {"missingParams": ["checks"],
                 "reason": "Expectation needs a non-empty params.checks "
                           "list of dataset-stat bounds"}))

    # --- BLOCKED: dim-backed rules missing their dim wiring -------------
    # (CheckQuestionAnswerWithoutQuestionSetId :195-218 /
    #  CheckCodeSystemParams :294-373 analogs)
    if t == "CodeSystem":
        missing = [p for p in ("dim", "systemColumn", "system")
                   if not rule.params.get(p)]
        if missing:
            issues.append(ReviewIssue(
                "CODESYSTEM_MISSING_PARAMS", BLOCKED, rule.id,
                {"missingParams": missing,
                 "reason": "CodeSystem rules need a CodeSet dim, the system "
                           "column to check, and the expected system value"}))
        if rule.params.get("codes"):
            issues.append(ReviewIssue(
                "CODESYSTEM_MANUAL_CODES_PROVIDED", WARNING, rule.id,
                {"reason": "manual codes[] restricts below the CodeSet — "
                           "advanced restriction mode only"}))
    elif t == "CodeMaster":
        missing = [p for p in ("dim", "keyColumn", "dimKey", "allowedColumn")
                   if not rule.params.get(p)]
        if missing:
            issues.append(ReviewIssue(
                "CODEMASTER_MISSING_PARAMS", BLOCKED, rule.id,
                {"missingParams": missing}))
        if rule.error_code:
            # runtime owns the answer-error vocabulary
            # (CheckQuestionAnswerProvidedErrorCode, :221-244)
            issues.append(ReviewIssue(
                "CODEMASTER_ERROR_CODE_IGNORED", WARNING, rule.id,
                {"providedErrorCode": rule.error_code,
                 "reason": "CodeMaster emits its own per-outcome codes "
                           "(UNKNOWN_SCREENING_TYPE, MISSING_QUESTION_CODE, "
                           "INVALID_QUESTION_CODE, INVALID_ANSWER_VALUE, "
                           "MULTIPLE_VALUES_NOT_ALLOWED)"}))
    elif t == "Membership" and not rule.params.get("dim"):
        issues.append(ReviewIssue(
            "MEMBERSHIP_MISSING_DIM", BLOCKED, rule.id,
            {"missingParams": ["dim"]}))
    elif t == "Drift":
        if not rule.params.get("baseline"):
            issues.append(ReviewIssue(
                "DRIFT_MISSING_BASELINE", BLOCKED, rule.id,
                {"missingParams": ["baseline"]}))
        mode = rule.params.get("mode", "numeric")
        if mode not in ("numeric", "tokenFrequency"):
            issues.append(ReviewIssue(
                "DRIFT_UNKNOWN_MODE", BLOCKED, rule.id, {"mode": mode}))
    elif t == "RequiredResources":
        issues.extend(_review_requirements(rule))
    elif t == "ValueExclusivity" and not rule.params.get("columns"):
        issues.append(ReviewIssue(
            "VALUE_EXCLUSIVITY_MISSING_COLUMNS", BLOCKED, rule.id,
            {"missingParams": ["columns"]}))
    elif t == "CustomExpr" and not (rule.expr or rule.params.get("expr")):
        issues.append(ReviewIssue(
            "CUSTOM_EXPR_MISSING_EXPRESSION", BLOCKED, rule.id,
            {"missingParams": ["expr"]}))

    # --- BLOCKED: malformed value constraints ---------------------------
    if t == "Regex":
        pattern = rule.params.get("pattern")
        if not pattern:
            issues.append(ReviewIssue(
                "REGEX_MISSING_PATTERN", BLOCKED, rule.id, {}))
        else:
            try:
                # shared Java/RE2 → Python probe translation — review and
                # parse must agree on which patterns are valid
                from .model import probe_pattern
                re.compile(probe_pattern(pattern))
            except re.error as exc:
                issues.append(ReviewIssue(
                    "REGEX_INVALID_PATTERN", BLOCKED, rule.id,
                    {"pattern": pattern, "error": str(exc)}))
    if t in ("Range", "ArrayLength"):
        lo, hi = rule.params.get("min"), rule.params.get("max")
        if lo is None and hi is None:
            issues.append(ReviewIssue(
                "RANGE_WITHOUT_BOUNDS", BLOCKED, rule.id,
                {"ruleType": t, "reason": "neither min nor max set — "
                                          "the rule can never fire"}))
        elif (lo is not None and hi is not None
              and not isinstance(lo, bool) and not isinstance(hi, bool)
              and isinstance(lo, (int, float)) and isinstance(hi, (int, float))
              and lo > hi):
            issues.append(ReviewIssue(
                "RANGE_MIN_ABOVE_MAX", BLOCKED, rule.id,
                {"min": lo, "max": hi}))
    if t == "Enum":
        binding = rule.params.get("binding")
        # review must predict compile: _apply_enum_binding raises on
        # unknown strengths — same registry, no hand-synced list
        from .compiler import BINDING_SEVERITY
        if binding is not None and binding not in BINDING_SEVERITY:
            issues.append(ReviewIssue(
                "ENUM_INVALID_BINDING", BLOCKED, rule.id,
                {"binding": binding,
                 "known": sorted(BINDING_SEVERITY)}))
    if t in ("AllowedValues", "Enum"):
        values = rule.params.get("values")
        if not values and t == "Enum" and rule.params.get("valueSet"):
            # Phase B.2: a declared-but-unresolved valueSet compiles to a
            # single ENUM_VALIDATION_SKIPPED notice — legal, but the
            # author should know the enum is NOT being enforced
            from .compiler import notice_cap
            b = rule.params.get("binding")
            # an UNKNOWN binding already produced the BLOCKED
            # ENUM_INVALID_BINDING issue above — describing a skip
            # emission for an uncompilable rule would contradict it
            # (round-5 review batch 4)
            if b is None or b in BINDING_SEVERITY:
                cap = notice_cap(b, rule.id)
                issues.append(ReviewIssue(
                    "ENUM_VALUESET_UNRESOLVED", WARNING, rule.id,
                    {"valueSet": rule.params["valueSet"],
                     "reason": ("no values[] for this valueSet — the run "
                                "emits NOTHING for this rule (skip "
                                "notices are suppressed for missing/"
                                "'example' bindings)" if cap is None else
                                "no values[] for this valueSet — the run "
                                "will emit one ENUM_VALIDATION_SKIPPED "
                                "notice (capped at " + cap + " severity) "
                                "instead of enforcing the binding")}))
        elif not values:
            issues.append(ReviewIssue(
                "ALLOWED_VALUES_EMPTY", BLOCKED, rule.id,
                {"ruleType": t, "reason": "empty values[] rejects every row"}))
    if t == "TokenDomain":
        missing = [p for p in ("min", "maxExclusive")
                   if rule.params.get(p) is None]
        if missing:
            issues.append(ReviewIssue(
                "TOKEN_DOMAIN_MISSING_BOUNDS", BLOCKED, rule.id,
                {"missingParams": missing}))
    if t == "FixedValue" and "value" not in rule.params:
        # the reference grades this WARNING (CheckFixedValueWithoutConstraints,
        # :747-760); here compile raises, so review predicts BLOCKED
        issues.append(ReviewIssue(
            "FIXED_VALUE_WITHOUT_CONSTRAINTS", BLOCKED, rule.id,
            {"missingParams": ["value"]}))

    # --- BLOCKED: custom errorCode outside the frozen details contract --
    # (ValidationErrorDetailsValidator.cs:1-12: "DO NOT add new errorCodes
    # without schema definition" — an override to a code with no declared
    # details schema would emit violations no consumer can interpret;
    # overrides to any CONTRACTED code are fine, the rule family's detail
    # shape is validated against that code's variants at runtime)
    if rule.error_code and t != "CodeMaster":   # CodeMaster ignores it (above)
        from .details_contract import DETAILS_CONTRACT
        if rule.error_code not in DETAILS_CONTRACT:
            issues.append(ReviewIssue(
                "CUSTOM_ERROR_CODE_NO_CONTRACT", BLOCKED, rule.id,
                {"errorCode": rule.error_code,
                 "known": sorted(DETAILS_CONTRACT),
                 "reason": "errorCode override names a code with no "
                           "frozen details schema "
                           "(ValidationErrorDetailsValidator contract)"}))

    # --- schema-aware checks (upgrade of the name heuristics :38-51) ----
    if schema is not None and rule.column and needs_column:
        leaf = _resolve_type(rule, rule.column, schema)
        if leaf is None:
            issues.append(ReviewIssue(
                "INVALID_FIELD_PATH", BLOCKED, rule.id,
                {"column": rule.column,
                 "reason": "path does not resolve against the input schema"}))
        else:
            el = leaf.elementType if isinstance(leaf, ArrayType) else leaf
            if t == "Regex" and not isinstance(el, StringType):
                # CheckPatternOnNonString (:688-701)
                issues.append(ReviewIssue(
                    "PATTERN_ON_NON_STRING", BLOCKED, rule.id,
                    {"column": rule.column, "actualType": leaf.simpleString()}))
            if t == "ArrayLength" and not isinstance(leaf, ArrayType):
                # CheckArrayLengthOnNonArray (:704-717)
                issues.append(ReviewIssue(
                    "ARRAYLENGTH_ON_NON_ARRAY", BLOCKED, rule.id,
                    {"column": rule.column, "actualType": leaf.simpleString()}))

    # --- WARNING: suspicious-but-legal shapes ---------------------------
    if rule.column and rule.column.endswith("[*]"):
        # terminal [*] is a no-op traversal (CheckGenericWildcardPaths, :725-745)
        issues.append(ReviewIssue(
            "TERMINAL_WILDCARD_PATH", WARNING, rule.id,
            {"column": rule.column,
             "reason": "trailing [*] does not change what is validated — "
                       "did you mean a per-element leaf path?"}))
    if rule.scope.kind == "filter" and not rule.scope.condition:
        issues.append(ReviewIssue(
            "FILTER_SCOPE_WITHOUT_CONDITION", BLOCKED, rule.id, {}))

    return RuleReviewResult(rule.id, _status(issues), tuple(issues))


def _review_requirements(rule: RuleDefinition) -> list[ReviewIssue]:
    """RequiredResources config review
    (CheckRequiredResourcesConfiguration, ``RuleReviewEngine.cs:416-590``)."""
    issues: list[ReviewIssue] = []
    reqs = rule.params.get("requirements")
    if not isinstance(reqs, list) or not reqs:
        issues.append(ReviewIssue(
            "REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED, rule.id,
            {"reason": "missing or empty 'requirements' array"}))
        return issues
    seen: set[str] = set()
    for i, req in enumerate(reqs):
        if not isinstance(req, dict) or not req.get("source"):
            issues.append(ReviewIssue(
                "REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED, rule.id,
                {"requirementIndex": i,
                 "reason": "missing 'source' (group value) in requirement"}))
            continue
        src = str(req["source"])
        if src in seen:
            issues.append(ReviewIssue(
                "REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED, rule.id,
                {"source": src, "reason": "duplicate source in requirements"}))
        seen.add(src)
        lo, hi = req.get("min"), req.get("max")
        if lo is None:
            # required_resources_plan reads req["min"] unconditionally
            issues.append(ReviewIssue(
                "REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED, rule.id,
                {"source": src, "reason": "requirement must specify 'min'"}))
            continue
        for w in req.get("where", ()):
            if not isinstance(w, dict) or w.get("op", "=") not in (
                    "=", "!=", "contains", "in"):
                issues.append(ReviewIssue(
                    "REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED, rule.id,
                    {"source": src, "where": w,
                     "reason": "where op must be one of = != contains in"}))
        if isinstance(lo, int) and lo < 1:
            issues.append(ReviewIssue(
                "REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED, rule.id,
                {"source": src, "min": lo,
                 "reason": "min must be >= 1 (use max-only for caps)"}))
        if (isinstance(lo, int) and isinstance(hi, int)):
            if hi < lo:
                issues.append(ReviewIssue(
                    "REQUIRED_RESOURCES_INVALID_CONFIG", BLOCKED, rule.id,
                    {"source": src, "min": lo, "max": hi,
                     "reason": "max < min is unsatisfiable"}))
            elif hi > lo:
                # reference blocks range mode outright (:521-555); this
                # engine executes it, so flag intent instead
                issues.append(ReviewIssue(
                    "REQUIRED_RESOURCES_RANGE_MODE", WARNING, rule.id,
                    {"source": src, "min": lo, "max": hi,
                     "reason": "range mode (min < max) — the reference "
                               "contract is min-only or exact counts"}))
    return issues


def review_ruleset(ruleset: RuleSet | Iterable[RuleDefinition],
                   schema: StructType | None = None
                   ) -> list[RuleReviewResult]:
    """Review every rule plus the cross-rule checks
    (``RuleReviewEngine.cs:83-104``): duplicate rules, same-column
    error-code conflicts, multiple RequiredResources rules."""
    rules = list(ruleset.rules if isinstance(ruleset, RuleSet) else ruleset)
    results = {r.id: review_rule(r, schema) for r in rules}

    extra: dict[str, list[ReviewIssue]] = {r.id: [] for r in rules}

    # WARNING: duplicate rules — same behavior key (CheckDuplicateRules,
    # :761-810). First occurrence wins; later ones are flagged.
    def _identity(r: RuleDefinition):
        return (r.type, r.source, r.column or "",
                r.scope.kind, r.scope.condition or "",
                tuple(sorted((k, repr(v)) for k, v in r.params.items())))
    first_by_key: dict[Any, str] = {}
    for r in rules:
        key = _identity(r)
        if key in first_by_key:
            extra[r.id].append(ReviewIssue(
                "DUPLICATE_RULE", WARNING, r.id,
                {"duplicateOf": first_by_key[key]}))
        else:
            first_by_key[key] = r.id

    # WARNING: same (column, scope, source), different EXPLICIT error code
    # (CheckPathErrorCodeConflicts, :865-941 — rules without an authored
    # errorCode are exempt: type-default codes differing on a shared
    # column is the normal layered-rules shape, not a conflict)
    by_field: dict[Any, list[RuleDefinition]] = {}
    for r in rules:
        if r.column and r.error_code:
            by_field.setdefault(
                (r.column, r.source, r.scope.kind, r.scope.condition),
                []).append(r)
    for key, group in by_field.items():
        codes = {r.id: r.error_code for r in group}
        if len(set(codes.values())) > 1:
            for r in group:
                extra[r.id].append(ReviewIssue(
                    "FIELD_ERROR_CODE_CONFLICT", WARNING, r.id,
                    {"column": key[0], "source": key[1],
                     "thisErrorCode": codes[r.id],
                     "errorCodes": sorted(set(codes.values()))}))

    # BLOCKED: more than one RequiredResources rule per source
    # (CheckSingleRequiredResourcesRule, :812-860)
    rr = [r for r in rules if r.type == "RequiredResources"]
    rr_by_source: dict[str, list[RuleDefinition]] = {}
    for r in rr:
        rr_by_source.setdefault(r.source, []).append(r)
    for src, group in rr_by_source.items():
        if len(group) > 1:
            for r in group[1:]:
                extra[r.id].append(ReviewIssue(
                    "DUPLICATE_BUNDLE_RESOURCE_RULE", BLOCKED, r.id,
                    {"source": src, "firstRule": group[0].id}))

    out = []
    for r in rules:
        base = results[r.id]
        issues = base.issues + tuple(extra[r.id])
        out.append(RuleReviewResult(r.id, _status(list(issues)), issues))
    return out


def _status(issues: list[ReviewIssue]) -> str:
    if any(i.severity == BLOCKED for i in issues):
        return BLOCKED
    if any(i.severity == WARNING for i in issues):
        return WARNING
    return APPROVED


def review_report(results: Iterable[RuleReviewResult]) -> dict[str, Any]:
    """Summary payload: counts by status plus the flat issue list —
    the ``ReviewRuleSet`` response shape, for CLI / API surfacing."""
    results = list(results)
    by_status = {APPROVED: 0, WARNING: 0, BLOCKED: 0}
    for r in results:
        by_status[r.status] += 1
    return {
        "ruleCount": len(results),
        "approved": by_status[APPROVED],
        "warnings": by_status[WARNING],
        "blocked": by_status[BLOCKED],
        "canExport": by_status[BLOCKED] == 0,
        "issues": [
            {"ruleId": i.rule_id, "code": i.code, "severity": i.severity,
             "facts": dict(i.facts)}
            for r in results for i in r.issues],
    }
