"""Dataset lint: advisory schema-conformance findings over an input
DataFrame, before (or instead of) a full validation run.

Analog of the reference's ``Authoring/LintValidationService.cs:23-974``
(full-mode advisory pass — unknown elements ``:723-810``, missing required
fields ``:813-916``, version/type compatibility ``:919-974``), re-keyed
from recursive FHIR-schema JSON walking to DataFrame schema comparison.
Like the reference's service it is *best-effort and advisory*: findings
never block a run, and ``validate`` does not depend on them.

Structural altitude: schema-vs-schema checks are driver-side (two schemas
fit in memory; launching a cluster job to diff them would be padding). The
only data-touching check is gated behind ``scan=True`` and costs exactly
ONE aggregation pass over the input regardless of rule count — the same
fused-agg shape as :func:`..stats.profile`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, ByteType, DataType, DoubleType,
                               FloatType, IntegerType, LongType, ShortType,
                               StringType, StructType)

from .model import RuleDefinition, RuleSet

INFO = "info"
WARNING = "warning"
ERROR = "error"


@dataclass(frozen=True)
class LintFinding:
    """One advisory finding (the reference's ``QualityFinding`` shape:
    code + message + details, ``LintValidationService.cs:80-184``)."""

    code: str
    severity: str  # info | warning | error
    column: str | None
    message: str
    facts: Mapping[str, Any] = field(default_factory=dict)


def referenced_columns(ruleset: RuleSet | Iterable[RuleDefinition]
                       ) -> set[str]:
    """Top-level physical columns a rule set reads — ``rule.column`` plus
    every params-carried column (Reference sweeps, CodeSystem system
    columns, CodeMaster key/multi-value/screening columns,
    ValueExclusivity column lists)."""
    rules = list(ruleset.rules if isinstance(ruleset, RuleSet) else ruleset)
    cols: set[str] = set()
    for r in rules:
        if r.column:
            cols.add(r.column)
        # round-5 review batch 10: orderBy / by / determinants / the
        # AggConsistency join key were missed, so lint reported clean
        # datasets the compiler rejects with INVALID_FIELD_PATH. NOTE:
        # "on" is DIM-side for Reference/Membership but INPUT-side for
        # AggConsistency; "valueColumn" is always dim-side — excluded.
        input_params = ["systemColumn", "keyColumn", "multiValueColumn",
                        "screeningColumn", "typeColumn", "orderBy", "by"]
        if r.type == "AggConsistency":
            input_params.append("on")
        for p in input_params:
            v = r.params.get(p)
            if isinstance(v, str):
                cols.add(v)
        for p in ("columns", "determinants"):
            v = r.params.get(p)
            if isinstance(v, (list, tuple)):
                cols.update(c for c in v if isinstance(c, str))
    # physical top-level name: "a[*].b.c" reads column "a"
    return {c.replace("[*]", "").split(".")[0] for c in cols}


# widenings that lose nothing: the engine's casts absorb these silently
_SAFE_WIDENING = {
    (ByteType, ShortType), (ByteType, IntegerType), (ByteType, LongType),
    (ShortType, IntegerType), (ShortType, LongType),
    (IntegerType, LongType), (FloatType, DoubleType),
}


def _compatible(actual: DataType, expected: DataType) -> str:
    """"same" | "widens" | "mismatch" for a column type pair."""
    if actual == expected:
        return "same"
    if isinstance(actual, ArrayType) and isinstance(expected, ArrayType):
        # array compatibility is elementwise recursion, nothing more
        return _compatible(actual.elementType, expected.elementType)
    if (type(actual), type(expected)) in _SAFE_WIDENING:
        return "widens"
    return "mismatch"


def lint_dataset(df: DataFrame,
                 ruleset: RuleSet | Iterable[RuleDefinition] | None = None,
                 expected_schema: StructType | None = None,
                 scan: bool = False) -> list[LintFinding]:
    """Advisory lint of ``df`` against an expected schema and/or rule set.

    Driver-side findings:

    - ``UNKNOWN_ELEMENT`` (info): a column of ``df`` absent from
      ``expected_schema`` — parses fine, but strict consumers may reject
      it (``LintValidationService.cs:723-810``).
    - ``MISSING_REQUIRED_FIELD`` (error): a column the rule set (or
      expected schema) requires that ``df`` lacks — compile would raise
      ``INVALID_FIELD_PATH`` (``:813-916``).
    - ``TYPE_MISMATCH`` (warning) / ``TYPE_WIDENS`` (info): declared type
      differs from the expected one (``:919-974`` version-compat analog).

    With ``scan=True``, one fused aggregation adds data-backed findings
    over the rule-referenced columns only:

    - ``ALL_NULL_COLUMN`` (warning): rule-referenced column is 100 % null
      — a Required rule would flag every row, which usually means the
      wrong input, not bad data.
    - ``CONSTANT_COLUMN`` (info): non-null values are all identical.
    """
    findings: list[LintFinding] = []
    actual = {f_.name: f_.dataType for f_ in df.schema.fields}
    needed = referenced_columns(ruleset) if ruleset is not None else set()

    if expected_schema is not None:
        expected = {f_.name: f_.dataType for f_ in expected_schema.fields}
        for name in actual:
            if name not in expected:
                findings.append(LintFinding(
                    "UNKNOWN_ELEMENT", INFO, name,
                    f"column {name!r} is not in the expected schema",
                    {"actualType": actual[name].simpleString(),
                     "disclaimer": "best-effort portability check"}))
        for name, etype in expected.items():
            if name not in actual:
                sev = ERROR if name in needed else WARNING
                findings.append(LintFinding(
                    "MISSING_REQUIRED_FIELD", sev, name,
                    f"expected column {name!r} is missing from the input",
                    {"expectedType": etype.simpleString(),
                     "referencedByRules": name in needed}))
            else:
                verdict = _compatible(actual[name], etype)
                if verdict == "widens":
                    findings.append(LintFinding(
                        "TYPE_WIDENS", INFO, name,
                        f"column {name!r} is {actual[name].simpleString()}, "
                        f"narrower than expected "
                        f"{etype.simpleString()} — safe to widen",
                        {"actualType": actual[name].simpleString(),
                         "expectedType": etype.simpleString()}))
                elif verdict == "mismatch":
                    findings.append(LintFinding(
                        "TYPE_MISMATCH", WARNING, name,
                        f"column {name!r} is {actual[name].simpleString()}, "
                        f"expected {etype.simpleString()}",
                        {"actualType": actual[name].simpleString(),
                         "expectedType": etype.simpleString()}))

    # rule-referenced columns missing outright — skipping any already
    # reported by the expected-schema loop above (one defect, one
    # finding; the overlap double-counted errors — round-5 review
    # batch 10)
    already = {f_.column for f_ in findings
               if f_.code == "MISSING_REQUIRED_FIELD"}
    for name in sorted(needed - set(actual) - already):
        findings.append(LintFinding(
            "MISSING_REQUIRED_FIELD", ERROR, name,
            f"rule-referenced column {name!r} is missing from the input",
            {"referencedByRules": True}))

    if scan:
        findings.extend(_scan_findings(df, sorted(needed & set(actual))))
    return findings


def _scan_findings(df: DataFrame, cols: list[str]) -> list[LintFinding]:
    """ONE aggregation job over all inspected columns: null counts +
    distinct-ish counts fused into a single pass (map-side combine; no
    per-column jobs, no collect of data rows)."""
    if not cols:
        return []
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"_nn_{i}"))
        aggs.append(F.approx_count_distinct(F.col(c)).alias(f"_d_{i}"))
    row = df.agg(*aggs).collect()[0]
    out: list[LintFinding] = []
    total = row["_n"]
    for i, c in enumerate(cols):
        nonnull, distinct = row[f"_nn_{i}"], row[f"_d_{i}"]
        if total and nonnull == 0:
            out.append(LintFinding(
                "ALL_NULL_COLUMN", WARNING, c,
                f"rule-referenced column {c!r} is entirely null",
                {"rows": total}))
        elif nonnull and distinct <= 1:
            out.append(LintFinding(
                "CONSTANT_COLUMN", INFO, c,
                f"column {c!r} has a single distinct non-null value",
                {"rows": total, "nonNull": nonnull}))
    return out


def lint_report(findings: Iterable[LintFinding]) -> dict[str, Any]:
    """Summary payload mirroring :func:`..governance.review_report`."""
    findings = list(findings)
    by_sev = {INFO: 0, WARNING: 0, ERROR: 0}
    for f_ in findings:
        by_sev[f_.severity] += 1
    return {
        "findingCount": len(findings),
        "info": by_sev[INFO],
        "warnings": by_sev[WARNING],
        "errors": by_sev[ERROR],
        "findings": [
            {"code": f_.code, "severity": f_.severity, "column": f_.column,
             "message": f_.message, "facts": dict(f_.facts)}
            for f_ in findings],
    }
