"""Spec hints: advisory data-vs-contract findings, never blocking.

Analog of the reference's SpecHint surface —
``Authoring/SpecHintService.cs:48-143`` (check the DATA against a spec
catalog of required/conditionally-required fields; "non-blocking and
non-enforcing — purely informational", always runs even when parsing
fails) and ``Authoring/Hl7SpecHintGenerator.cs`` (auto-generate the
catalog from HL7 StructureDefinitions, with a manual-catalog fallback) —
re-keyed from FHIR spec metadata to this engine's world:

* the **catalog source** is the table's own contract: :func:`generate`
  derives :class:`SpecHint` entries from a ``StructType`` (non-nullable
  fields ⇒ presence hints — the StructureDefinition ``min=1`` analog)
  and/or a manual contract mapping (the reference's JSON-catalog
  fallback);
* the **check** is :func:`scan` — ONE fused aggregation pass over the
  input (the :func:`~.plans.expectation_report` shape: every hint's
  counters ride the same map-side-combined groupBy, shuffle = O(groups),
  never O(rows)) emitting one advisory row per ``(group, hint)``;
* **advisory means advisory**: the output is a report DataFrame of
  counts + a bounded witness id, distinct from the engine's violations —
  nothing here feeds ``ValidationResult.passed()``. Bounded state by
  construction: no id lists, just ``min(key)`` as the witness (the
  100-TB rule the dedup family follows).

Conditional hints (``condition=``) mirror the reference's
FHIRPath-gated hints (``SpecHintService.cs`` conditional lane): only
rows satisfying the condition are checked. ``applies_to_each`` mirrors
``AppliesToEach``: for an array path, flag rows where ANY element is
missing/empty rather than only a missing array.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StringType, StructType

from .compiler import _field_type, _nonempty, _safe_expr, _spark_path
from .errors import ErrorCode, RuleConfigurationError
from .model import RuleDefinition

_SEVERITIES = ("warning", "info")


@dataclass(frozen=True)
class SpecHint:
    """One advisory expectation: ``path`` should be present (non-null,
    non-empty) — for every row of ``source`` (``"*"`` = all groups),
    optionally only where ``condition`` (a SQL expression) holds."""

    path: str
    reason: str
    severity: str = "warning"
    source: str = "*"
    condition: str | None = None
    applies_to_each: bool = False

    def __post_init__(self):
        if self.severity not in _SEVERITIES:
            raise ValueError(f"spec-hint severity must be one of "
                             f"{_SEVERITIES}, got {self.severity!r} "
                             "(advisory only — errors belong to rules)")


def generate(schema: StructType,
             contract: Mapping[str, Mapping] | None = None
             ) -> list[SpecHint]:
    """Auto-generate a hint catalog (the ``Hl7SpecHintGenerator`` analog).

    From the schema: every non-nullable top-level field gets a presence
    hint (``min=1`` in StructureDefinition terms; empty string / empty
    array count as missing, the engine's Required convention). From
    ``contract`` (the manual-catalog fallback): ``{path: {reason,
    severity?, source?, condition?, appliesToEach?}}`` entries are added
    verbatim — paths may be nested/element paths the schema walk does not
    enumerate.
    """
    hints = [
        SpecHint(path=f.name,
                 reason=f"schema declares {f.name!r} non-nullable")
        for f in schema.fields if not f.nullable
    ]
    for path, spec in (contract or {}).items():
        hints.append(SpecHint(
            path=path,
            reason=spec.get("reason", f"contract requires {path!r}"),
            severity=spec.get("severity", "warning"),
            source=spec.get("source", "*"),
            condition=spec.get("condition"),
            applies_to_each=bool(spec.get("appliesToEach", False))))
    return hints


def _presence(path: str, dtype: DataType, applies_to_each: bool):
    """(checkable) presence column for one hint. For ``applies_to_each``
    array paths the row fails when the array is missing/empty OR any
    element is null/empty."""
    col = F.col(_spark_path(path))
    present = _nonempty(col, dtype)
    if applies_to_each:
        if not isinstance(dtype, ArrayType):
            raise RuleConfigurationError(
                "<spec-hint>", ErrorCode.RULE_CONFIGURATION_ERROR,
                f"appliesToEach hint on non-array path {path!r} "
                f"({dtype.simpleString()})")
        elem_ok = ((lambda x: x.isNotNull() & (F.trim(x) != ""))
                   if isinstance(dtype.elementType, StringType)
                   else (lambda x: x.isNotNull()))
        present = present & F.forall(col, elem_ok)
    return present


def scan(df: DataFrame, hints: Iterable[SpecHint],
         key_col: str = "doc_id", group_col: str = "source") -> DataFrame:
    """Advisory spec-hint report: one row per ``(group, hint)`` with
    ``(source, path, reason, severity, conditional, n_missing, n_checked,
    witness)`` — ``witness`` is the smallest failing key (bounded state;
    at corpus scale join it back for the full failing set when a hint
    fires). Hints with ``n_missing = 0`` still report (the reader sees
    coverage, not just failures).

    One fused aggregation: every hint contributes three conditional
    aggregates to a single map-side-combined ``groupBy(group_col)``; the
    scan never runs per hint. Paths are resolved against the schema at
    build time — an unknown path raises here, before any job (the
    reference loads its catalog up front too).
    """
    hints = list(hints)
    if not hints:
        raise ValueError("scan needs at least one SpecHint")
    schema = df.schema
    aggs = []
    for i, h in enumerate(hints):
        probe = RuleDefinition(id=f"<spec-hint:{h.path}>", type="Required",
                               params={})
        dtype = _field_type(schema, h.path, probe)
        present = _presence(h.path, dtype, h.applies_to_each)
        checked = F.lit(True)
        if h.source != "*":
            checked = F.col(group_col) == F.lit(h.source)
        if h.condition:
            checked = checked & F.coalesce(
                _safe_expr(probe, h.condition), F.lit(False))
        miss = checked & ~F.coalesce(present, F.lit(False))
        aggs += [
            F.sum(F.when(miss, 1).otherwise(0)).alias(f"_m{i}"),
            F.sum(F.when(checked, 1).otherwise(0)).alias(f"_c{i}"),
            F.min(F.when(miss, F.col(key_col))).alias(f"_w{i}"),
        ]
    agg = df.groupBy(F.col(group_col).alias("source")).agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(h.path).alias("path"),
                 F.lit(h.reason).alias("reason"),
                 F.lit(h.severity).alias("severity"),
                 F.lit(h.condition is not None).alias("conditional"),
                 F.col(f"_m{i}").alias("n_missing"),
                 F.col(f"_c{i}").alias("n_checked"),
                 F.col(f"_w{i}").cast("string").alias("witness"))
        for i, h in enumerate(hints)])
    return (agg.select("source", F.explode(rows).alias("_h"))
            .select("source", "_h.*")
            .where(F.col("n_checked") > 0))
