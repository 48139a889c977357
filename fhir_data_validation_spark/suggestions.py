"""Rule suggestion: profile a snapshot → draft rules (RuleSuggestion).

The reference's detector suite
(``RuleSuggestion/Detectors/RuleDetectors.cs``: FixedValueDetector
``:130-160``, AllowedValuesDetector ``:86-125``, RegexDetector ``:13-80``)
re-expressed as a two-pass Spark profiler:

* **pass 1** — one aggregation over the (optionally sampled) table:
  per-column non-null counts, approx distinct, numeric min/max. Shuffle =
  columns × groups, never rows.
* **pass 2** — only for columns pass 1 proved eligible: exact tiny value
  sets (approx distinct ≤ ``max_set_size`` ⇒ bounded ``collect_set``) and
  candidate-regex match counts for string columns, again one fused
  aggregation.

Detectors (driver-side, over the reduced profile):

* FixedValue — one distinct value across ≥ ``min_samples`` observations
  (``:136-160``),
* AllowedValues — 2..``max_set_size`` distinct values (``:90-125``),
* Required — zero nulls observed,
* Unique — distinct ≈ rows (key-like),
* Range — numeric observed [min, max] envelope,
* Regex — every non-null value matches a registry pattern (``:20-80``;
  registry here: id grammar, UUID, ISO date, integer-string).

Suggestions are **drafts for a human**, exactly like the reference's
(confidence + rationale + sample size); each carries a ready-to-parse
``rule`` dict. Observed-envelope rules (Range/AllowedValues/FixedValue)
describe THIS snapshot — confidence stays below 1 because future data may
legitimately widen.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

# candidate pattern registry (RegexPatternRegistry analog — public
# grammars), MOST SPECIFIC FIRST: every uuid/date/integer string also
# matches the permissive id grammar, so the first hit must be the tightest
# \z anchors (not $) for the same reason as grammars.PRIMITIVE_GRAMMARS:
# Java's $ matches before a trailing newline, so dirty values ending in
# "\n" would count as matching and the suggester would claim a clean
# grammar for dirty data. The 'id' pattern is SHARED with the grammar
# registry so a fix there propagates here.
from .grammars import PRIMITIVE_GRAMMARS as _GRAMMARS  # noqa: E402

REGEX_REGISTRY: dict[str, str] = {
    "uuid": (r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-"
             r"[0-9a-f]{4}-[0-9a-f]{12}\z"),
    "isoDate": r"^\d{4}-\d{2}-\d{2}\z",
    "integerString": r"^[+-]?\d+\z",
    "id": _GRAMMARS["id"]["pattern"],
}


def suggest_rules(df: DataFrame, columns: list[str] | None = None,
                  max_set_size: int = 5, min_samples: int = 20,
                  unique_rsd: float = 0.02,
                  sample_fraction: float | None = None,
                  seed: int = 42) -> list[dict[str, Any]]:
    """Profile ``df`` and return rule-suggestion dicts:
    ``{rule, detector, confidence, rationale, sampleSize}``."""
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    fields = [f for f in df.schema.fields
              if (columns is None or f.name in columns)
              and isinstance(f.dataType, (NumericType, StringType))]
    if not fields:
        return []

    aggs = [F.count(F.lit(1)).alias("_rows")]
    for f in fields:
        c = F.col(f.name)
        aggs += [F.count(c).alias(f"{f.name}__n"),
                 F.approx_count_distinct(c, 0.01).alias(f"{f.name}__ad")]
        if isinstance(f.dataType, NumericType):
            aggs += [F.min(c).alias(f"{f.name}__min"),
                     F.max(c).alias(f"{f.name}__max")]
    p1 = df.agg(*aggs).collect()[0]
    n_rows = p1["_rows"]

    # pass 2: exact small sets + regex hit counts, only where eligible
    aggs2 = []
    set_cols, rx_cols = [], []
    for f in fields:
        eligible_set = (p1[f"{f.name}__n"] >= min_samples
                        and p1[f"{f.name}__ad"] <= max_set_size)
        if eligible_set:
            set_cols.append(f.name)
            # NATIVE-typed values: the suggested params must compile
            # against the column's type family, so numeric columns keep
            # numeric value sets
            aggs2.append(F.slice(F.sort_array(F.collect_set(
                F.col(f.name))), 1, max_set_size + 1)
                .alias(f"{f.name}__set"))
        # closed-set columns get AllowedValues/FixedValue — their regex
        # counts would be gated out anyway, skip the per-row rlike work
        if isinstance(f.dataType, StringType) and not eligible_set \
                and p1[f"{f.name}__n"] >= min_samples:
            rx_cols.append(f.name)
            for rx_name, rx in REGEX_REGISTRY.items():
                aggs2.append(F.count(F.when(
                    F.col(f.name).rlike(rx), 1))
                    .alias(f"{f.name}__rx__{rx_name}"))
    p2 = df.agg(*aggs2).collect()[0] if aggs2 else {}

    out: list[dict[str, Any]] = []

    def add(detector, rule, confidence, rationale, sample):
        out.append({"rule": rule, "detector": detector,
                    "confidence": round(confidence, 2),
                    "rationale": rationale, "sampleSize": sample})

    for f in fields:
        name = f.name
        n = p1[f"{name}__n"]
        if n < min_samples:
            continue
        ad = p1[f"{name}__ad"]
        # Required: no nulls observed (sampleSize == rows)
        if n == n_rows:
            add("RequiredDetector",
                {"id": f"SUG-REQ-{name}", "type": "Required",
                 "column": name},
                0.9, f"no nulls in {n_rows} observed rows", n_rows)
        # Unique: distinct ≈ rows within the sketch's error band
        if n == n_rows and ad >= n_rows * (1 - unique_rsd) and n_rows > 1:
            add("UniqueDetector",
                {"id": f"SUG-UNQ-{name}", "type": "Unique",
                 "column": name},
                0.7, f"~{ad} distinct values over {n_rows} rows — key-like",
                n_rows)
        values = list(p2[f"{name}__set"]) if name in set_cols else None
        if values is not None:
            # collected decimal.Decimal values must become plain floats
            # (like RangeDetector's float()) or the emitted dict breaks
            # the 'ready-to-parse rule' contract — the compiler's value
            # comparability check only accepts int/float for numeric
            # columns (round-5 review batch 10)
            import decimal
            values = [float(v) if isinstance(v, decimal.Decimal) else v
                      for v in values]
        if values is not None and len(values) == 1:
            add("FixedValueDetector",
                {"id": f"SUG-FIX-{name}", "type": "FixedValue",
                 "column": name, "params": {"value": values[0]}},
                0.85,
                f"all {n} observed values identical — appears to be a "
                "fixed/constant field", n)
        elif values is not None and 2 <= len(values) <= max_set_size:
            add("AllowedValuesDetector",
                {"id": f"SUG-ALW-{name}", "type": "AllowedValues",
                 "column": name, "params": {"values": values}},
                0.75,
                f"{len(values)} distinct values across {n} samples — "
                "likely a closed value set", n)
        if isinstance(f.dataType, NumericType) and (values is None
                                                    or len(values) > 1):
            lo, hi = p1[f"{name}__min"], p1[f"{name}__max"]
            add("RangeDetector",
                {"id": f"SUG-RNG-{name}", "type": "Range", "column": name,
                 "params": {"min": float(lo), "max": float(hi)}},
                0.5, f"observed envelope [{lo}, {hi}] — verify before "
                "enforcing", n)
        if name in rx_cols and (values is None or len(values) > 1):
            for rx_name, rx in REGEX_REGISTRY.items():
                if p2[f"{name}__rx__{rx_name}"] == n:
                    add("RegexDetector",
                        {"id": f"SUG-RGX-{name}-{rx_name}", "type": "Regex",
                         "column": name, "params": {"pattern": rx}},
                        0.8, f"all {n} non-null values match the "
                        f"{rx_name} grammar", n)
                    break  # first (most specific) matching pattern wins
    return out
