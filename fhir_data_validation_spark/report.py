"""One-call corpus quality report: validation + profile + duplication.

The operational wrapper a training-data pipeline actually calls per
snapshot: run the rule set, profile every column, count exact duplicates,
and fold everything into one small verdict DataFrame + a driver-side dict.
Each section is an independent Spark job over the same input; the heavy
token column is read only by the validation scan (profiles use array
lengths, dedup uses the key/fingerprint columns — verified by the plan
tests).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import stats
from .compiler import EngineConfig
from .engine import ValidationEngine, ValidationResult
from .model import RuleSet


@dataclass
class QualityReport:
    result: ValidationResult        # violations + verdicts
    profile: DataFrame              # per-group column profiles (stats.profile)
    duplicate_keys: DataFrame       # (key, cnt) with cnt > 1
    summary: dict                   # driver-side scalars
    suggestions: list | None = None  # draft rules (full-analysis mode)

    def passed(self) -> bool:
        return self.summary["passed"]


def quality_report(df: DataFrame, ruleset: RuleSet,
                   dims: dict[str, DataFrame] | None = None,
                   config: EngineConfig | None = None,
                   profile_columns: list[str] | None = None,
                   suggest: bool = False) -> QualityReport:
    """Validate + profile + dedup-count one snapshot.

    ``summary`` keys: rows, violations, errors, warnings, duplicate_keys,
    groups, passed — everything a pipeline gate needs without touching the
    big DataFrames. ``suggest=True`` adds draft rules from the profiler
    (the reference's full-analysis ``suggestions`` response field,
    ``Models/ValidationResponse.cs:29-33``).
    """
    config = config or EngineConfig()
    engine = ValidationEngine(ruleset, dims=dims, config=config)
    res = engine.validate(df)

    prof = stats.profile(df, columns=profile_columns,
                         group_col=config.group_col)
    dups = stats.pk_duplicates(df, config.key_col)

    sev = {r["severity"]: r["n"] for r in
           (res.violations.groupBy("severity")
            .agg(F.count(F.lit(1)).alias("n")).collect())}
    verd = res.verdicts.collect()
    group_rows = {r["partition_key"]: r["rows"] for r in verd
                  if r["partition_key"] != "<dataset>"
                  and r["rows"] is not None}
    summary = {
        "rows": sum(group_rows.values()),
        "violations": sum(sev.values()),
        "errors": sev.get("error", 0),
        "warnings": sev.get("warning", 0),
        "duplicate_keys": dups.count(),
        "groups": len({r["partition_key"] for r in verd
                       if r["partition_key"] != "<dataset>"}),
        "passed": sev.get("error", 0) == 0,
    }
    suggestions = None
    if suggest:
        from .suggestions import suggest_rules
        suggestions = suggest_rules(df)
    return QualityReport(result=res, profile=prof, duplicate_keys=dups,
                         summary=summary, suggestions=suggestions)
