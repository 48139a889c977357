"""Streaming violation-rate monitoring: watermarked windowed aggregation.

The continuous companion to the batch verdict table: per event-time window
and group, row counts plus per-rule violation counts — the signal a
training-data ingest pipeline alerts on ("source X started failing the
token-domain rule at 14:03"). Late data is handled by the watermark;
state is bounded by (windows in flight × groups × rules).

Only per-row rule families participate (same restriction as
``validate_stream``); the conditions come from the same compiler, so batch
and streaming agree by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler import DATASET_RULE_TYPES, EngineConfig, compile_ruleset
from .validate import _reject_notices
from ..errors import ErrorCode, RuleConfigurationError
from ..model import RuleSet


def violation_rates(stream_df: DataFrame, ruleset: RuleSet, ts_col: str,
                    window_duration: str = "1 minute",
                    watermark: str = "2 minutes",
                    config: EngineConfig | None = None) -> DataFrame:
    """Streaming DataFrame of per-(window, group) rule violation counts.

    Output: (window struct, <group_col>, rows, <one count column per rule
    id>). Works identically on a batch DataFrame (Spark's unified API) —
    used by the tests to check batch/stream agreement.
    """
    config = config or EngineConfig()
    bad = [r.id for r in ruleset.rules
           if r.type in DATASET_RULE_TYPES or r.scope.kind == "first"]
    if bad:
        raise RuleConfigurationError(
            bad[0], ErrorCode.RULE_CONFIGURATION_ERROR,
            "dataset-scoped / first-scope rules cannot be monitored on an "
            "unbounded stream")
    plan = compile_ruleset(ruleset, stream_df.schema, config, {})
    _reject_notices(plan)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for p in plan.predicates:
        aggs.append(F.sum(F.when(p.condition, 1).otherwise(0))
                    .alias(p.rule.id))
    if stream_df.isStreaming:
        stream_df = stream_df.withWatermark(ts_col, watermark)
    return (stream_df
            .groupBy(F.window(F.col(ts_col), window_duration),
                     F.col(config.group_col))
            .agg(*aggs))
