"""Structured Streaming validation.

The reference is strictly request/response batch (SURVEY §2.9: no streams),
and the 10^12-row target validates Iceberg *snapshots*; streaming is the
continuous-ingest variant of the same contract: validate sequences as they
land, emit the violations stream, checkpoint via Spark's own offset log.

Two modes:

* :func:`validate_stream` — transformation-only: compiles the per-row rule
  families onto a streaming DataFrame (the fused predicate pass is stateless,
  so it lifts to streaming unchanged) and returns the streaming violations
  DataFrame for the caller to ``writeStream``. Dataset-scoped rules
  (Unique/Reference/RequiredResources/Drift) need cross-batch or
  cross-partition visibility and are rejected here.
* :func:`validate_stream_foreach_batch` — full-engine micro-batching: runs
  the COMPLETE rule set (including dataset rules, scoped per micro-batch)
  inside ``foreachBatch`` and appends violations + verdicts parquet keyed by
  epoch. This is the lane for "validate each arriving Iceberg commit".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler import (DATASET_RULE_TYPES, EngineConfig, compile_ruleset)
from ..engine import ValidationEngine, predicate_violations
from ..errors import ErrorCode, RuleConfigurationError
from ..model import RuleSet


def validate_stream(stream_df: DataFrame, ruleset: RuleSet,
                    config: EngineConfig | None = None) -> DataFrame:
    """Streaming violations DataFrame from the per-row rule families.

    The compiled plan is identical to the batch engine's fused pass —
    stateless projection/filter, so Catalyst plans it on the micro-batch
    exactly as on a table scan. ``first``-scope rules and dataset rules are
    compile-time errors here (they require state or a global view)."""
    config = config or EngineConfig()
    bad = [r.id for r in ruleset.rules if r.type in DATASET_RULE_TYPES]
    if bad:
        raise RuleConfigurationError(
            bad[0], ErrorCode.RULE_CONFIGURATION_ERROR,
            f"dataset-scoped rules {bad} need cross-batch state; use "
            "validate_stream_foreach_batch for the full rule set")
    first = [r.id for r in ruleset.rules if r.scope.kind == "first"]
    if first:
        raise RuleConfigurationError(
            first[0], ErrorCode.RULE_CONFIGURATION_ERROR,
            "'first' instance scope needs a window — not defined on an "
            "unbounded stream")
    plan = compile_ruleset(ruleset, stream_df.schema, config, {})
    _reject_notices(plan)
    if config.dedupe and plan.needs_dedupe():
        # the batch engine's A5 stage collapses colliding
        # (error_code, column) locations with earlier-authority wins —
        # an aggregation over ALL violations, which a pure streaming
        # projection cannot express. Silently skipping it would make
        # streaming counts diverge from the batch twin on the same data
        # (round-5 review batch 8) — reject like _reject_notices does
        colliding = [p.rule.id for p in plan.predicates]
        raise RuleConfigurationError(
            colliding[0] if colliding else "?",
            ErrorCode.RULE_CONFIGURATION_ERROR,
            "ruleset has rules that can emit the same (error_code, "
            "column) location, which the batch engine A5-dedupes; a "
            "streaming projection cannot — disambiguate the rules' "
            "errorCodes, set config.dedupe=False to accept duplicate "
            "locations, or use validate_stream_foreach_batch")
    return predicate_violations(stream_df, plan)


def validate_stream_foreach_batch(stream_df: DataFrame, ruleset: RuleSet,
                                  output_root: str,
                                  dims: dict[str, DataFrame] | None = None,
                                  config: EngineConfig | None = None,
                                  trigger: dict | None = None):
    """Run the FULL engine per micro-batch via ``foreachBatch``; violations
    and verdicts append to ``<output_root>/violations|verdicts`` with the
    epoch id. Dataset rules see one micro-batch at a time (a micro-batch ≈
    one Iceberg commit in the snapshot-validation reading). Returns the
    started ``StreamingQuery``."""
    engine = ValidationEngine(ruleset, dims=dims, config=config)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch is at-least-once: a replayed epoch must REPLACE
        # its own earlier (possibly partial) output, not append a second
        # copy — WRITE-SCOPED dynamic partition overwrite on the epoch
        # key makes the write idempotent per epoch without flipping the
        # session-global overwrite semantics for every other partitioned
        # write in the application (round-5 review batch 8)
        res = engine.validate(batch_df)
        try:
            (res.violations.withColumn("epoch", F.lit(epoch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch")
             .parquet(f"{output_root}/violations"))
            (res.verdicts.withColumn("epoch", F.lit(epoch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch")
             .parquet(f"{output_root}/verdicts"))
        finally:
            # a failed epoch write must not strand the persisted
            # violations cache across retries (round-5 review batch 8)
            res.unpersist()

    writer = (stream_df.writeStream
              .foreachBatch(_process)
              .option("checkpointLocation", f"{output_root}/_checkpoint"))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def _reject_notices(plan) -> None:
    """Compile-time notices (ENUM_VALIDATION_SKIPPED) are STATIC
    dataset-level rows — a pure streaming projection cannot union them in,
    and silently dropping them would defeat the Phase B.2 transparency
    contract. Checking the COMPILED plan (not re-deriving the condition)
    keeps this drift-proof against future notice-producing families; the
    foreachBatch lane carries notices via the full engine."""
    if plan.notices:
        rid = plan.notices[0]["rule_id"]
        raise RuleConfigurationError(
            rid, ErrorCode.RULE_CONFIGURATION_ERROR,
            f"rule {rid!r} compiles to a dataset-level "
            f"{plan.notices[0]['error_code']} notice, which a streaming "
            "projection cannot carry; resolve the rule or use "
            "validate_stream_foreach_batch")
