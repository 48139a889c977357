"""Custom stateful streaming operator: running per-group violation totals.

``applyInPandasWithState`` keeps (rows_seen, violations_seen) per group
across micro-batches — the streaming analog of the batch verdict table's
cumulative view, and the escape hatch for stateful logic Spark's windowed
aggregations can't express (here: lifetime totals + first-seen batch
tracking without windows). State size is O(groups); Arrow batches in, one
summary row per updated group out per batch.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

from ..compiler import DATASET_RULE_TYPES, EngineConfig, compile_ruleset
from .validate import _reject_notices
from ..errors import ErrorCode, RuleConfigurationError
from ..model import RuleSet

OUTPUT_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("rows_total", LongType()),
    StructField("violations_total", LongType()),
    StructField("batches_seen", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("rows", LongType()),
    StructField("violations", LongType()),
    StructField("batches", LongType()),
])


def _slim_counts(stream_df: DataFrame, plan, config) -> DataFrame:
    """(source, _viol) projection feeding the stateful stage: ``_viol``
    SUMS the per-rule conditions — a row failing two rules contributes 2,
    matching the batch verdict table's per-rule violation counts (the
    old any-rule OR-fold counted it once, silently undercounting —
    round-5 review batch 8). Per-ELEMENT array violations still count
    once per (row, rule) here, not once per element: the element
    explosion happens in the full engine only, and that caveat is
    documented on both public lanes."""
    viol = None
    for p in plan.predicates:
        term = F.coalesce(p.condition, F.lit(False)).cast("int")
        viol = term if viol is None else viol + term
    return stream_df.select(
        F.coalesce(F.col(config.group_col).cast("string"), F.lit("<null>"))
         .alias("source"),
        viol.alias("_viol"))


def running_violation_totals(stream_df: DataFrame, ruleset: RuleSet,
                             config: EngineConfig | None = None) -> DataFrame:
    """Streaming DataFrame of lifetime (rows, violations, batches) per
    group, updated every micro-batch via ``applyInPandasWithState``.

    The per-row rule conditions compile to ONE integer column (the SUM
    of per-rule hits — a row failing two rules counts 2, matching the
    batch verdict totals at rule granularity; per-element array
    violations count once per (row, rule) here, not per element) before
    the stateful stage, so the Python side only sums ints — no rule
    logic crosses the Arrow boundary."""
    config = config or EngineConfig()
    bad = [r.id for r in ruleset.rules
           if r.type in DATASET_RULE_TYPES or r.scope.kind == "first"]
    if bad:
        raise RuleConfigurationError(
            bad[0], ErrorCode.RULE_CONFIGURATION_ERROR,
            "dataset-scoped / first-scope rules not supported in the "
            "stateful streaming lane")
    plan = compile_ruleset(ruleset, stream_df.schema, config, {})
    _reject_notices(plan)
    if not plan.predicates:
        raise RuleConfigurationError(
            "<ruleset>", ErrorCode.RULE_CONFIGURATION_ERROR,
            "stateful streaming lane needs at least one per-row predicate "
            "rule (ruleset compiled to zero predicates)")
    slim = _slim_counts(stream_df, plan, config)

    def update(key: Tuple[str],
               pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        rows = violations = 0
        for pdf in pdfs:
            rows += len(pdf)
            violations += int(pdf["_viol"].sum())
        if state.exists:
            prev_rows, prev_viol, prev_batches = state.get
        else:
            prev_rows = prev_viol = prev_batches = 0
        new = (prev_rows + rows, prev_viol + violations, prev_batches + 1)
        state.update(new)
        yield pd.DataFrame([{"source": key[0], "rows_total": new[0],
                             "violations_total": new[1],
                             "batches_seen": new[2]}])

    return (slim.groupBy("source")
            .applyInPandasWithState(update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))


def running_violation_totals_tws(stream_df: DataFrame, ruleset: RuleSet,
                                 config: EngineConfig | None = None
                                 ) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` twin of
    :func:`running_violation_totals` — the arbitrary-stateful-processing
    API that supersedes ``applyInPandasWithState``: typed state handles
    (ValueState here; List/MapState for richer operators), per-key
    lifecycle hooks, and the RocksDB state store (changelog-checkpointed,
    state size bounded by disk not executor memory — the 100-TB state
    story; set
    ``spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider``
    on the session). Output rows and state layout are identical to the
    legacy lane, so both parity-test against the batch engine.

    Requires the ``protobuf`` package (the TWS driver↔JVM state protocol
    is protobuf-framed). This container does not ship it, so
    ``test_streaming.py`` self-skips the TWS parity test here — on a real
    cluster image (protobuf is a standard Spark 4 companion dep) the lane
    runs as written; :func:`running_violation_totals` is the
    dependency-free fallback with identical output.
    """
    try:
        import google.protobuf  # noqa: F401  (TWS wire protocol dep)
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pip install protobuf); use running_violation_totals as the "
            "dependency-free fallback") from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)
    config = config or EngineConfig()
    bad = [r.id for r in ruleset.rules
           if r.type in DATASET_RULE_TYPES or r.scope.kind == "first"]
    if bad:
        raise RuleConfigurationError(
            bad[0], ErrorCode.RULE_CONFIGURATION_ERROR,
            "dataset-scoped / first-scope rules not supported in the "
            "stateful streaming lane")
    plan = compile_ruleset(ruleset, stream_df.schema, config, {})
    _reject_notices(plan)
    if not plan.predicates:
        raise RuleConfigurationError(
            "<ruleset>", ErrorCode.RULE_CONFIGURATION_ERROR,
            "stateful streaming lane needs at least one per-row predicate "
            "rule (ruleset compiled to zero predicates)")
    slim = _slim_counts(stream_df, plan, config)

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues
                            ) -> Iterator[pd.DataFrame]:
            n = viol = 0
            for pdf in rows:
                n += len(pdf)
                viol += int(pdf["_viol"].sum())
            prev = self._state.get() if self._state.exists() else (0, 0, 0)
            new = (prev[0] + n, prev[1] + viol, prev[2] + 1)
            self._state.update(new)
            yield pd.DataFrame([{"source": key[0], "rows_total": new[0],
                                 "violations_total": new[1],
                                 "batches_seen": new[2]}])

        def close(self) -> None:
            pass

    return (slim.groupBy("source")
            .transformWithStateInPandas(Totals(), OUTPUT_SCHEMA, "update",
                                        "none"))
