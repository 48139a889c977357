"""Warmed, phase-split profile of the scaling-bench job (dev tool).

Reproduces tools/scaling_bench.py's exact input path (snapshot-pinned
PyIceberg scan of the materialized corpus + persisted drift baseline),
warms the JVM with a full validate, then times each component of the
job separately, best-of-3, so the 8-vs-32-core Amdahl residual can be
attributed to a specific stage instead of guessed at.

Usage: python tools/profile_scaling_phases.py <cores> [corpus_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fhir_data_validation_spark import ValidationEngine
from fhir_data_validation_spark.engine import predicate_violations
from fhir_data_validation_spark.rulesets import default_token_ruleset
from fhir_data_validation_spark.session import get_spark
from fhir_data_validation_spark.sources.synth import sources_dim

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fdv_scale_corpus_12800000"

from tools.scaling_bench import _iceberg_loc

spark = get_spark(f"phaseprof-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

from fhir_data_validation_spark.sources.iceberg_py import PyIcebergTable
t = PyIcebergTable(spark, _iceberg_loc(corpus))
df = t.read(t.current_snapshot_id())
dims = {"sources_dim": sources_dim(spark),
        "stats_baseline": spark.read.parquet(corpus + "_baseline")}
engine = ValidationEngine(default_token_ruleset(with_drift=True), dims=dims)

# warmup: one full validate (JIT + codegen + Python workers + page cache)
warm = engine.validate(df)
warm.violations.count(); warm.verdicts.count(); warm.unpersist()


def best3(label, fn):
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        walls.append(time.perf_counter() - t0)
    print(f"{label:26s} best {min(walls):7.2f}s  walls "
          f"{[round(w, 2) for w in walls]}  -> {out}")
    return min(walls)


plan = engine.compile(df)
best3("iceberg scan count", lambda: df.count())
best3("fused predicates", lambda: predicate_violations(df, plan).count())
for dp in plan.dataset_plans:
    best3(f"dataset {dp.rule.id}", lambda dp=dp: dp.execute(df, plan).count())


def full():
    res = engine.validate(df)
    n = (res.violations.count(), res.verdicts.count())
    res.unpersist()
    return n


best3("full validate", full)
