"""Phase-level profiling of ValidationEngine.validate (dev tool)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fhir_data_validation_spark import ValidationEngine
from fhir_data_validation_spark.engine import predicate_violations
from fhir_data_validation_spark.rulesets import default_token_ruleset
from fhir_data_validation_spark.session import get_spark
from fhir_data_validation_spark.sources.synth import (sources_dim,
                                                      stats_baseline,
                                                      token_table)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
corpus = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/fdv_scale_corpus_{rows}"

spark = get_spark(f"profile-{cores}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(corpus)
dims = {"sources_dim": sources_dim(spark),
        "stats_baseline": stats_baseline(
            token_table(spark, max(rows // 10, 10_000), seed=7,
                        partitions=cores), "n_tok", 64)}

def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:28s} {time.perf_counter()-t0:7.2f}s  {out}")

t("raw scan count", lambda: df.count())
t("raw scan sum(n_tok)", lambda: df.agg(F.sum("n_tok")).collect()[0][0])

engine = ValidationEngine(default_token_ruleset(with_drift=True), dims=dims)
plan = engine.compile(df)
t("fused predicates only", lambda: predicate_violations(df, plan).count())

from fhir_data_validation_spark.plans import (drift_plan, reference_plan,
                                              required_resources_plan,
                                              unique_plan)
for dp in plan.dataset_plans:
    t(f"dataset: {dp.rule.id}", lambda dp=dp: dp.execute(df, plan).count())

t("full validate+counts", lambda: (lambda r: (r.violations.count(),
                                              r.verdicts.count()))(
    engine.validate(df)))
