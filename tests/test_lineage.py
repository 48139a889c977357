"""Checkpoint/lineage + resume tests (SURVEY §7.2 step 7, north rule):
a run writes per-partition lineage + metrics; a resumed run skips completed
partitions and produces identical final output."""

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark.lineage import (LineageStore, ResumableRun,
                                                _DATASET_KEY)
from fhir_data_validation_spark.model import RuleSet
from fhir_data_validation_spark.rulesets import default_token_ruleset
from fhir_data_validation_spark.sources.synth import (dirty_token_table,
                                                      sources_dim)

N_ROWS = 1000


@pytest.fixture()
def dirty(spark):
    return dirty_token_table(spark, N_ROWS).drop("_row_id")


def _ruleset():
    # drop dims-needing rules to keep the fixture light, keep one global rule
    rules = [r for r in default_token_ruleset().rules
             if r.type not in ("Reference", "RequiredResources")]
    return RuleSet(rules=tuple(rules))


def test_full_run_writes_lineage_and_metrics(spark, dirty, tmp_path):
    run = ResumableRun(_ruleset(), str(tmp_path / "out"), run_id="r1",
                       groups_per_batch=2)
    metrics = run.run(dirty).collect()
    keys = {m["partition_key"] for m in metrics}
    # every observed group (incl. corrupted ones) + the dataset batch
    assert {"web", "books", "code", "wiki", "junk", "<null>",
            _DATASET_KEY} <= keys
    # metrics rows carry rule-level counts and wall time
    assert all(m["wall_ms"] >= 0 for m in metrics)
    unq = [m for m in metrics if m["rule_id"] == "UNQ-001"]
    assert len(unq) == 1 and unq[0]["partition_key"] == _DATASET_KEY
    assert unq[0]["violations"] == 1  # one duplicated key per 1000 rows

    # violations written per-partition; same totals as a direct engine run
    viol = run.violations(spark)
    assert viol.where(F.col("rule_id") == "REQ-001").count() == 10


def test_resume_skips_completed_partitions(spark, dirty, tmp_path):
    out = str(tmp_path / "out")
    run = ResumableRun(_ruleset(), out, run_id="r2", groups_per_batch=2)

    # simulate a partial run: mark two groups as already completed
    store = LineageStore(f"{out}/lineage")
    store.append(spark, [("r2", "web", None, 0, 0, 0, True, 0, 0.0),
                         ("r2", "books", None, 0, 0, 0, True, 0, 0.0)])
    assert store.completed_partitions(spark, "r2") == {"web", "books"}

    metrics = run.run(dirty)
    # completed partitions were not re-validated: their only lineage rows are
    # the pre-seeded markers (rule_id null), others have real rule rows
    web_rules = (metrics.where((F.col("partition_key") == "web")
                               & F.col("rule_id").isNotNull()).count())
    assert web_rules == 0
    wiki_rules = (metrics.where((F.col("partition_key") == "wiki")
                                & F.col("rule_id").isNotNull()).count())
    assert wiki_rules > 0


def test_rerun_is_idempotent(spark, dirty, tmp_path):
    out = str(tmp_path / "out")
    run = ResumableRun(_ruleset(), out, run_id="r3", groups_per_batch=3)
    run.run(dirty)
    n1 = run.violations(spark).count()
    # calling run() again must be a no-op (everything checkpointed)
    run.run(dirty)
    assert run.violations(spark).count() == n1


def test_interrupted_batch_overwrites_not_duplicates(spark, dirty, tmp_path):
    out = str(tmp_path / "out")
    run = ResumableRun(_ruleset(), out, run_id="r4", groups_per_batch=10)
    run.run(dirty)
    n1 = run.violations(spark).count()
    # simulate "data written but marker lost": wipe lineage, run again —
    # dynamic partition overwrite must replace, not append
    import shutil
    shutil.rmtree(f"{out}/lineage")
    run.run(dirty)
    assert run.violations(spark).count() == n1


def test_shared_output_root_isolates_runs(spark, dirty, tmp_path):
    """Two runs sharing an output root must not leak each other's rows into
    violations()/verdicts() — the pass/fail gate reads only this run_id."""
    out = str(tmp_path / "out")
    run_a = ResumableRun(_ruleset(), out, run_id="ra")
    run_a.run(dirty)
    n_a = run_a.violations(spark).count()
    run_b = ResumableRun(_ruleset(), out, run_id="rb")
    run_b.run(dirty)
    assert run_a.violations(spark).count() == n_a
    assert run_b.violations(spark).count() == n_a
    assert run_b.verdicts(spark).count() == run_a.verdicts(spark).count()
    # lineage read failure on a corrupt file must propagate, not silently
    # restart the run (only path-not-found means "first run")
    import os
    lineage_dir = f"{out}/lineage"
    for f in os.listdir(lineage_dir):
        if f.endswith(".parquet"):
            with open(os.path.join(lineage_dir, f), "wb") as fh:
                fh.write(b"not parquet")
    with pytest.raises(Exception):
        LineageStore(lineage_dir).read(spark).collect()


def test_dims_flow_through(spark, dirty, tmp_path):
    run = ResumableRun(default_token_ruleset(), str(tmp_path / "out"),
                       dims={"sources_dim": sources_dim(spark)}, run_id="r5")
    metrics = run.run(dirty)
    ref = metrics.where(F.col("rule_id") == "REF-001").collect()
    assert sum(r["violations"] for r in ref) == 5  # junk rows miss the dim
