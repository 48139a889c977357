"""End-to-end Iceberg validation pipeline (runnable demo, no jar needed).

    python examples/iceberg_pipeline.py

Walks the full north-star loop with the pure-Python Iceberg v2 layer:

1. create a partitioned token table, append two snapshots;
2. full validation of snapshot 1 (ResumableRun + Iceberg MERGE lineage);
3. DELTA validation of only the data appended after snapshot 1;
4. continuous validation with SnapshotMonitor (poll → delta → validate);
5. metadata: snapshots view, files view, partition-pruned + bounds-pruned
   reads;
6. table lifecycle: copy-on-write row-level delete (takedown), schema
   evolution (add_column), sort-clustered compaction, snapshot expiry.

On a cluster the same code runs via
``spark-submit --py-files dist/fhir_data_validation_spark.zip
jobs/run_validation.py --input <table> --input-format pyiceberg …``.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from fhir_data_validation_spark import (EngineConfig, RuleSet,  # noqa: E402
                                        ValidationEngine)
from fhir_data_validation_spark.lineage import ResumableRun  # noqa: E402
from fhir_data_validation_spark.session import get_spark  # noqa: E402
from fhir_data_validation_spark.sources import (  # noqa: E402
    PyIcebergLineageStore, PyIcebergTable)
from fhir_data_validation_spark.sources.synth import \
    dirty_token_table  # noqa: E402
from fhir_data_validation_spark.streaming import SnapshotMonitor  # noqa: E402

RULES = RuleSet.parse({"rules": [
    {"id": "REQ-001", "type": "Required", "column": "doc_id"},
    {"id": "LEN-001", "type": "ArrayLength", "column": "tokens",
     "params": {"min": 1, "max": 8192}},
    {"id": "INV-001", "type": "CustomExpr",
     "expr": "size(tokens) = n_tok"},
]})


def main() -> None:
    spark = get_spark("iceberg-pipeline", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fdv_demo_")

    # -- 1. table + two snapshots -------------------------------------------
    corpus = dirty_token_table(spark, 2_000).drop("_row_id")
    table = PyIcebergTable.create(spark, f"{root}/tokens",
                                  corpus.schema, partition_by="source")
    s1 = table.append(corpus)
    s2 = table.append(
        dirty_token_table(spark, 500, seed=99).drop("_row_id"))
    print(f"snapshots: s1={s1} s2={s2}")
    table.snapshots().show(truncate=False)

    # -- 2. full validation of snapshot 1, Iceberg MERGE lineage ------------
    run = ResumableRun(RULES, f"{root}/out", run_id="demo",
                       lineage_store=PyIcebergLineageStore(
                           f"{root}/lineage"))
    metrics = run.run(table.read(s1))
    print("run metrics (per partition × rule):")
    metrics.orderBy("partition_key", "rule_id").show(40)

    # -- 3. delta validation: only files appended after s1 ------------------
    engine = ValidationEngine(RULES, config=EngineConfig())
    delta = table.incremental(s1, s2)
    res = engine.validate(delta)
    print(f"delta rows={delta.count()} "
          f"violations={res.violations.count()} "
          f"files={len(delta.inputFiles())} of "
          f"{len(table.read(s2).inputFiles())}")

    # -- 4. continuous validation -------------------------------------------
    monitor = SnapshotMonitor(table, engine,
                              cursor_path=f"{root}/cursor.json")
    monitor.poll_once()                       # adopt baseline
    table.append(dirty_token_table(spark, 300, seed=7).drop("_row_id"))
    sid, batch = monitor.poll_once()
    print(f"monitor batch snapshot={sid} "
          f"violations={batch.violations.count()}")

    # -- 5. metadata + pruned reads -----------------------------------------
    table.files().show(truncate=60)
    web = table.read(partition_filter={"source": "web"})
    print(f"partition-pruned: {web.count()} web rows, "
          f"{len(web.inputFiles())} files")
    long_docs = (table.read(stats_filter={"n_tok": (100, None)})
                 .where(F.col("n_tok") >= 100))
    print(f"bounds-pruned n_tok>=100: {long_docs.count()} rows")

    # -- 6. lifecycle: takedown delete, evolution, clustering, expiry -------
    res = table.delete_rows("n_tok > 200")
    print(f"takedown delete: rewrote {res['files_rewritten']} files, "
          f"carried {res['files_carried']}, "
          f"removed {res['rows_deleted']} rows")
    from pyspark.sql import types as T
    table.add_column("quality", T.DoubleType())
    print(f"evolved schema: {table.schema().simpleString()} "
          f"(old rows read quality=NULL, zero files rewritten)")
    flat = PyIcebergTable.create(spark, f"{root}/tokens_flat",
                                 table.read().schema)
    flat.append(table.read())
    flat.compact(target_files=4, sort_by=["n_tok"])
    pruned = flat.read(stats_filter={"n_tok": (150, None)})
    print(f"sort-clustered compact: stats_filter opens "
          f"{len(pruned.inputFiles())} of "
          f"{len(flat.read().inputFiles())} files")
    gone = table.expire_snapshots(keep_last=2)
    print(f"expired {gone['snapshots']} snapshots, "
          f"reclaimed {gone['data_files']} data files")

    # -- 7. release tag, bad commit + rollback, net changelog ---------------
    table.tag("v1-release")
    s_good = table.current_snapshot_id()
    table.append(dirty_token_table(spark, 100, seed=13).drop("_row_id"))
    table.rollback_to(s_good)                 # undo the bad commit
    print(f"rolled back to {s_good}; read(ref='v1-release') pins "
          f"{table.read(ref='v1-release').count()} rows forever")
    s_cdc = table.current_snapshot_id()
    table.delete_rows("n_tok < 2")
    ch = table.changes(s_cdc)
    print("net changelog since the release:")
    ch.groupBy("_change_type").count().show()

    # -- 8. hidden partitioning + Z-order clustering ------------------------
    hidden = PyIcebergTable.create(
        spark, f"{root}/tokens_bucketed", corpus.schema,
        partition_by=("doc_id", "bucket[8]"))
    hidden.append(corpus)
    one = hidden.read(partition_filter={"doc_id": "doc-000007"})
    print(f"hidden bucket[8] partitioning: source-column filter opens "
          f"{len(one.inputFiles())} of "
          f"{len(hidden.read().inputFiles())} files")
    flat.compact(target_files=4, zorder_by=["n_tok", "quality"])
    print("z-order compacted tokens_flat on (n_tok, quality)")

    # -- 9. merge-on-read takedown + manifest compaction ---------------------
    n_files_pre = len(flat.read().inputFiles())
    res = flat.delete_rows("n_tok = 7", mode="mor")
    print(f"MOR takedown: removed {res['rows_deleted']} rows, rewrote "
          f"{res['files_rewritten']} data files (debt: "
          f"{flat.delete_files().count()} delete files); "
          f"{len([f for f in flat.read().inputFiles() if 'data' in f])} "
          f"scanned vs {n_files_pre} before")
    flat.compact(target_files=4)              # materialize the MOR debt
    print(f"compacted: delete files now {flat.delete_files().count()}")
    rm = flat.rewrite_manifests()
    print(f"manifest compaction: {rm['manifests_before']} -> "
          f"{rm['manifests_after']} manifests (planning O(specs), "
          f"zero data IO)")

    # -- 10. incremental statistics over snapshot deltas ---------------------
    from fhir_data_validation_spark import IncrementalProfiler
    prof = IncrementalProfiler(table, ["n_tok", "doc_id"],
                               f"{root}/stats", group_col="source")
    first = prof.update()
    table.append(dirty_token_table(spark, 200, seed=21).drop("_row_id"))
    second = prof.update()
    print(f"incremental profile: {first['mode']} then {second['mode']} "
          f"(second pass scanned ONLY the new snapshot's files)")
    prof.profile().where("column = 'n_tok'").orderBy("group").show()

    # -- 11. write-audit-publish: the engine gates what becomes visible -----
    table.branch("audit")
    table.append(dirty_token_table(spark, 300, seed=7).drop("_row_id"),
                 branch="audit")
    audit = engine.validate(table.read(ref="audit"))
    bad = audit.violations.where("severity = 'error'").count()
    if bad == 0:
        table.fast_forward("main", "audit")
        print("WAP: audit passed -> published to main")
    else:
        table.drop_branch("audit")
        print(f"WAP: audit FAILED ({bad} error rows) -> branch dropped; "
              f"main never saw the batch")

    # -- 12. metadata-only rename + widen ------------------------------------
    table.rename_column("n_tok", "tok_count")
    table.widen_column("tok_count", T.LongType())
    print(f"renamed+widened: {table.schema().simpleString()} "
          f"(zero files rewritten; mixed-name files reconstruct via "
          f"coalesce) rows={table.read().count()}")
    spark.stop()


if __name__ == "__main__":
    main()
