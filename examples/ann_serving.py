"""ANN index lifecycle over an Iceberg-versioned embedding corpus
(runnable demo).

    python examples/ann_serving.py

The serve-at-scale story for the similarity operators: a 100-TB corpus
builds its index ONCE, persists it, and every later job — query serving,
snapshot-delta ingest, dedup sweeps — loads the artifact instead of
re-fitting. The demo drives the full loop on the driver testdata:

1. embeddings land in a PyIceberg table (the versioned source of truth);
2. build an IVF-PQ index (coarse KMeans cells + residual product
   quantization: the scored scan carries m bytes of codes per vector,
   never the vectors) over snapshot s1, save it;
3. a "serving job" loads the index cold and answers a query batch —
   exactness cross-checked against brute-force cosine at full probe;
4. a delta batch appends to the table (snapshot s2); the incremental
   read feeds `IvfPqIndex.add` — frozen quantizer, O(delta) encode,
   no refit, no corpus re-scan;
5. the grown index serves the same queries, now surfacing delta docs;
6. the same delta drives incremental SEMANTIC DEDUP against a persisted
   survivor index under pinned centroids — the index family's other
   consumer.

Every stage is the operator a real run would use: broadcast probes,
Arrow-batched encode, no per-row Python, no driver-side corpus state
beyond the centroid/codebook statistics.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fhir_data_validation_spark.pipeline.similarity import (  # noqa: E402
    IvfPqIndex, cosine_topk, semantic_dedup_incremental)
from fhir_data_validation_spark.pipeline import dedup  # noqa: E402
from fhir_data_validation_spark.session import get_spark  # noqa: E402
from fhir_data_validation_spark.sources.iceberg_py import \
    PyIcebergTable  # noqa: E402

SF = "/root/testdata/sf0.01"

spark = get_spark("ann-serving", cores=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="ann_serving_")

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
base = emb.where(F.col("vec_id") >= 20)
# the delta re-ingests the query vectors (so the grown index MUST surface
# them at cosine 1.0) and duplicates 17 base vectors (so the semantic
# dedup pass below has true positives to find)
delta = (emb.where((F.col("vec_id") < 3)
                   | ((F.col("vec_id") >= 20) & (F.col("vec_id") < 37)))
         .withColumn("vec_id", F.col("vec_id") + 1_000_000))
queries = emb.where(F.col("vec_id") < 3)

# 1. the corpus is an Iceberg table: index builds pin a snapshot, delta
# ingest reads the changelog between snapshots — never a full re-scan
table = PyIcebergTable.create(spark, f"{root}/emb_table", base.schema)
table.append(base)
s1 = table.current_snapshot_id()
print(f"corpus: {base.count()} vectors @ snapshot {s1}")

# 2. build once over the pinned snapshot, persist the artifact
idx = IvfPqIndex.build(table.read(s1), n_cells=16, m=8, n_codes=32,
                       seed=11, max_iter=10)
idx.save(f"{root}/ivfpq")
print(f"index: {idx.centroids.shape[0]} cells, "
      f"{idx.codebooks.shape[0]} subspaces × {idx.codebooks.shape[1]} codes "
      f"(~{idx.codebooks.shape[0]} bytes/vector on the scored scan)")

# 3. the serving job: load cold, answer a batch; at full probe with a
# corpus-wide shortlist the answer must EQUAL brute force
served = IvfPqIndex.load(spark, f"{root}/ivfpq")
hits = served.search(queries, k=5, n_probe=4).collect()
exact = served.search(queries, k=5, n_probe=16, rerank_factor=10**6)
truth = cosine_topk(table.read(s1), queries, k=5)
assert ({(r["query_id"], r["vec_id"]) for r in exact.collect()}
        == {(r["query_id"], r["vec_id"]) for r in truth.collect()})
print(f"serving: {len(hits)} hits at n_probe=4; "
      "full-probe result == brute-force cosine ✓")

# 4. delta ingest: append → incremental read → frozen-quantizer add
table.append(delta)
s2 = table.current_snapshot_id()
new_rows = table.incremental(s1, s2)
grown = served.add(new_rows)
grown.save(f"{root}/ivfpq_v2")
print(f"delta: +{new_rows.count()} vectors via incremental({s1}, {s2}); "
      "index grown without refit")

# 5. the grown index surfaces delta docs: each query's re-ingested twin
# must now rank #1 at cosine 1.0
after = grown.search(queries, k=5, n_probe=16, rerank_factor=10**6)
union_truth = cosine_topk(table.read(s2), queries, k=5)
assert ({(r["query_id"], r["vec_id"]) for r in after.collect()}
        == {(r["query_id"], r["vec_id"]) for r in union_truth.collect()})
n_delta_hits = after.where(F.col("vec_id") >= 1_000_000).count()
assert n_delta_hits >= 3, "re-ingested query twins missing from top-5"
print(f"grown index == brute force over the union ✓ "
      f"({n_delta_hits} delta docs in the new top-5s)")

# 6. the same delta, as a semantic-dedup batch: classify against a
# persisted survivor index under PINNED centroids (the incremental
# contract — refitting cells would shift every assignment)
centroids = served.centroids
surv_schema = ("vec_id bigint, cell int, _nv array<double>")
survivors = spark.createDataFrame([], surv_schema)
verdicts1, idx_delta1 = semantic_dedup_incremental(
    table.read(s1), survivors, centroids, threshold=0.995)
survivors = survivors.unionByName(idx_delta1)
verdicts2, idx_delta2 = semantic_dedup_incremental(
    new_rows, survivors, centroids, threshold=0.995)
d1 = verdicts1.where(F.col("dup")).count()
d2 = verdicts2.where(F.col("dup")).count()
# the 17 duplicated base vectors hit their indexed twins from batch 1
assert d2 >= 17, f"expected the 17 re-ingested twins flagged, got {d2}"
print(f"semantic dedup: batch1 {d1} dups, delta batch {d2} dups "
      f"(survivor index {survivors.count() + idx_delta2.count()} rows)")
dedup.unpersist_all()

print("ann_serving: all stages OK")
spark.stop()
