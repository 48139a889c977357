"""End-to-end training-data curation pipeline (runnable demo).

    python examples/training_data_pipeline.py

The full corpus-to-training-sequences loop over the driver testdata:

1. cleaning — PII redaction + within-doc line dedup (pure projections);
2. quality filtering — Gopher-style heuristics through the engine's rule
   pass (violating docs dropped), then a per-language length-quantile
   gate (broadcast fences over the unshuffled scan);
3. near-duplicate removal — MinHash+LSH pairs → connected components →
   keep one doc per cluster;
4. decontamination — 13-gram overlap against a held-out "benchmark" set;
5. domain mixing — largest feasible subset at target lang weights;
6. train/val/test split assignment (deterministic, key-stable);
7. epoch shuffle — deterministic global permutation rank (salt = epoch);
8. val-split side products — weighted eval sample (A-Res), sliding-window
   RAG chunks, TF-IDF keywords;
9. tokenize (demo hash tokenizer) and pack into fixed-length training
   sequences (concat-and-chunk);
10. final verdict: validate the packed output's shape with the engine.

Every stage is the same operator a 100-TB run would use — deterministic,
shuffle-lean, no per-row Python.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from fhir_data_validation_spark import (EngineConfig, RuleSet,  # noqa: E402
                                        ValidationEngine)
from fhir_data_validation_spark.navigation import with_pointer  # noqa: E402
from fhir_data_validation_spark.pipeline import (cleaning,  # noqa: E402
                                                 contamination, dedup,
                                                 packing, redaction,
                                                 selection, similarity)
from fhir_data_validation_spark.pipeline.presets import \
    gopher_quality_rules  # noqa: E402
from fhir_data_validation_spark.pipeline import text as text_ops  # noqa: E402
from fhir_data_validation_spark.pipeline.text import words  # noqa: E402
from fhir_data_validation_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
SEQ_LEN = 64

spark = get_spark("training-data-pipeline", cores=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF}/documents.parquet")
print(f"corpus: {docs.count()} docs")

# 0. clean: strip residual markup, redact PII, dedup repeated lines —
# all one fused projection, no shuffle
docs = docs.withColumn("text",
                       cleaning.strip_markup(F.col("text")))
docs = cleaning.dedup_lines_docs(redaction.redact_docs(docs, counts=False))

# 1. quality filter via the engine (same one-scan pass as any rule set);
# split() routes failing docs to a quarantine side (at corpus scale that
# side lands in a review table with its violations joinable by doc_id)
res = ValidationEngine(
    RuleSet.parse(gopher_quality_rules()),
    config=EngineConfig(key_col="doc_id", group_col="lang")).validate(docs)
docs, quarantined = res.split(docs)
print(f"after quality filter: {docs.count()} "
      f"(quarantined {quarantined.count()})")
# quarantine review UX: every violation gets a machine-navigable JSON
# pointer + breadcrumb (pure projection fused into the review-table write)
one = (with_pointer(res.violations, breadcrumb_col="crumb")
       .where(F.col("json_pointer").isNotNull()).first())
if one is not None:
    print(f"sample violation location: {one['json_pointer']} "
          f"({one['crumb']})")

# 1b. prune each language's short tail: keep docs at or above their
# language's 0.2 length quantile (per-stratum fence, broadcast join-back)
docs = selection.select_above_quantile(docs, "n_chars", "lang", 0.2)
print(f"after per-lang length-quantile gate: {docs.count()}")

# 2. near-dup removal (MinHash+LSH -> clusters -> keep min-id per cluster)
pairs = dedup.minhash_dedup(docs, threshold=0.6)
drops = (dedup.duplicate_clusters(pairs)
         .where(~F.col("keep")).select(F.col("doc_id").cast("long")))
docs = docs.join(F.broadcast(drops), "doc_id", "left_anti")
print(f"after near-dup removal: {docs.count()}")

# 2b. SEMANTIC near-dup sweep (SemDeDup): surface-form dedup above misses
# paraphrases; cluster demo embeddings (hashed word-histogram vectors —
# a real corpus brings model embeddings) and drop within-cell cosine
# near-dups. Centroids pinned to the first docs so re-runs partition
# identically.
NB = 16
_ws = words(F.col("text"))
_hist = F.transform(
    F.sequence(F.lit(0), F.lit(NB - 1)),
    lambda i: F.size(F.filter(
        _ws, lambda w: F.pmod(F.xxhash64(w), F.lit(NB)) == i)).cast("float"))
emb_df = docs.select("doc_id", _hist.alias("embedding"))
cent = [r["embedding"] for r in
        emb_df.orderBy("doc_id").limit(8).collect()]
sem = similarity.semantic_dedup(emb_df, threshold=0.98, centroids=cent,
                                id_col="doc_id")
sem_drops = sem.where(~F.col("keep")).select("doc_id")
docs = docs.join(F.broadcast(sem_drops), "doc_id", "left_anti")
print(f"after semantic dedup: {docs.count()}")

# 3. decontaminate against a held-out benchmark (here: doc_id < 10)
bench = spark.read.parquet(f"{SF}/documents.parquet") \
    .where(F.col("doc_id") < 10)
docs = contamination.remove_contaminated(docs, bench, threshold=0.5, n=13)
print(f"after decontamination: {docs.count()}")

# 3b. target-domain importance scores (DSIR): log p_target − log p_raw
# under hashed-ngram models — the signal that would up/down-sample toward
# a target domain (dsir_resample); here the target is the English slice
# and the scores are reported (the mixer below owns the realized mix)
dsir = selection.dsir_weights(docs, docs.where(F.col("lang") == "en"),
                              n_buckets=512)
by_lang = (docs.join(dsir, "doc_id").groupBy("lang")
           .agg(F.round(F.avg("log_weight"), 2).alias("avg_lw"))
           .orderBy("lang").collect())
print("DSIR avg log-weight by lang:",
      {r["lang"]: r["avg_lw"] for r in by_lang})

# 4. domain mixing at target lang weights (exact-binary fractions) —
# then VALIDATE the realized mix with a GroupShare rule (the acceptance
# gate for the mixer: declared bands around the 2:1:1 targets, closed
# world so a dropped language fails belowMin)
docs, quotas = selection.domain_mix(docs, {"en": 2, "de": 1, "fr": 1},
                                    by="lang")
print(f"after domain mix: quotas={quotas}")
mix_res = ValidationEngine(
    RuleSet.parse({"rules": [
        {"id": "MIX-1", "type": "GroupShare", "column": "lang",
         "params": {"shares": {"en": {"min": 0.45, "max": 0.55},
                               "de": {"min": 0.20, "max": 0.30},
                               "fr": {"min": 0.20, "max": 0.30}}}}]}),
    config=EngineConfig(key_col="doc_id", group_col="lang")).validate(docs)
assert mix_res.passed(), mix_res.violations.collect()
print("domain-mix share gate: passed")

# 5. deterministic splits, then MATERIALIZE the curated corpus. At
# corpus scale the curated set is written back to the lake anyway; here
# it is also the lineage cut that keeps downstream plans sane — without
# it every rule chunk of the final validation clones the whole
# quality→dedup→decontaminate→mix plan tree (persist() alone keeps the
# plan: measured >15 GB of driver heap in plan objects at 500 docs).
docs = selection.assign_splits(docs, {"train": 6, "val": 1, "test": 1})
import tempfile  # noqa: E402
scratch = tempfile.mkdtemp(prefix="fdv_example_curated_")
docs.write.mode("overwrite").parquet(scratch)
docs = spark.read.parquet(scratch)
print("split counts:", dict(docs.groupBy("split").count().collect()))

# 6. epoch shuffle: deterministic permutation rank, salt = epoch number
train = selection.shuffle_ranks(docs.where(F.col("split") == "train"),
                                salt="epoch0", shards=16)
print("epoch-0 shuffle head:",
      [r["doc_id"] for r in
       train.orderBy("shuffle_rank").limit(5).collect()])

# 6b. side products from the val split: a weighted eval sample
# (inclusion ∝ length — A-Res, reproducible) and a RAG chunk index with
# TF-IDF keywords per doc
val = docs.where(F.col("split") == "val")
eval_pool = selection.sample_weighted(val, 20, "n_chars")
chunks = packing.chunk_windows(
    val.select("doc_id", words(F.col("text")).alias("tokens")),
    window=64, stride=48)
keywords = text_ops.tfidf_topk(val, k=3)
print(f"val side products: eval_pool={eval_pool.count()} "
      f"chunks={chunks.count()} keyword rows={keywords.count()}")

# 7. tokenize (demo: hash words to ids) and pack the train split
tokens = F.transform(words(F.col("text")),
                     lambda w: F.pmod(F.xxhash64(w), F.lit(50257))
                     .cast("int"))
token_df = (train
            .select("doc_id", "source", tokens.alias("tokens"))
            .withColumn("n_tok", F.size("tokens")))
pieces = packing.pack_sequences(token_df, seq_len=SEQ_LEN,
                                shard_col="source")
# doc_spans carry the per-sequence document boundaries an attention /
# loss mask consumes (packed docs must not attend across each other)
seqs = packing.assemble_sequences(pieces, include_spans=True).persist()
n_seq = seqs.count()
print(f"packed {n_seq} sequences of <= {SEQ_LEN} tokens")

# 7. validate the packed output with the engine: every sequence except a
# shard's last must be exactly SEQ_LEN
last = seqs.groupBy("shard").agg(F.max("seq").alias("_last"))
packed = (seqs.join(last, "shard")
          .withColumn("is_last", F.col("seq") == F.col("_last"))
          .withColumn("seq_id", F.concat_ws("/", "shard", "seq")))
res = ValidationEngine(
    RuleSet.parse({"rules": [
        {"id": "PACK-LEN", "type": "CustomExpr",
         "expr": f"is_last OR n_tok = {SEQ_LEN}"},
        {"id": "PACK-POS", "type": "Range", "column": "n_tok",
         "params": {"min": 1, "max": SEQ_LEN}},
        # doc_spans must tile each sequence exactly: the mask boundaries
        # cover every token with no gaps or overlaps
        {"id": "PACK-SPANS", "type": "CustomExpr",
         "expr": ("size(doc_spans) > 0 AND doc_spans[0].start = 0 "
                  "AND aggregate(doc_spans, 0, (acc, s) -> "
                  "IF(acc = s.start, acc + s.len, -1)) = n_tok")}]}),
    config=EngineConfig(key_col="seq_id", group_col="shard")).validate(packed)
print(f"packed-output validation: passed={res.passed()} "
      f"({res.violations.count()} errors over {n_seq} sequences)")
assert res.passed()

# 7b. cross-table reconciliation: every assembled sequence's n_tok must
# equal the sum of its pieces' lengths (AggConsistency — the
# parent-rollup vs child-aggregate gate; one map-side-combined child agg
# + one equi-join back)
piece_dim = pieces.withColumn("seq_id", F.concat_ws("/", "shard", "seq"))
sum_res = ValidationEngine(
    RuleSet.parse({"rules": [
        {"id": "PACK-SUM", "type": "AggConsistency", "column": "n_tok",
         "params": {"dim": "pieces", "on": "seq_id", "dimKey": "seq_id",
                    "agg": "sum", "valueColumn": "piece_len",
                    "requireChildren": True}}]}),
    dims={"pieces": piece_dim},
    config=EngineConfig(key_col="seq_id", group_col="shard")).validate(packed)
assert sum_res.passed()
print("piece-sum reconciliation: passed")
seqs.unpersist()
dedup.unpersist_all()
import shutil  # noqa: E402
shutil.rmtree(scratch, ignore_errors=True)
print("OK")
