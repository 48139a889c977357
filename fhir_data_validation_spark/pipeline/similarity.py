"""Similarity search over embedding columns (array<float>).

Three tiers, by scale:

* :func:`cosine_pairs` — exact all-pairs cosine ≥ threshold via self-join +
  native zip_with/aggregate dot product. O(n²) — correctness oracle and
  small dims only.
* :func:`cosine_topk` — brute-force top-k for a (small) query set: the
  query matrix broadcasts into an Arrow ``mapInPandas`` stage, each corpus
  batch does one numpy matmul and emits only its local top-k per query;
  a final window keeps the global top-k. Shuffle = O(batches × queries × k).
* :func:`ann_topk` — multi-table sign-random-projection LSH: deterministic
  hyperplanes (seeded hash), L independent bucket tables, candidates from
  any-table bucket equality, exact rerank of candidates. Sublinear
  candidate volume at corpus scale; recall measured in tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(df: DataFrame, threshold: float = 0.95,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Exact embedding near-duplicate pairs: (id_a, id_b, cosine ≥ threshold).

    All-pairs self-join — quadratic; the LSH path (:func:`ann_topk` buckets)
    is the discovery mechanism at corpus scale, this is the exact
    verifier / small-scale oracle."""
    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    # threshold on the UNROUNDED cosine (the emitted contract is
    # "cosine >= threshold"; rounding first would admit pairs up to
    # 5e-5 below it) — the 4-digit round is display-only
    return (left.crossJoin(right)
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("_cos", cosine(F.col("_va"), F.col("_vb")))
            .where(F.col("_cos") >= threshold)
            .select("id_a", "id_b",
                    F.round(F.col("_cos"), 4).alias("cosine")))


def embedding_near_dup(df: DataFrame, threshold: float = 0.95,
                       n_bits: int = 8, n_tables: int = 16, seed: int = 42,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       broadcast_vecs: bool = True) -> DataFrame:
    """Embedding near-duplicate pairs at scale: multi-table SRP-LSH bucket
    self-join discovers candidates, exact cosine verifies ≥ threshold.

    For identical vectors recall is exactly 1 (identical sign bits in every
    table); at threshold 0.95 (θ ≈ 18°) per-table collision is
    (1-θ/π)^n_bits ≈ 0.43 and 16 tables give recall ≈ 1-1e-4. Candidate
    volume ≈ n_tables × Σ bucket² / corpus — sublinear for spread-out
    corpora, vs the O(n²) of :func:`cosine_pairs`."""
    from .dedup import _materialize
    # materialized: the signature mapInPandas subtree would otherwise run
    # TWICE for the self-join sides and a THIRD time when the verify join
    # re-executes the candidate subplan (measured 3.5× wall on the bench
    # corpus); 32 k sig rows cache for free and give AQE real stats
    sigs = _materialize(
        srp_signatures(df, n_bits, n_tables, seed, id_col, vec_col))
    cands = (sigs.alias("a")
             .join(sigs.alias("b"), ["table", "bucket"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())
    vecs = df.select(F.col(id_col), F.col(vec_col))
    # exact verify: candidates ≪ corpus², the per-id vector sides join by
    # key — broadcast them (they are the corpus' (id, vec) projection;
    # for a corpus too large to broadcast pass broadcast_vecs=False and
    # AQE picks a shuffle join on the reduced candidate set)
    va = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if broadcast_vecs:
        va, vb = F.broadcast(va), F.broadcast(vb)
    # unrounded threshold, display-rounded value — same rationale as
    # cosine_pairs (the two must agree: this path's recall is judged
    # against that exact verifier)
    return (cands
            .join(va, "id_a")
            .join(vb, "id_b")
            .withColumn("_cos", cosine(F.col("_va"), F.col("_vb")))
            .where(F.col("_cos") >= threshold)
            .select("id_a", "id_b",
                    F.round(F.col("_cos"), 4).alias("cosine")))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str | None = None) -> DataFrame:
    """Brute-force cosine top-k: (query_id, vec_id, cosine, rank).

    The query set must be broadcastable (collected to the driver once).
    Corpus-side work is one vectorized numpy matmul per Arrow batch; each
    batch emits ≤ queries × k candidate rows, the global window reduces to
    the true top-k. No per-row Python."""
    qid = query_id_col or id_col
    qrows = queries.select(F.col(qid).alias("qid"),
                           F.col(vec_col).alias("v")).collect()
    # ids keep their native types (hardcoding long here crashed the Arrow
    # serializer on string-keyed corpora)
    qid_t = queries.schema[qid].dataType.simpleString()
    vid_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_t}, vec_id {vid_t}, cosine double"
    if not qrows:
        # an empty query batch is a routine serving condition, not an
        # error — np.linalg.norm on a 0-row matrix would raise
        return corpus.sparkSession.createDataFrame(
            [], out_schema + ", rank int")
    q_ids = [r["qid"] for r in qrows]
    qm = np.asarray([r["v"] for r in qrows], dtype=np.float64)
    # zero-norm guard (same 1e-12 as the corpus side): a NaN query row
    # would rank above every real cosine in the desc window
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    def _topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True),
                                 1e-12)
            sims = qm @ cm.T                      # (n_queries, batch)
            ids = pdf[id_col].to_numpy()
            kk = min(k, sims.shape[1])
            # deterministic per-batch top-k: pre-sort by id, then a
            # STABLE sort on -sim keeps the lowest id among tied
            # cosines — a bare argpartition keeps an arbitrary tie
            # member, so the candidate the global (desc cosine, asc
            # vec_id) window would pick could be dropped before it ever
            # reached the window (round-5 review batch 11; the exact
            # lane must be exactly deterministic)
            id_asc = np.argsort(ids, kind="stable")
            sel = np.empty((sims.shape[0], kk), dtype=np.int64)
            for i in range(sims.shape[0]):
                order = id_asc[np.argsort(-sims[i][id_asc],
                                          kind="stable")]
                sel[i] = order[:kk]
            rows = {
                "query_id": np.repeat(q_ids, kk),
                "vec_id": ids[sel].ravel(),
                "cosine": np.take_along_axis(sims, sel, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    cand = corpus.select(id_col, vec_col).mapInPandas(_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .withColumn("cosine", F.round("cosine", 4)))


# ------------------------------------------------- sign-random-projection ---

def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (no RNG state — reproducible
    across drivers/retries, like everything else in the engine)."""
    idx = np.arange(dim * n_bits, dtype=np.uint64).reshape(n_bits, dim)
    # splitmix64-style integer mix, mapped to [-0.5, 0.5); the uint64
    # multiply overflow IS the mix (mod-2^64 wraparound by design)
    with np.errstate(over="ignore"):
        z = (idx + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return (z.astype(np.float64) / 2.0 ** 64) - 0.5


def srp_signatures(df: DataFrame, n_bits: int = 8, n_tables: int = 16,
                   seed: int = 42, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Multi-table sign-random-projection buckets: (id, table, bucket).

    One Arrow batch matmul against all ``n_tables × n_bits`` hyperplanes;
    each table packs its sign bits into one bucket id. L independent tables
    turn per-table collision probability p^b into recall 1-(1-p^b)^L —
    the standard SRP-LSH recall/pruning dial."""
    # ids keep their native type through the Arrow stage
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, table int, bucket long"
    weights = np.power(2.0, np.arange(n_bits)).astype(np.float64)

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if planes is None:
                planes = _hyperplanes(cm.shape[1], n_bits * n_tables, seed)
            bits = (cm @ planes.T) >= 0   # (batch, n_tables*n_bits)
            n = len(pdf)
            bits = bits.reshape(n, n_tables, n_bits)
            buckets = (bits @ weights).astype(np.int64)   # (batch, n_tables)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                "bucket": buckets.ravel()})

    from .dedup import _widen
    return _widen(df.select(id_col, vec_col)).mapInPandas(_sig, out_schema)


def ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_bits: int = 8, n_tables: int = 16, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k via multi-table SRP-LSH + exact rerank:
    (query_id, vec_id, cosine, rank).

    Candidates = corpus vectors sharing any table's bucket with the query;
    exact cosine reranks the candidates. Expected candidate volume ≈
    n_tables × corpus / 2^n_bits per query; recall at angle θ is
    1-(1-(1-θ/π)^n_bits)^n_tables. Uniform random vectors are the
    worst case (no cluster structure) — real embedding corpora cluster, so
    the same parameters prune far harder there.

    One-shot form of ``SrpIndex.build(...).search(...)`` — build the index
    once and :meth:`SrpIndex.save` it for repeated query batches."""
    return (SrpIndex.build(corpus, n_bits, n_tables, seed, id_col, vec_col)
            .search(queries, k=k))


# ---------------------------------------------------------------- IVF -------

def _assign_original(df: DataFrame, centroids: np.ndarray, id_col: str,
                     vec_col: str) -> DataFrame:
    """(id, vector) → (cand_id, cell, _cv) by argmax dot with the
    NORMALIZED centroids — the one assignment rule build, ``add`` and the
    search probes all share (an Euclidean-to-unnormalized-mean assignment
    at build time would file vectors into cells the probe ranks
    differently when centroid norms vary, silently costing recall at
    small ``n_probe``). Keeps the ORIGINAL vector for exact rerank.
    One numpy matmul per Arrow batch."""
    C = centroids

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            V = np.asarray(list(b["_v"]), dtype=np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            yield pd.DataFrame({
                "cand_id": b["cand_id"],
                "cell": np.argmax(V @ C.T, axis=1).astype("int32"),
                "_cv": b["_v"]})

    src = df.select(F.col(id_col).alias("cand_id"),
                    F.col(vec_col).alias("_v"))
    out_schema = ("cand_id "
                  + src.schema["cand_id"].dataType.simpleString()
                  + ", cell int, _cv "
                  + src.schema["_v"].dataType.simpleString())
    return src.mapInPandas(assign, out_schema)


class IvfIndex:
    """Persistent IVF (inverted-file) index: normalized centroids + the
    cell-assigned corpus (with its vectors — the inverted lists are
    self-contained). Build ONCE over the corpus, :meth:`save` to shared
    storage, :meth:`load` in any later job and serve many query batches —
    the shape a 100-TB pipeline needs (re-fitting KMeans per query batch
    would re-scan the corpus every time).

    On-disk layout (all Spark-native parquet, any scheme Spark can write):
    ``<path>/cells`` (id, cell, vector), ``<path>/centroids``
    (cell, centroid), ``<path>/meta`` (one row of parameters).
    """

    def __init__(self, centroids: np.ndarray, cells: DataFrame,
                 id_col: str, vec_col: str):
        self.centroids = centroids          # (n_cells, dim), L2-normalized
        self.cells = cells                  # (cand_id, cell, _cv)
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def build(cls, corpus: DataFrame, n_cells: int = 64, seed: int = 42,
              max_iter: int = 20, fit_fraction: float = 1.0,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> "IvfIndex":
        """Fit the coarse quantizer and assign every corpus vector to its
        cell. KMeans trains on ``fit_fraction`` of the corpus (sample at
        100 TB — centroids are all that is kept); assignment is one Spark
        ML ``transform`` (JVM-side)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # L2-normalize BEFORE clustering (spherical k-means): cells and
        # probes must share the cosine metric — Euclidean cells over
        # unnormalized vectors would partition partly by magnitude and
        # strand a query's true cosine neighbors in cells whose centroid
        # direction never ranks in the query's top-n_probe
        # norm computed ONCE per row in its own column — inlining it in the
        # transform lambda would re-evaluate the O(d) aggregate per element
        # (O(d²) interpreted work per row)
        dvec = F.col(vec_col).cast("array<double>")
        vecs = (corpus
                .withColumn("_norm", F.greatest(
                    F.sqrt(F.aggregate(F.transform(dvec, lambda y: y * y),
                                       F.lit(0.0), lambda a, b: a + b)),
                    F.lit(1e-12)))
                .select(F.col(id_col), F.col(vec_col),
                        array_to_vector(
                            F.transform(dvec, lambda x: x / F.col("_norm")))
                        .alias("_features")))
        fit_input = (vecs.sample(fraction=fit_fraction, seed=seed)
                     if fit_fraction < 1.0 else vecs)
        model = (KMeans(k=n_cells, seed=seed, maxIter=max_iter,
                        featuresCol="_features", predictionCol="_cell")
                 .fit(fit_input))
        centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
        centroids = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
        # assignment uses the SAME rule as the search probes and add():
        # argmax dot with the normalized centroids. KMeans.transform's
        # Euclidean distance to the raw cluster MEANS ranks differently
        # when mean norms vary (tight vs diffuse cells) — a vector filed
        # that way can sit in a cell the probe never reaches at small
        # n_probe. The inverted lists carry the ORIGINAL vectors: rerank
        # after load needs no corpus join.
        cells = _assign_original(corpus, centroids, id_col, vec_col)
        return cls(centroids, cells, id_col, vec_col)

    def search(self, queries: DataFrame, k: int = 10,
               n_probe: int = 8) -> DataFrame:
        """Top-k per query: probe the ``n_probe`` nearest cells, rerank
        those inverted lists exactly. Work per query ≈ corpus × n_probe /
        n_cells; ``n_probe = n_cells`` ⇒ exact. Query set must be
        broadcastable (collected once, like :func:`cosine_topk`)."""
        id_col, vec_col = self.id_col, self.vec_col
        qrows = queries.select(F.col(id_col).alias("qid"),
                               F.col(vec_col).alias("v")).collect()
        # probe assignment is ONE vectorized matmul + argpartition over the
        # whole query batch (a per-query Python loop is a driver stall at
        # 10^5 queries)
        if qrows:
            qids = [r["qid"] for r in qrows]
            Q = np.asarray([r["v"] for r in qrows], dtype=np.float64)
            Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True),
                               1e-12)
            sims = Q @ self.centroids.T         # (n_queries, n_cells)
            npb = min(n_probe, sims.shape[1])
            top = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
            probe_rows = [(qid, int(cell))
                          for qid, cs in zip(qids, top) for cell in cs]
        else:
            probe_rows = []
        spark = queries.sparkSession
        from pyspark.sql.types import IntegerType, StructField, StructType
        id_type = queries.schema[id_col].dataType  # native id type
        probes = spark.createDataFrame(
            probe_rows, StructType([StructField("query_id", id_type),
                                    StructField("cell", IntegerType())]))

        cand = (self.cells.join(F.broadcast(probes), "cell")
                .select("query_id", "cand_id", "_cv"))
        qv = queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("_qv"))
        # rank on the UNROUNDED cosine (rounding first would let display
        # precision flip near-ties vs an exact oracle), round for output
        scored = (cand.join(F.broadcast(qv), "query_id")
                  .withColumn("_cos", cosine(F.col("_qv"), F.col("_cv"))))
        w = Window.partitionBy("query_id").orderBy(F.desc("_cos"),
                                                   F.asc("cand_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", F.col("cand_id").alias("vec_id"),
                        F.round("_cos", 4).alias("cosine"), "rank"))

    def add(self, new_vectors: DataFrame) -> "IvfIndex":
        """Incremental ingest: assign NEW vectors to the EXISTING
        centroids (no refit) and append them to the inverted lists —
        a snapshot delta indexes in O(delta × n_cells) without
        re-clustering the corpus. Returns a new index sharing the
        centroids (save it, or keep serving from it).

        Assignment is one Arrow-batched matmul per partition (the
        centroid matrix rides the closure, n_cells × dim floats) — the
        same :func:`_assign_original` rule the build uses, so a re-added
        duplicate of an indexed vector lands in the identical cell.
        Centroids drift as the corpus grows: the quantizer stays optimal
        for the OLD distribution, so re-``build`` when recall on fresh
        data degrades — the standard IVF re-train/append trade-off."""
        assigned = _assign_original(new_vectors, self.centroids,
                                    self.id_col, self.vec_col)
        return IvfIndex(self.centroids, self.cells.unionByName(assigned),
                        self.id_col, self.vec_col)

    def save(self, path: str) -> None:
        spark = self.cells.sparkSession
        self.cells.write.mode("overwrite").parquet(f"{path}/cells")
        cent = [(int(i), [float(x) for x in row])
                for i, row in enumerate(self.centroids)]
        (spark.createDataFrame(cent, "cell int, centroid array<double>")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))
        (spark.createDataFrame([(self.id_col, self.vec_col)],
                               "id_col string, vec_col string")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        meta = spark.read.parquet(f"{path}/meta").first()
        rows = (spark.read.parquet(f"{path}/centroids")
                .orderBy("cell").collect())
        centroids = np.asarray([r["centroid"] for r in rows],
                               dtype=np.float64)
        cells = spark.read.parquet(f"{path}/cells")
        return cls(centroids, cells, meta["id_col"], meta["vec_col"])


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 64, n_probe: int = 8, seed: int = 42,
             max_iter: int = 20, fit_fraction: float = 1.0,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """One-shot IVF approximate top-k — ``IvfIndex.build(...).search(...)``:
    (query_id, vec_id, cosine, rank). The scale path complementary to
    :func:`ann_topk`'s SRP-LSH: clustered corpora — the realistic case for
    embeddings — concentrate true neighbors in few cells, so IVF prunes
    harder than LSH there. For repeated query batches build the index once
    and :meth:`IvfIndex.save` it."""
    return (IvfIndex.build(corpus, n_cells=n_cells, seed=seed,
                           max_iter=max_iter, fit_fraction=fit_fraction,
                           id_col=id_col, vec_col=vec_col)
            .search(queries, k=k, n_probe=n_probe))


# ------------------------------------------------- persistent SRP index -----

class SrpIndex:
    """Persistent multi-table SRP-LSH index: the corpus bucket signatures
    plus the (deterministic) hyperplane parameters. Hyperplanes derive from
    ``(dim, n_bits × n_tables, seed)`` alone (:func:`_hyperplanes`), so the
    index stores parameters + signatures + vectors — query-side signatures
    are recomputed identically at search time.

    Layout: ``<path>/sigs`` (id, table, bucket), ``<path>/vecs``
    (id, vector), ``<path>/meta`` (one parameter row).
    """

    def __init__(self, sigs: DataFrame, vecs: DataFrame, n_bits: int,
                 n_tables: int, seed: int, id_col: str, vec_col: str):
        self.sigs = sigs                    # (id_col, table, bucket)
        self.vecs = vecs                    # (id_col, vec_col)
        self.n_bits, self.n_tables, self.seed = n_bits, n_tables, seed
        self.id_col, self.vec_col = id_col, vec_col

    @classmethod
    def build(cls, corpus: DataFrame, n_bits: int = 8, n_tables: int = 16,
              seed: int = 42, id_col: str = "vec_id",
              vec_col: str = "embedding") -> "SrpIndex":
        sigs = srp_signatures(corpus, n_bits, n_tables, seed, id_col,
                              vec_col)
        return cls(sigs, corpus.select(id_col, vec_col), n_bits, n_tables,
                   seed, id_col, vec_col)

    def search(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """Same contract as :func:`ann_topk`, served from the stored
        signatures: query signatures are recomputed with the SAME seeded
        hyperplanes, candidates come from any-table bucket equality, exact
        cosine reranks."""
        id_col, vec_col = self.id_col, self.vec_col
        q_sig = (srp_signatures(queries, self.n_bits, self.n_tables,
                                self.seed, id_col, vec_col)
                 .withColumnRenamed(id_col, "query_id"))
        cand = (q_sig.join(self.sigs.withColumnRenamed(id_col, "cand_id"),
                           ["table", "bucket"])
                .select("query_id", "cand_id").distinct())
        qv = queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("_qv"))
        cv = self.vecs.select(F.col(id_col).alias("cand_id"),
                              F.col(vec_col).alias("_cv"))
        # rank on the UNROUNDED cosine (rounding first lets display
        # precision flip near-ties), round for output only
        scored = (cand.join(F.broadcast(qv), "query_id").join(cv, "cand_id")
                  .withColumn("_cos", cosine(F.col("_qv"), F.col("_cv"))))
        w = Window.partitionBy("query_id").orderBy(F.desc("_cos"),
                                                   F.asc("cand_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .select("query_id", F.col("cand_id").alias("vec_id"),
                        F.round("_cos", 4).alias("cosine"), "rank"))

    def add(self, new_vectors: DataFrame) -> "SrpIndex":
        """Incremental ingest: sign the delta with the SAME seeded
        hyperplanes and append. Because SRP hyperplanes are
        data-independent, the grown index is EXACTLY ``build()`` over the
        union — no quantizer drift, no re-train trade-off (the advantage
        over :meth:`IvfIndex.add`); work is O(delta × n_bits ×
        n_tables)."""
        delta_sigs = srp_signatures(new_vectors, self.n_bits,
                                    self.n_tables, self.seed,
                                    self.id_col, self.vec_col)
        return SrpIndex(self.sigs.unionByName(delta_sigs),
                        self.vecs.unionByName(
                            new_vectors.select(self.id_col, self.vec_col)),
                        self.n_bits, self.n_tables, self.seed,
                        self.id_col, self.vec_col)

    def save(self, path: str) -> None:
        spark = self.vecs.sparkSession
        self.sigs.write.mode("overwrite").parquet(f"{path}/sigs")
        self.vecs.write.mode("overwrite").parquet(f"{path}/vecs")
        (spark.createDataFrame(
            [(self.n_bits, self.n_tables, self.seed, self.id_col,
              self.vec_col)],
            "n_bits int, n_tables int, seed int, id_col string, "
            "vec_col string")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))

    @classmethod
    def load(cls, spark, path: str) -> "SrpIndex":
        m = spark.read.parquet(f"{path}/meta").first()
        return cls(spark.read.parquet(f"{path}/sigs"),
                   spark.read.parquet(f"{path}/vecs"),
                   m["n_bits"], m["n_tables"], m["seed"],
                   m["id_col"], m["vec_col"])


# --------------------------------------------------------- SemDeDup ---------

def assign_cells(df: DataFrame, centroids: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding"
                 ) -> DataFrame:
    """Nearest-centroid (spherical) assignment of every vector:
    ``(id, cell, centroid_sim, _nv)`` with ``_nv`` the L2-normalized
    vector (double) so downstream cosine is a plain dot product.

    Centroids broadcast into an Arrow ``mapInPandas`` stage; each batch is
    ONE numpy matmul (the :func:`cosine_topk` tier — never per-row
    Python). Ties go to the lowest cell id (numpy first-max)."""
    cent = np.asarray(centroids, dtype=np.float64)
    if cent.ndim != 2 or cent.shape[0] == 0:
        raise ValueError("centroids must be a non-empty (n_cells, dim) array")
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True),
                             1e-12)

    src = df.select(F.col(id_col).alias("_id"),
                    F.col(vec_col).cast("array<double>").alias("_v"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            V = np.stack(b["_v"].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            sims = V @ cent.T                       # (batch, n_cells)
            cell = np.argmax(sims, axis=1)
            yield pd.DataFrame({
                "_id": b["_id"],
                "cell": cell.astype("int32"),
                "centroid_sim": sims[np.arange(len(b)), cell],
                "_nv": list(V),
            })

    out_schema = ("_id " + src.schema["_id"].dataType.simpleString()
                  + ", cell int, centroid_sim double, _nv array<double>")
    return (src.mapInPandas(gen, out_schema)
            .withColumnRenamed("_id", id_col))


def semantic_dedup(df: DataFrame, threshold: float = 0.95, *,
                   centroids=None, n_cells: int = 64, seed: int = 42,
                   max_iter: int = 20, fit_fraction: float = 1.0,
                   max_witnesses: int | None = None,
                   keep: str = "min_id",
                   id_col: str = "vec_id", vec_col: str = "embedding"
                   ) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping within-cluster
    near-duplicates — the embedding-space complement of MinHash/SimHash
    (which see only surface form).

    Returns one row per input vector:
    ``(id, cell, centroid_sim, keep boolean, dup_of nullable)`` — ``keep``
    is False when a higher-priority member of the SAME cell is
    cosine-similar ≥ ``threshold``; ``dup_of`` names the highest-priority
    such witness. Keep-first semantics match the rest of the dedup family
    (``dedup.exact_duplicates``): a doc is judged against every
    higher-priority cell member, whether or not that member itself
    survives.

    ``keep='min_id'`` (default) keeps the lowest id; ``'low_centroid_sim'``
    is the paper's diversity-keeping policy — within a duplicate
    neighborhood prefer the member FARTHEST from its centroid (lowest
    centroid cosine), ties to the lower id.

    ``centroids``: a fixed (n_cells, dim) array pins the partition (and
    makes runs reproducible across corpus versions); ``None`` fits
    spherical KMeans like :class:`IvfIndex` (``fit_fraction`` samples the
    fit at 100 TB).

    Scale shape: the corpus never self-joins globally — candidate pairs
    exist only WITHIN a cell (shuffle on ``cell``, pair volume
    Σ|cell|²). At 100 TB size ``n_cells`` so cells stay ~10⁴–10⁵ docs, and
    set ``max_witnesses`` to bound the i-side: each doc is then judged
    against at most the cell's top-``max_witnesses`` priority members
    (pair volume Σ|cell|×cap; recall loss only for duplicates whose every
    witness ranks beyond the cap). Unset (default) the check is
    exhaustive within cells — cross-cell near-duplicates are invisible by
    construction (the paper's stated approximation).
    """
    if keep not in ("min_id", "low_centroid_sim"):
        raise ValueError(f"unknown keep policy {keep!r} "
                         "(min_id | low_centroid_sim)")
    if centroids is None:
        idx = IvfIndex.build(df, n_cells=n_cells, seed=seed,
                             max_iter=max_iter, fit_fraction=fit_fraction,
                             id_col=id_col, vec_col=vec_col)
        cent = idx.centroids
    else:
        cent = centroids
    from .dedup import _materialize
    assigned = _materialize(assign_cells(df, cent, id_col, vec_col))

    if keep == "min_id":
        prio = (F.col(id_col),)
    else:
        prio = (F.col("centroid_sim"), F.col(id_col))
    pr = F.struct(*[c.alias(f"p{i}") for i, c in enumerate(prio)])
    ranked = assigned.withColumn("_prio", pr)

    wit = ranked
    if max_witnesses is not None:
        w = Window.partitionBy("cell").orderBy("_prio")
        wit = (ranked.withColumn("_rk", F.row_number().over(w))
               .where(F.col("_rk") <= max_witnesses).drop("_rk"))
    i = wit.select(F.col("cell").alias("_ci"),
                   F.col(id_col).alias("_idi"),
                   F.col("_prio").alias("_pi"),
                   F.col("_nv").alias("_nvi"))
    j = ranked.select(F.col("cell").alias("_cj"),
                      F.col(id_col).alias("_idj"),
                      F.col("_prio").alias("_pj"),
                      F.col("_nv").alias("_nvj"))
    dropped = (i.join(j, (F.col("_ci") == F.col("_cj"))
                        & (F.col("_pi") < F.col("_pj")))
               .where(_dot(F.col("_nvi"), F.col("_nvj"))
                      >= F.lit(float(threshold)))
               .groupBy(F.col("_idj").alias(id_col))
               .agg(F.min_by("_idi", "_pi").alias("dup_of")))
    return (assigned
            .join(dropped, id_col, "left")
            .select(id_col, "cell",
                    F.round("centroid_sim", 4).alias("centroid_sim"),
                    F.col("dup_of").isNull().alias("keep"), "dup_of"))


def semantic_dedup_incremental(new_docs: DataFrame, index: DataFrame,
                               centroids, threshold: float = 0.95, *,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding"
                               ) -> tuple[DataFrame, DataFrame]:
    """Incremental SemDeDup: classify an embedding delta against a
    persisted SURVIVOR index — the semantic lane of the incremental dedup
    family (:func:`..dedup.exact_duplicates_incremental` /
    :func:`..dedup.simhash_incremental`); pair with
    ``PyIcebergTable.incremental()`` for the delta input.

    ``index`` is ``(id_col, cell, _nv)`` — exactly the ``index_delta``
    this function emits (start with an empty frame of that schema, or
    :func:`assign_cells` output filtered to survivors). ``centroids``
    MUST be the pinned array every batch shares: refitting per batch
    would shift cell boundaries and silently change which historical
    docs are even comparable.

    Returns ``(verdicts, index_delta)``:

    - ``verdicts`` — one row per new doc: ``(id, cell, centroid_sim,
      dup, dup_of, cosine)``; ``dup_of`` is the smallest matching id
      (indexed or smaller-id batch doc), ``cosine`` its similarity.
    - ``index_delta`` — ``(id, cell, _nv)`` of the non-dup new docs:
      append to the index for the next batch.

    Semantics: dedup-CHAIN (each doc judged against surviving history +
    earlier batch members), which is what an append-only pipeline wants;
    the one-shot :func:`semantic_dedup` instead judges against every
    higher-priority member kept or not. Per-batch work is
    O(Σ_cell |delta_cell| × (|index_cell| + |delta_cell|)) — size the
    centroid count so cells stay bounded; the history's TEXT/vectors
    outside the index never re-scan.
    """
    cent = np.asarray(centroids, dtype=np.float64)
    from .dedup import _materialize
    assigned = _materialize(assign_cells(new_docs, cent, id_col, vec_col))
    nb = assigned.select(F.col(id_col).alias("_id"), "cell",
                         F.col("_nv"))
    idx = index.select(F.col(id_col).alias("_mid"), "cell",
                       F.col("_nv").alias("_mnv"))
    th = F.lit(float(threshold))
    sim = _dot(F.col("_nv"), F.col("_mnv"))
    # _mid != _id: an at-least-once REPLAY of a batch whose docs already
    # landed in the survivor index would otherwise match each doc to its
    # own index row at cosine 1.0 — a self-referential dup_of a consumer
    # cannot act on. With the guard, a replayed survivor matches only
    # OTHER rows (usually none) and stays a non-dup; the index_delta
    # anti-join below keeps its re-append out of the index.
    vs_index = (nb.join(idx, "cell")
                .where(F.col("_mid") != F.col("_id"))
                .withColumn("_cos", sim).where(F.col("_cos") >= th)
                .select("_id", "_mid", "_cos"))
    nb2 = nb.select(F.col("_id").alias("_mid"), "cell",
                    F.col("_nv").alias("_mnv"))
    vs_batch = (nb.join(nb2, "cell")
                .where(F.col("_mid") < F.col("_id"))
                .withColumn("_cos", sim).where(F.col("_cos") >= th)
                .select("_id", "_mid", "_cos"))
    matches = (vs_index.unionAll(vs_batch)
               .groupBy("_id")
               .agg(F.min("_mid").alias("dup_of"),
                    F.min_by("_cos", "_mid").alias("_mcos")))
    verdicts = (assigned
                .join(matches, assigned[id_col] == matches["_id"], "left")
                .select(id_col, "cell",
                        F.round("centroid_sim", 4).alias("centroid_sim"),
                        F.col("dup_of").isNotNull().alias("dup"),
                        "dup_of",
                        F.round("_mcos", 4).alias("cosine")))
    index_delta = (assigned
                   .join(matches,
                         assigned[id_col] == matches["_id"], "left_anti")
                   # replay idempotence: an id already in the index never
                   # re-appends (it would double the survivor row and make
                   # later batches match it twice)
                   .join(index.select(F.col(id_col)), id_col, "left_anti")
                   .select(id_col, "cell", "_nv"))
    return verdicts, index_delta


# ---------------------------------------------- product quantization --------

def _kmeans_np(X: np.ndarray, k: int, seed: int, max_iter: int
               ) -> np.ndarray:
    """Seeded Lloyd's k-means on a (driver-side) sample — the PQ codebook
    fit. Codebooks are tiny (k × dsub doubles); the corpus-side work
    (encode/search) is all executor-side. Deterministic: seeded init,
    ties resolve by lowest centroid index (argmin first-match)."""
    rng = np.random.RandomState(seed)
    n = len(X)
    init = rng.choice(n, size=min(k, n), replace=False)
    C = X[init].copy()
    if len(C) < k:                        # degenerate tiny fit sample
        C = np.vstack([C, np.zeros((k - len(C), X.shape[1]))])
    xsq = (X ** 2).sum(axis=1, keepdims=True)
    for _ in range(max_iter):
        # ||x-c||² = ||x||² - 2xc + ||c||² — matmul form, never an
        # (n, k, d) broadcast temp
        d = xsq - 2.0 * (X @ C.T) + (C ** 2).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        newC = C.copy()
        for j in range(k):
            m = assign == j
            if m.any():
                newC[j] = X[m].mean(axis=0)
        if np.allclose(newC, C):
            break
        C = newC
    return C


def _pq_codes(M: np.ndarray, books: np.ndarray,
              bnorm: np.ndarray) -> np.ndarray:
    """(n, dim) matrix → (n, m) int32 codes: per subspace ONE matmul +
    argmin over the code axis (||x-c||² = ||x||² - 2xc + ||c||²; the
    ||x||² term is constant per row and drops out of the argmin)."""
    m, _, dsub = books.shape
    cols = []
    for j in range(m):
        S = M[:, j * dsub:(j + 1) * dsub]
        d = bnorm[j][None, :] - 2.0 * (S @ books[j].T)
        cols.append(np.argmin(d, axis=1))
    return np.stack(cols, axis=1).astype("int32")


def _fit_pq_books(X: np.ndarray, m: int, n_codes: int, seed: int,
                  max_iter: int) -> np.ndarray:
    """Fit the m sub-codebooks on a (bounded, driver-side) sample matrix:
    (m, n_codes, dsub)."""
    dsub = X.shape[1] // m
    return np.stack([
        _kmeans_np(X[:, j * dsub:(j + 1) * dsub], n_codes, seed + j,
                   max_iter)
        for j in range(m)])


def _save_books(spark, path: str, books: np.ndarray) -> None:
    m, n_codes, dsub = books.shape
    rows = [(int(j), int(c), [float(x) for x in books[j, c]])
            for j in range(m) for c in range(n_codes)]
    (spark.createDataFrame(rows, "j int, c int, v array<double>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/books"))


def _load_books(spark, path: str, m: int, n_codes: int,
                dsub: int) -> np.ndarray:
    books = np.zeros((m, n_codes, dsub))
    for r in spark.read.parquet(f"{path}/books").collect():
        books[r["j"], r["c"]] = r["v"]
    return books


def _local_topk_per_query(qi: np.ndarray, scores: np.ndarray,
                          kk: int) -> np.ndarray:
    """Row indices of the top-``kk`` scores per query index within one
    Arrow batch — the map-side pre-top that keeps the global shortlist
    window from funneling a query's entire probed candidate set into one
    task. Lexsort by (query, -score); positions whose rank within their
    query block is < kk survive."""
    order = np.lexsort((-scores, qi))
    q_sorted = qi[order]
    starts = np.r_[0, np.flatnonzero(q_sorted[1:] != q_sorted[:-1]) + 1]
    rank = np.arange(len(q_sorted)) - np.repeat(
        starts, np.diff(np.r_[starts, len(q_sorted)]))
    return order[rank < kk]


class PqIndex:
    """Product-quantization index (Jégou, Douze & Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): each L2-normalized vector
    splits into ``m`` subvectors, each quantized to one of ``n_codes``
    codebook entries — ``m`` bytes per vector (a 64-dim float32 embedding
    compresses 32×), and query-time scoring never touches the vectors:
    asymmetric distance computation (ADC) sums ``m`` lookup-table entries
    per candidate.

    The 100-TB role: the CODES table is small enough to scan fast (and
    cache), so PQ serves the coarse ranking over the whole corpus (or
    inside IVF cells); exact rerank on the stored vectors then fixes the
    top of the list. With ``rerank=True`` (default) results are ordered
    by TRUE cosine among the ADC-shortlisted pool — recall is the only
    approximation, measured in tests like :func:`ann_topk`.

    Layout: ``<path>/codes`` (id, codes array<int>, vector),
    ``<path>/books`` (the (m, n_codes, dsub) codebooks, exploded),
    ``<path>/meta``.
    """

    def __init__(self, codebooks: np.ndarray, codes: DataFrame,
                 id_col: str, vec_col: str):
        self.codebooks = codebooks          # (m, n_codes, dsub)
        self.codes = codes                  # (cand_id, codes, _cv)
        self.id_col, self.vec_col = id_col, vec_col

    # -- build ------------------------------------------------------------

    @staticmethod
    def _normalize(V: np.ndarray) -> np.ndarray:
        return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                              1e-12)

    @classmethod
    def build(cls, corpus: DataFrame, m: int = 8, n_codes: int = 256,
              seed: int = 42, max_iter: int = 20,
              fit_rows: int = 20_000, id_col: str = "vec_id",
              vec_col: str = "embedding",
              fit_fraction: float | None = None) -> "PqIndex":
        """Fit ``m`` sub-codebooks on a bounded driver-side sample
        (``fit_rows`` caps the k-means input — codebooks are statistics,
        not data; the paper fits on ~100k of billions) and encode the
        whole corpus executor-side (one argmin matmul per subspace per
        Arrow batch).

        ``fit_fraction`` (0, 1]: sample rate for the codebook fit. When
        given, the build SKIPS the corpus count it otherwise runs to
        derive the rate — at 100-TB scale pass the known approximate
        ``fit_rows / corpus_size`` and save a full pass."""
        first = corpus.select(vec_col).first()
        if first is None:
            raise ValueError("cannot build a PqIndex on an empty corpus")
        dim = len(first[0])
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        if fit_fraction is None:
            n_total = corpus.count()
            frac = min(1.0, fit_rows / max(n_total, 1))
        else:
            frac = float(fit_fraction)
            if not 0.0 < frac <= 1.0:
                raise ValueError(
                    f"fit_fraction must be in (0, 1], got {frac}")
        sample = (corpus.sample(fraction=frac, seed=seed)
                  if frac < 1.0 else corpus)
        rows = sample.select(vec_col).limit(fit_rows).collect()
        if not rows:
            # a too-small fit_fraction on a small corpus — fail with the
            # clear error the empty-corpus path raises, not a numpy
            # AxisError inside _normalize (round-5 review batch 11)
            raise ValueError(
                f"fit sample is empty (fit_fraction={frac} over this "
                f"corpus) — raise fit_fraction or drop it to sample by "
                f"fit_rows")
        X = np.asarray([r[0] for r in rows], dtype=np.float64)
        books = _fit_pq_books(cls._normalize(X), m, n_codes, seed,
                              max_iter)    # (m, n_codes, dsub)
        codes = cls._encode(corpus, books, id_col, vec_col)
        return cls(books, codes, id_col, vec_col)

    @staticmethod
    def _encode(df: DataFrame, books: np.ndarray, id_col: str,
                vec_col: str) -> DataFrame:
        m, n_codes, dsub = books.shape
        src = df.select(F.col(id_col).alias("cand_id"),
                        F.col(vec_col).cast("array<double>").alias("_v"))

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bnorm = (books ** 2).sum(axis=2)            # (m, n_codes)
            for b in batches:
                if not len(b):
                    continue
                V = np.stack(b["_v"].to_numpy()).astype(np.float64)
                yield pd.DataFrame({
                    "cand_id": b["cand_id"],
                    "codes": list(_pq_codes(PqIndex._normalize(V), books,
                                            bnorm)),
                    "_cv": b["_v"],
                })

        out_schema = ("cand_id "
                      + src.schema["cand_id"].dataType.simpleString()
                      + ", codes array<int>, _cv array<double>")
        return src.mapInPandas(gen, out_schema)

    # -- search -----------------------------------------------------------

    def search(self, queries: DataFrame, k: int = 10,
               rerank: bool = True, rerank_factor: int = 4) -> DataFrame:
        """Top-k per query: ADC over the codes table (each Arrow batch
        scores ALL queries against its candidates via lookup-table sums —
        no vector arithmetic), local top-``k·rerank_factor`` per batch,
        then exact cosine rerank of the global shortlist (``rerank=True``)
        or ADC-score ordering (``rerank=False``). Query set must be
        broadcastable (collected once — the :func:`cosine_topk`
        contract)."""
        id_col, vec_col = self.id_col, self.vec_col
        qrows = (queries.select(F.col(id_col).alias("qid"),
                                F.col(vec_col).alias("v")).collect())
        books = self.codebooks
        m, n_codes, dsub = books.shape
        kk = int(k) * (int(rerank_factor) if rerank else 1)
        if qrows:
            qids = [r["qid"] for r in qrows]
            Q = self._normalize(np.asarray([r["v"] for r in qrows],
                                           dtype=np.float64))
            # LUT[q, j, c] = dot(q_subj, book_j[c]): cosine(q, x) ≈
            # Σ_j LUT[q, j, codes_j(x)] (vectors are L2-normalized)
            luts = np.stack([
                Q[:, j * dsub:(j + 1) * dsub] @ books[j].T
                for j in range(m)], axis=1)             # (nq, m, dsub→codes)
        else:
            qids, luts = [], np.zeros((0, m, n_codes))
        # the real id type, not an isinstance guess — double/decimal/date
        # ids would otherwise coerce (or error) through Arrow as int64
        qid_type = queries.schema[id_col].dataType.simpleString()

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            nq = len(qids)
            if not nq:
                return
            for b in batches:
                if not len(b):
                    continue
                C = np.stack(b["codes"].to_numpy())      # (batch, m)
                approx = np.zeros((nq, len(b)))
                for j in range(m):
                    approx += luts[:, j, C[:, j]]
                top = min(kk, len(b))
                idx = np.argpartition(-approx, top - 1, axis=1)[:, :top]
                out = {"query_id": [], "cand_id": [], "_adc": []}
                ids = b["cand_id"].to_numpy()
                for qi in range(nq):
                    out["query_id"] += [qids[qi]] * top
                    out["cand_id"] += list(ids[idx[qi]])
                    out["_adc"] += list(approx[qi, idx[qi]])
                yield pd.DataFrame(out)

        cand_type = (self.codes.schema["cand_id"].dataType.simpleString())
        # the ADC scan moves ONLY (id, codes) through Arrow — never the
        # vectors (that is the point of PQ); rerank joins vectors for the
        # shortlist alone
        local = self.codes.select("cand_id", "codes").mapInPandas(
            gen, f"query_id {qid_type}, cand_id {cand_type}, _adc double")
        # reduce to the GLOBAL kk shortlist before the rerank joins — the
        # map-side candidates are per-batch top-kk, so without this
        # window the vector join processes num_batches × kk rows per
        # query instead of kk (same shape as IvfPqIndex.search)
        w_adc = Window.partitionBy("query_id").orderBy(F.desc("_adc"),
                                                       F.asc("cand_id"))
        short = (local.withColumn("_r", F.row_number().over(w_adc))
                 .where(F.col("_r") <= kk).drop("_r"))
        if rerank:
            qv = (queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("_qv")))
            scored = (short.join(self.codes.select("cand_id", "_cv"),
                                 "cand_id")
                      .join(F.broadcast(qv), "query_id")
                      .withColumn("_s", cosine(F.col("_qv"), F.col("_cv"))))
        else:
            scored = short.withColumn("_s", F.col("_adc"))
        w = Window.partitionBy("query_id").orderBy(F.desc("_s"),
                                                   F.asc("cand_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= int(k))
                .select("query_id", F.col("cand_id").alias(id_col),
                        F.round("_s", 4).alias("cosine"), "rank"))

    def add(self, new_vectors: DataFrame) -> "PqIndex":
        """Incremental ingest: encode the delta with the FROZEN codebooks
        and append — like :meth:`IvfIndex.add`, the quantizer does not
        refit (codebook drift would silently re-code history), so a
        distribution shift in the delta degrades its own quantization
        error, not the index's consistency."""
        delta = self._encode(new_vectors, self.codebooks, self.id_col,
                             self.vec_col)
        return PqIndex(self.codebooks, self.codes.unionByName(delta),
                       self.id_col, self.vec_col)

    def persist(self) -> "PqIndex":
        """Pin the codes table for repeated searches on a freshly built
        index: without this (or a :meth:`save`/:meth:`load` round-trip,
        whose parquet scans prune to the code columns), every search
        action re-runs the corpus encode through the lazy lineage —
        twice per rerank search (ADC branch + vector-join branch)."""
        from pyspark import StorageLevel
        self.codes.persist(StorageLevel.MEMORY_AND_DISK)
        return self

    def unpersist(self) -> None:
        self.codes.unpersist()

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        spark = self.codes.sparkSession
        self.codes.write.mode("overwrite").parquet(f"{path}/codes")
        _save_books(spark, path, self.codebooks)
        m, n_codes, dsub = self.codebooks.shape
        (spark.createDataFrame(
            [(m, n_codes, dsub, self.id_col, self.vec_col)],
            "m int, n_codes int, dsub int, id_col string, vec_col string")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))

    @classmethod
    def load(cls, spark, path: str) -> "PqIndex":
        meta = spark.read.parquet(f"{path}/meta").first()
        books = _load_books(spark, path, meta["m"], meta["n_codes"],
                            meta["dsub"])
        return cls(books, spark.read.parquet(f"{path}/codes"),
                   meta["id_col"], meta["vec_col"])


# ----------------------------------------------------- IVF-PQ (IVFADC) ------

class IvfPqIndex:
    """IVF + residual product quantization — the IVFADC layout (Jégou,
    Douze & Schmid 2011 §V): a coarse quantizer routes each vector to a
    cell, PQ encodes the RESIDUAL (normalized vector minus its cell
    centroid), and a query scores candidates as

        cosine(q, x) ≈ q·c_cell  +  Σ_j LUT[q, j, codes_j(x)]

    — the cell term comes free from probe assignment, the residual term is
    ``m`` lookup-table adds per candidate. This is the billion-scale ANN
    shape: the probe prunes the corpus to ``n_probe/n_cells`` of its lists
    AND the scored rows carry ``m`` bytes of codes instead of the vector,
    so the shortlist scan is both sublinear and IO-thin. Exact rerank on
    the stored vectors (``rerank=True``, default) then fixes the head of
    the list — recall is the only approximation.

    Residual codebooks are SHARED across cells (the paper's choice):
    per-cell books would be ``n_cells×`` more driver state and need a
    per-cell fit sample, for marginal recall at these list sizes.

    Layout: ``<path>/codes`` (cand_id, cell, codes, vector),
    ``<path>/centroids``, ``<path>/books``, ``<path>/meta``.
    """

    def __init__(self, centroids: np.ndarray, codebooks: np.ndarray,
                 codes: DataFrame, id_col: str, vec_col: str):
        self.centroids = centroids          # (n_cells, dim), L2-normalized
        self.codebooks = codebooks          # (m, n_codes, dsub) residual books
        self.codes = codes                  # (cand_id, cell, codes, _cv)
        self.id_col, self.vec_col = id_col, vec_col

    # -- build ------------------------------------------------------------

    @classmethod
    def build(cls, corpus: DataFrame, n_cells: int = 64, m: int = 8,
              n_codes: int = 256, seed: int = 42, max_iter: int = 20,
              fit_fraction: float = 1.0, fit_rows: int = 20_000,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> "IvfPqIndex":
        """Coarse quantizer via :meth:`IvfIndex.build` (Spark ML KMeans,
        ``fit_fraction`` sampling), residual codebooks via the same
        bounded driver-side fit as :meth:`PqIndex.build` (codebooks are
        statistics, not data), corpus encode executor-side (one argmin
        matmul per subspace per Arrow batch)."""
        first = corpus.select(vec_col).first()
        if first is None:
            raise ValueError("cannot build an IvfPqIndex on an empty corpus")
        dim = len(first[0])
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
        ivf = IvfIndex.build(corpus, n_cells=n_cells, seed=seed,
                             max_iter=max_iter, fit_fraction=fit_fraction,
                             id_col=id_col, vec_col=vec_col)
        C = ivf.centroids
        # residual fit sample: bounded driver-side collect, residuals
        # computed here so the k-means sees exactly what encode() will see.
        # fit_fraction < 1 doubles as the sample rate here too, skipping
        # the corpus count (one full pass saved at scale)
        if fit_fraction < 1.0:
            frac = fit_fraction
        else:
            n_total = corpus.count()
            frac = min(1.0, fit_rows / max(n_total, 1))
        samp = (ivf.cells.sample(fraction=frac, seed=seed)
                if frac < 1.0 else ivf.cells)
        rows = samp.select("cell", "_cv").limit(fit_rows).collect()
        if not rows:
            raise ValueError(
                f"residual fit sample is empty (fit_fraction={frac} over "
                f"this corpus) — raise fit_fraction or drop it to sample "
                f"by fit_rows")
        V = PqIndex._normalize(np.asarray([r["_cv"] for r in rows],
                                          dtype=np.float64))
        R = V - C[np.asarray([r["cell"] for r in rows])]
        books = _fit_pq_books(R, m, n_codes, seed, max_iter)
        codes = cls._encode(ivf.cells, C, books)
        return cls(C, books, codes, id_col, vec_col)

    @staticmethod
    def _encode(cells: DataFrame, centroids: np.ndarray,
                books: np.ndarray) -> DataFrame:
        """(cand_id, cell, _cv) → + codes: residual-quantize each vector
        against its ASSIGNED cell's centroid with the shared books."""
        bnorm = (books ** 2).sum(axis=2)                 # (m, n_codes)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                if not len(b):
                    continue
                V = PqIndex._normalize(
                    np.asarray(list(b["_cv"]), dtype=np.float64))
                R = V - centroids[b["cell"].to_numpy()]
                yield pd.DataFrame({
                    "cand_id": b["cand_id"], "cell": b["cell"],
                    "codes": list(_pq_codes(R, books, bnorm)),
                    "_cv": b["_cv"]})

        out_schema = ("cand_id "
                      + cells.schema["cand_id"].dataType.simpleString()
                      + ", cell int, codes array<int>, _cv "
                      + cells.schema["_cv"].dataType.simpleString())
        return cells.mapInPandas(gen, out_schema)

    # -- search -----------------------------------------------------------

    def search(self, queries: DataFrame, k: int = 10, n_probe: int = 8,
               rerank: bool = True, rerank_factor: int = 4) -> DataFrame:
        """Top-k per query: probe the ``n_probe`` nearest cells (one
        vectorized matmul for the whole batch), ADC-score ONLY the probed
        lists' codes (the vectors never move), shortlist
        ``k·rerank_factor`` per query, exact-rerank the shortlist
        (``rerank=True``) or order by ADC. ``n_probe = n_cells`` with a
        shortlist ≥ list sizes ⇒ exact. Query set must be broadcastable
        (collected once — the :func:`cosine_topk` contract)."""
        id_col, vec_col = self.id_col, self.vec_col
        qrows = queries.select(F.col(id_col).alias("qid"),
                               F.col(vec_col).alias("v")).collect()
        C, books = self.centroids, self.codebooks
        m, n_codes, dsub = books.shape
        kk = int(k) * (int(rerank_factor) if rerank else 1)
        spark = queries.sparkSession
        from pyspark.sql.types import (DoubleType, IntegerType, StructField,
                                       StructType)
        id_type = queries.schema[id_col].dataType
        if qrows:
            qids = [r["qid"] for r in qrows]
            Q = PqIndex._normalize(np.asarray([r["v"] for r in qrows],
                                              dtype=np.float64))
            sims = Q @ C.T                               # (nq, n_cells)
            npb = min(int(n_probe), sims.shape[1])
            top = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
            # probe rows carry the q·centroid term — the ADC stage adds it
            # to the residual lookup sum, so the executor never needs Q
            probe_rows = [(qid, int(c), float(sims[qi, c]))
                          for qi, qid in enumerate(qids) for c in top[qi]]
            luts = np.stack([Q[:, j * dsub:(j + 1) * dsub] @ books[j].T
                             for j in range(m)], axis=1)  # (nq, m, n_codes)
            qpos = {qid: i for i, qid in enumerate(qids)}
        else:
            probe_rows, luts, qpos = [], np.zeros((0, m, n_codes)), {}
        probes = spark.createDataFrame(
            probe_rows, StructType([StructField("query_id", id_type),
                                    StructField("cell", IntegerType()),
                                    StructField("_qc", DoubleType())]))
        cand = (self.codes.select("cand_id", "cell", "codes")
                .join(F.broadcast(probes), "cell")
                .select("query_id", "_qc", "cand_id", "codes"))

        def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            if not qpos:
                return
            for b in batches:
                if not len(b):
                    continue
                qi = b["query_id"].map(qpos).to_numpy()
                Cd = np.stack(b["codes"].to_numpy())     # (batch, m)
                s = b["_qc"].to_numpy().astype(float)
                for j in range(m):
                    s = s + luts[qi, j, Cd[:, j]]
                # map-side pre-top: emit only each query's local top-kk —
                # without this the shortlist window funnels a query's
                # ENTIRE probed candidate set (≈ corpus × n_probe /
                # n_cells rows) into one task
                keep = _local_topk_per_query(qi, s, kk)
                yield pd.DataFrame(
                    {"query_id": b["query_id"].iloc[keep],
                     "cand_id": b["cand_id"].iloc[keep],
                     "_adc": s[keep]})

        cand_type = self.codes.schema["cand_id"].dataType.simpleString()
        qid_sql = id_type.simpleString()
        scored = cand.mapInPandas(
            adc, f"query_id {qid_sql}, cand_id {cand_type}, _adc double")
        w = Window.partitionBy("query_id").orderBy(F.desc("_adc"),
                                                   F.asc("cand_id"))
        short = (scored.withColumn("_r", F.row_number().over(w))
                 .where(F.col("_r") <= kk).drop("_r"))
        if rerank:
            qv = queries.select(F.col(id_col).alias("query_id"),
                                F.col(vec_col).alias("_qv"))
            final = (short.join(self.codes.select("cand_id", "_cv"),
                                "cand_id")
                     .join(F.broadcast(qv), "query_id")
                     .withColumn("_s", cosine(F.col("_qv"), F.col("_cv"))))
        else:
            final = short.withColumn("_s", F.col("_adc"))
        w2 = Window.partitionBy("query_id").orderBy(F.desc("_s"),
                                                    F.asc("cand_id"))
        return (final.withColumn("rank", F.row_number().over(w2))
                .where(F.col("rank") <= int(k))
                .select("query_id", F.col("cand_id").alias(id_col),
                        F.round("_s", 4).alias("cosine"), "rank"))

    # -- incremental ingest -------------------------------------------------

    def add(self, new_vectors: DataFrame) -> "IvfPqIndex":
        """Assign the delta to the FROZEN centroids and residual-encode
        with the FROZEN books — O(delta) work, no refit (quantizer drift
        would silently re-code history; re-``build`` when fresh-data
        recall degrades, the standard IVF trade-off)."""
        cells = _assign_original(new_vectors, self.centroids,
                                 self.id_col, self.vec_col)
        delta = self._encode(cells, self.centroids, self.codebooks)
        return IvfPqIndex(self.centroids, self.codebooks,
                          self.codes.unionByName(delta),
                          self.id_col, self.vec_col)

    def persist(self) -> "IvfPqIndex":
        """See :meth:`PqIndex.persist` — same repeated-search contract."""
        from pyspark import StorageLevel
        self.codes.persist(StorageLevel.MEMORY_AND_DISK)
        return self

    def unpersist(self) -> None:
        self.codes.unpersist()

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        spark = self.codes.sparkSession
        self.codes.write.mode("overwrite").parquet(f"{path}/codes")
        cent = [(int(i), [float(x) for x in row])
                for i, row in enumerate(self.centroids)]
        (spark.createDataFrame(cent, "cell int, centroid array<double>")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))
        _save_books(spark, path, self.codebooks)
        m, n_codes, dsub = self.codebooks.shape
        (spark.createDataFrame(
            [(m, n_codes, dsub, self.id_col, self.vec_col)],
            "m int, n_codes int, dsub int, id_col string, vec_col string")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))

    @classmethod
    def load(cls, spark, path: str) -> "IvfPqIndex":
        meta = spark.read.parquet(f"{path}/meta").first()
        crows = (spark.read.parquet(f"{path}/centroids")
                 .orderBy("cell").collect())
        centroids = np.asarray([r["centroid"] for r in crows],
                               dtype=np.float64)
        books = _load_books(spark, path, meta["m"], meta["n_codes"],
                            meta["dsub"])
        return cls(centroids, books, spark.read.parquet(f"{path}/codes"),
                   meta["id_col"], meta["vec_col"])
