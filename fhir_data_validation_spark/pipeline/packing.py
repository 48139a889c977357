"""Sequence packing: concat-and-chunk tokenized documents into fixed-length
training sequences.

The standard LLM-pretraining layout: within a shard, document token streams
are concatenated in a deterministic order and the stream is cut every
``seq_len`` tokens; documents may straddle a cut. Everything is window
arithmetic + one ``explode`` — no Python in the plan, no data-dependent
iteration — so the mapping is a single whole-stage-codegen pass after one
shuffle per shard window.

Scale shape (100 TB): a running total needs its shard in ONE task, so shard
granularity bounds parallelism AND per-task size. Pack per source-file /
hash-bucket shards of ~10⁵–10⁶ docs (`with_shards`): packing is then
embarrassingly parallel across shards, and sequence ids are (shard, seq) —
globally unique without any cross-shard coordination. Assembly state is
bounded by construction: one output group holds ≤ ``seq_len`` tokens
regardless of document sizes.

No reference analog (the reference validates per-resource payloads,
``Core/ValidationPipeline.cs``); this is training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_shards(df: DataFrame, n_shards: int, key_col: str = "doc_id",
                shard_col: str = "shard") -> DataFrame:
    """Deterministic hash sharding: ``shard = xxhash64(key) mod n_shards``.
    Use before :func:`pack_sequences` when the corpus has no natural shard
    column — shard count should track cluster parallelism (each shard is
    one window task)."""
    return df.withColumn(
        shard_col, F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                          F.lit(n_shards)).cast("int"))


def pack_sequences(df: DataFrame, seq_len: int, shard_col: str = "source",
                   id_col: str = "doc_id", tokens_col: str = "tokens",
                   n_tok_col: str = "n_tok",
                   order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Document→sequence piece mapping for concat-and-chunk packing.

    Within each ``shard_col`` group, documents are ordered by
    ``order_cols`` (default: ``id_col``), their token streams concatenated,
    and the stream cut every ``seq_len`` tokens. One output row per
    (document, overlapped sequence):

    - ``shard``, ``seq`` — packed-sequence key; ``seq`` is 0-based within
      the shard.
    - ``doc_id``, ``doc_offset`` — 0-based start of the piece within the
      document's tokens.
    - ``seq_offset`` — 0-based start of the piece within the packed
      sequence.
    - ``piece_len`` — piece length; ``piece`` — the token slice itself.

    Zero-token documents are dropped (they occupy no stream positions).
    Every sequence except possibly a shard's last has exactly ``seq_len``
    tokens; pieces within a sequence tile it exactly (asserted by the
    pytest invariants and the DuckDB oracle).

    All stream/cut arithmetic derives from ``size(tokens_col)`` — the
    array actually sliced — so a stale ``n_tok`` column can never lose
    tail tokens or shift every later token in a sequence (round-5
    review batch 11); ``n_tok_col`` remains accepted for signature
    compatibility but the array is the single source of truth.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    # id_col always tie-breaks so a non-unique custom order still packs
    # deterministically
    order = [F.col(c) for c in (*order_cols, id_col)
             ] if order_cols else [F.col(id_col)]
    w = (Window.partitionBy(shard_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.size(F.col(tokens_col)).cast("long")
    end = F.sum(n).over(w)            # stream offset after this doc
    start = (end - n).alias("_start")  # stream offset of this doc's first token
    L = F.lit(int(seq_len)).cast("long")

    # `div` = exact integer division (a double-based floor() would lose
    # integer precision past 2^53 stream offsets)
    spans = (df.where(n > 0)
             .select(F.col(shard_col).alias("shard"), F.col(id_col),
                     F.col(tokens_col).alias("_toks"),
                     start, end.alias("_end"))
             .withColumn("seq", F.explode(F.expr(
                 f"sequence(_start div {int(seq_len)}, "
                 f"(_end - 1) div {int(seq_len)})"))))
    seq_start = F.col("seq") * L
    piece_start = F.greatest(F.col("_start"), seq_start)     # global, inclusive
    piece_end = F.least(F.col("_end"), seq_start + L)        # global, exclusive
    doc_offset = (piece_start - F.col("_start")).alias("doc_offset")
    piece_len = (piece_end - piece_start).alias("piece_len")
    return spans.select(
        "shard", F.col("seq").cast("long").alias("seq"), id_col,
        doc_offset, (piece_start - seq_start).alias("seq_offset"), piece_len,
        F.slice(F.col("_toks"), (piece_start - F.col("_start") + 1).cast("int"),
                (piece_end - piece_start).cast("int")).alias("piece"))


def chunk_windows(df: DataFrame, window: int, stride: int | None = None,
                  id_col: str = "doc_id",
                  tokens_col: str = "tokens") -> DataFrame:
    """Sliding-window chunking: cut each document's token array into
    (optionally overlapping) windows of ``window`` tokens every ``stride``
    tokens — the RAG / long-context-eval chunk layout, the overlap-keeping
    dual of :func:`pack_sequences`' exact tiling.

    Chunk starts are ``0, stride, 2·stride, …``; the last chunk is the
    first one whose end reaches the document end (it may be shorter than
    ``window``), so no chunk is a pure suffix of its predecessor and —
    whenever ``stride <= window`` — every token is covered. A ``stride``
    larger than ``window`` is allowed and samples disjoint windows with
    gaps (frame-sampling layout). One output row per (document, chunk):
    ``(id, chunk, chunk_start, chunk_len, chunk_tokens)`` with ``chunk``
    0-based. Zero-token documents yield no chunks.

    Scale shape: ``sequence`` + ``posexplode`` + ``slice`` — one
    whole-stage-codegen projection, no shuffle, no Python; output size is
    bounded by ``ceil(n/stride)`` rows per document. Chunks inherit the
    scan's partitioning, so a downstream embed/index stage starts without
    an exchange.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    stride = window if stride is None else stride
    if stride <= 0:
        raise ValueError("stride must be positive")
    n = F.size(F.col(tokens_col)).cast("long")
    W = F.lit(int(window)).cast("long")
    S = F.lit(int(stride)).cast("long")
    # chunks = 1 if n <= window else 1 + ceil((n - window) / stride),
    # capped at ceil(n / stride) so every start stays < n: with
    # stride > window the uncapped formula would schedule a start past
    # the document end (negative slice length → runtime error) or an
    # empty chunk at start == n. For stride <= window the cap is inert.
    # Integer ceil via (a + S - 1) div S keeps the arithmetic exact past
    # 2^53 (same rationale as pack_sequences' `div`)
    n_chunks = F.least(
        F.when(n <= W, F.lit(1).cast("long"))
         .otherwise(F.expr(
             f"1 + (size({tokens_col}) - {int(window)}"
             f" + {int(stride)} - 1) div {int(stride)}")),
        F.expr(f"(size({tokens_col}) + {int(stride)} - 1)"
               f" div {int(stride)}"))
    out = (df.where(n > 0)
             .select(F.col(id_col), F.col(tokens_col).alias("_toks"),
                     F.explode(F.sequence(F.lit(0).cast("long"),
                                          n_chunks - 1)).alias("_i")))
    start = F.col("_i") * S
    chunk_len = F.least(W, F.size("_toks").cast("long") - start)
    return out.select(
        id_col, F.col("_i").alias("chunk"),
        start.alias("chunk_start"), chunk_len.alias("chunk_len"),
        F.slice(F.col("_toks"), (start + 1).cast("int"),
                chunk_len.cast("int")).alias("chunk_tokens"))


def assemble_sequences(pieces: DataFrame,
                       include_spans: bool = False) -> DataFrame:
    """Materialize packed sequences from :func:`pack_sequences` output:
    ``(shard, seq, tokens, n_tok, n_docs)``. Per-group state is ≤
    ``seq_len`` tokens by construction (pieces tile the sequence), so the
    aggregation is safe at any document-size distribution — this is NOT an
    unbounded ``collect_list`` over raw documents.

    ``include_spans=True`` adds ``doc_spans`` — ``array<struct<doc_id,
    start, len>>`` in sequence order, one entry per document piece — the
    boundaries an attention mask / loss mask needs to stop documents
    attending across each other inside a packed sequence."""
    sorted_pieces = F.array_sort(F.collect_list(
        F.struct(F.col("seq_offset").alias("o"),
                 F.col("piece").alias("p"),
                 F.col("doc_id").alias("d"),
                 F.col("piece_len").alias("l"))))
    aggs = [F.flatten(sorted_pieces.getField("p")).alias("tokens"),
            F.sum("piece_len").cast("int").alias("n_tok"),
            F.count("*").cast("int").alias("n_docs")]
    if include_spans:
        aggs.append(F.transform(
            sorted_pieces,
            lambda s: F.struct(s["d"].alias("doc_id"),
                               s["o"].alias("start"),
                               s["l"].cast("int").alias("len")))
            .alias("doc_spans"))
    return pieces.groupBy("shard", "seq").agg(*aggs)
