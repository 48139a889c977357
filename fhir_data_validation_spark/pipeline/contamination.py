"""Benchmark contamination detection: n-gram overlap between a training
corpus and an evaluation/benchmark set.

The standard pre-training hygiene check (GPT-3 §C / PaLM-style): a training
document is contaminated when it shares long word n-grams (conventionally
13-grams) with a benchmark document. Shape at 100 TB:

- the BENCHMARK side is small (eval sets are ~10^4–10^6 documents), so its
  distinct shingle-hash set broadcasts;
- the corpus side is ONE scan: shingle → explode → broadcast-hash join
  keeps only the hitting shingles, so the (tiny) aggregation shuffle
  carries hits, never the corpus's full shingle stream;
- per-doc state is two counters — no collected sets.

Hashes default to ``xxhash64`` (fixed-width JVM hash, no string shuffle
keys); ``md5_60`` mirrors bit-for-bit into the DuckDB oracle
(``pipeline/dedup.py`` d4 precedent).

No reference analog; training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _widen, _word_hash, shingle_hashes, word_shingles


def _shingle_set(col: Column, n: int, hash_fn: str) -> Column:
    """Distinct n-word shingle hashes under the chosen hash primitive."""
    if hash_fn == "xxhash64":
        return shingle_hashes(col, n)
    return F.transform(word_shingles(col, n),
                       lambda s: _word_hash(s, hash_fn))


def token_shingles(tokens: Column, n: int = 13) -> Column:
    """Distinct hashes of n-TOKEN windows over an ``array<int>`` token
    sequence (the token-native analog of :func:`_shingle_set` for corpora
    that carry tokenizer output instead of text). Sequences shorter than
    ``n`` tokens yield their whole sequence as one shingle; empty/null
    sequences yield an empty set."""
    # null elements serialize as a sentinel BEFORE concat_ws (which
    # silently DROPS nulls): [1, null, 2] must not hash like [1, 2] —
    # a doc could be flagged by, or evade, a window it doesn't share
    # (round-5 review batch 12)
    def ser(arr: Column) -> Column:
        return F.concat_ws(",", F.transform(
            arr, lambda t: F.coalesce(t.cast("string"), F.lit("␀"))))

    k = F.size(tokens)
    shingled = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.xxhash64(ser(F.slice(tokens, i, n))))
    return F.array_distinct(
        F.when(k >= n, shingled)
         .when(k > 0, F.array(F.xxhash64(ser(tokens))))
         .otherwise(F.array().cast("array<long>")))


def benchmark_contamination(docs: DataFrame, benchmark: DataFrame,
                            n: int = 13, text_col: str = "text",
                            id_col: str = "doc_id",
                            bench_text_col: str | None = None,
                            min_overlap: int = 1,
                            hash_fn: str = "xxhash64",
                            tokens_col: str | None = None,
                            bench_tokens_col: str | None = None
                            ) -> DataFrame:
    """Per-document contamination against a benchmark set.

    Returns ``(doc_id, n_shingles, n_overlap, ratio)`` for corpus documents
    sharing ≥ ``min_overlap`` distinct n-gram shingles with ANY benchmark
    document; ``ratio = n_overlap / n_shingles`` in [0, 1]. Documents
    shorter than ``n`` words contribute their whole word sequence as one
    shingle (same convention as the dedup family), so exact short
    duplicates of benchmark text are still caught.

    Pass ``tokens_col`` (an ``array<int>`` column) to shingle n-TOKEN
    windows via :func:`token_shingles` instead of word n-grams — the
    token-native path for pre-tokenized corpora (both sides must be
    tokenized by the same tokenizer for overlap to be meaningful).
    """
    if min_overlap < 1:
        raise ValueError("min_overlap must be >= 1")
    if bench_tokens_col and not tokens_col:
        # a token-shingled benchmark against a WORD-shingled corpus can
        # never overlap (different hash domains) — the old code silently
        # ignored bench_tokens_col and shingled benchmark TEXT instead
        # (round-5 review batch 12)
        raise ValueError(
            "bench_tokens_col needs tokens_col too — word-hash and "
            "token-hash shingles never overlap across sides")

    def shingles(col: Column, token_side: bool) -> Column:
        if token_side:
            return token_shingles(col, n)
        return _shingle_set(col, n, hash_fn)

    bench_col = (F.col(bench_tokens_col or tokens_col)
                 if tokens_col else F.col(bench_text_col or text_col))
    bench_sh = (benchmark
                .select(F.explode(shingles(bench_col, tokens_col is not None))
                        .alias("sh"))
                .distinct())
    doc_col = F.col(tokens_col) if tokens_col else F.col(text_col)
    # _widen: shingling is interpreted-HOF CPU; a few input files would pin
    # it to a few cores (measured 6× on this host's 3-file seeded union)
    # No size()>0 pre-filter: explode of an empty set emits nothing anyway,
    # and the predicate would be PUSHED BELOW the widen exchange, where it
    # re-evaluates the whole interpreted shingle expression per row on the
    # narrow input partitions (measured 2× the query's entire cost)
    doc_sh = (_widen(docs)
              .select(F.col(id_col),
                      shingles(doc_col, tokens_col is not None)
                      .alias("_shs"))
              .withColumn("n_shingles", F.size("_shs"))
              .select(id_col, "n_shingles", F.explode("_shs").alias("sh")))
    hits = doc_sh.join(F.broadcast(bench_sh), "sh")
    return (hits.groupBy(id_col)
            .agg(F.first("n_shingles").alias("n_shingles"),
                 F.count("*").cast("long").alias("n_overlap"))
            .where(F.col("n_overlap") >= min_overlap)
            .withColumn("ratio", F.round(F.col("n_overlap")
                                         / F.col("n_shingles"), 4)))


def remove_contaminated(docs: DataFrame, benchmark: DataFrame,
                        threshold: float = 0.5, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str | None = None,
                        hash_fn: str = "xxhash64") -> DataFrame:
    """Corpus minus documents whose contamination ``ratio ≥ threshold`` —
    a broadcast anti-join against the (small) flagged-id set, preserving
    the corpus schema and partitioning."""
    flagged = (benchmark_contamination(docs, benchmark, n, text_col, id_col,
                                       bench_text_col, hash_fn=hash_fn)
               .where(F.col("ratio") >= threshold)
               .select(id_col))
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
