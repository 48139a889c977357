"""Text analysis operators: tokenization, quality, language id, fingerprints.

Everything compiles to native Catalyst expressions (split/rlike/
regexp_extract_all/aggregate) — no Python in the scan path, so a 100 TB
documents table is one whole-stage-codegen pass. Each operator has an exact
ANSI-SQL twin used by the DuckDB oracle (``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GPT-2-ish coarse token pattern: word | number | single punctuation.
# Kept to the regex subset with identical semantics in Java regex and RE2
# so the DuckDB oracle can state the same expression.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]"

# tiny per-language stopword lexicons for the n-gram/stopword language-id
# heuristic (deterministic, closed-world — not a model)
LANG_LEXICON = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "les", "des", "et", "est", "une", "dans"],
    "es": ["el", "los", "las", "y", "es", "una", "que"],
}

EN_STOPWORDS = LANG_LEXICON["en"] + ["it", "that", "for", "on", "with"]


def words(col: Column) -> Column:
    """Lower-cased alphanumeric word array (empty strings removed)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda w: w != "")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0, NULL stays
    NULL. Splits on FULL whitespace (``\\s``) and discards boundary
    empties — the old trim-then-split chain stripped only SPACES
    (Spark ``trim`` semantics), so a newline-terminated doc gained a
    phantom trailing token, a blank-but-newline doc counted 2, and a
    CRLF doc glued ``\\r`` onto its tokens (round-5 review batch 12)."""
    # explicit class, not \s: Java \s includes \x0B where RE2's does
    # not — the oracle states the identical class (round-5 batch 13)
    toks = F.filter(F.split(col, "[ \\t\\n\\x0B\\f\\r]+"),
                    lambda w: w != "")
    return F.when(col.isNull(), F.lit(None).cast("int")) \
            .otherwise(F.size(toks))


def token_count_bpe(col: Column) -> Column:
    """Coarse BPE-ish token count via regex matches (word/number/punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def quality_score(col: Column, n_chars: Column | None = None) -> Column:
    """Heuristic document quality in [0, 1]: alphabetic density, sane mean
    word length, stopword presence. The exact arithmetic is mirrored in the
    oracle SQL; keep both in sync."""
    n = (n_chars if n_chars is not None else F.length(col)).cast("double")
    ws = words(col)
    n_words = F.size(ws).cast("double")
    alpha = F.length(F.regexp_replace(col, "[^a-zA-Z]", "")).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_words > 0, alpha / n_words).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0),
                     F.lit(1.0)).otherwise(F.lit(0.0))
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(EN_STOPWORDS)))
    stop_ratio = F.when(n_words > 0,
                        stop_hits.cast("double") / n_words).otherwise(F.lit(0.0))
    stop_ok = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6),
                     F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.5 * alpha_ratio + 0.25 * wlen_ok + 0.25 * stop_ok, 4)


def lang_id(col: Column) -> Column:
    """Stopword-lexicon language id: argmax of per-language hit counts,
    ``und`` (undetermined) when nothing matches. Ties break in the fixed
    lexicon order — deterministic."""
    ws = words(col)

    # NOTE: F.filter introspects the lambda's arity (2nd param = element
    # index), so the usual `lambda w, lex=lex:` capture trick breaks it —
    # use a closure factory instead.
    def in_lex(lex):
        return lambda w: w.isin(lex)

    hits = {lang: F.size(F.filter(ws, in_lex(lex)))
            for lang, lex in LANG_LEXICON.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed so earlier lexicon order wins ties
    for lang in reversed(list(LANG_LEXICON)):
        out = F.when((best > 0) & (hits[lang] == best), lang).otherwise(out)
    return out


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 of the whitespace-normalized
    lower-cased text (md5 so the DuckDB oracle computes the identical
    value; at scale this is one JVM hash per row either way)."""
    # collapse BEFORE trimming: Spark trim strips only spaces, so a
    # trailing tab/newline would survive an outer trim and become a
    # trailing space after the collapse — two docs identical up to a
    # trailing newline must fingerprint equal
    return F.md5(F.trim(F.regexp_replace(F.lower(col),
                                         "[ \\t\\n\\r]+", " "))
                 .cast("binary"))


def normalize_text(col: Column, form: str = "NFC",
                   lowercase: bool = False) -> Column:
    """Unicode-normalized (+ optionally lower-cased) text — the
    canonicalization pass before fingerprinting/dedup, so a decomposed
    ``café`` (e + U+0301) and its precomposed twin hash identically.

    Spark has no native Unicode-normalization expression, so this is the
    one text op on the Arrow path: a pandas UDF batching through
    ``Series.str.normalize`` (same tier as the drift statistics — never
    per-row Python). Lower-casing happens AFTER normalization, matching
    ``lower(nfc_normalize(x))`` in engines that have both.

    ``form`` ∈ NFC/NFKC/NFD/NFKD. NFC is the dedup default; NFKC also
    folds compatibility characters (ﬁ → fi, fullwidth digits) — more
    collisions, lossier text.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    import pandas as pd

    def _norm_fn(s):
        out = s.str.normalize(form)
        return out.str.lower() if lowercase else out

    # annotations set explicitly: this module's `from __future__ import
    # annotations` would stringify inline hints, defeating Spark's
    # pandas-UDF eval-type inference
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_norm_fn, "string")(col)


def _raw_ngrams(ws: Column, n: int) -> Column:
    """ALL n-word shingles, duplicates kept (unlike the dedup family's
    distinct sets — repetition metrics need the multiplicities). Documents
    shorter than ``n`` words yield no shingles (nothing can repeat)."""
    k = F.size(ws)
    return F.when(
        k >= n,
        F.transform(F.sequence(F.lit(1), k - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def dup_fraction(arr: Column) -> Column:
    """Fraction of array elements that are repeats of an earlier element:
    ``(n - n_distinct) / n``, 0.0 for empty arrays."""
    n = F.size(arr).cast("double")
    return F.round(
        F.when(n > 0, (n - F.size(F.array_distinct(arr))) / n)
         .otherwise(F.lit(0.0)), 4)


def repetition_profile(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       ngram_ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Gopher-style repetition signals, one codegen projection per corpus:
    duplicate-line, duplicate-word and duplicate-n-gram fractions (the
    "repetitious text" filters of Gopher §A.1.1, simplified to the
    duplicate-fraction family). High values ⇒ boilerplate loops, keyboard
    mash, template spam. Feed thresholds into a Range/CustomExpr rule or
    filter directly."""
    c = F.col(text_col)
    ws = words(c)
    # lines: CRLF-tolerant split, boundary/blank empties excluded — a
    # doc ending in two newlines otherwise counted duplicate "" lines
    # and inflated dup_line_frac (round-5 review batch 12)
    lines = F.filter(F.split(c, "\\r?\\n"), lambda l: l != "")
    out = [F.col(id_col),
           dup_fraction(lines).alias("dup_line_frac"),
           dup_fraction(ws).alias("dup_word_frac")]
    for n in ngram_ns:
        out.append(dup_fraction(_raw_ngrams(ws, n))
                   .alias(f"dup_{n}gram_frac"))
    return df.select(*out)


def analyze(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """One-pass text profile: id, token counts, quality, language,
    fingerprint — a single projection over the scan."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe(c).alias("n_tokens_bpe"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


# ------------------------------------------------------ vocabulary / OOV (t8)

def vocabulary(df: DataFrame, tokens_col: str = "tokens",
               min_count: int = 2, max_size: int | None = None) -> DataFrame:
    """Corpus vocabulary from a pre-tokenized table: ``(token, count)`` for
    every token id occurring at least ``min_count`` times, optionally
    truncated to the ``max_size`` most frequent (count desc, token asc —
    deterministic tiebreak).

    Scale shape: explode → hash aggregation on the token id. Map-side
    partial aggregation reduces each input partition to its distinct-token
    partials before the exchange, so hot token ids (Zipf head) never
    concentrate raw rows on one reducer — the shuffle carries at most
    |vocab| rows per input partition. ``max_size`` ranks with ONE total
    sort over the already-reduced vocab table, not over the corpus.
    """
    counts = (df.select(F.explode(tokens_col).alias("token"))
                .groupBy("token").agg(F.count(F.lit(1)).alias("count"))
                .where(F.col("count") >= int(min_count)))
    if max_size is not None:
        # rank over the reduced table; window without partition is fine
        # here because |vocab| rows fit one stage's sort at any corpus
        # size (vocab cardinality is bounded by the id space, not rows)
        from pyspark.sql import Window
        w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
        counts = (counts.withColumn("_rk", F.row_number().over(w))
                        .where(F.col("_rk") <= int(max_size)).drop("_rk"))
    return counts


def oov_profile(df: DataFrame, vocab: DataFrame,
                tokens_col: str = "tokens", id_col: str = "doc_id",
                broadcast_vocab: bool = True) -> DataFrame:
    """Per-document out-of-vocabulary profile against a vocabulary table
    (one ``token`` column): ``(id, n_tok, n_oov, oov_rate)`` counting
    token OCCURRENCES (multiplicity kept — ``array_except`` semantics
    would undercount repeated OOV tokens).

    Dataflow: explode → broadcast left join with the vocab (set
    ``broadcast_vocab=False`` for a vocabulary too large to broadcast —
    falls back to a shuffle hash join) → re-aggregate by document. A
    document's tokens live in ONE input row, so map-side partial
    aggregation collapses the exploded stream back to one partial row per
    document before the exchange: the shuffle carries O(documents), never
    O(tokens). Empty documents keep ``n_tok = 0`` with ``oov_rate`` null.
    """
    v = vocab.select(F.col("token").alias("_v_tok"),
                     F.lit(True).alias("_in_vocab")).distinct()
    if broadcast_vocab:
        v = F.broadcast(v)
    exploded = df.select(F.col(id_col).alias("id"),
                         F.explode_outer(tokens_col).alias("_tok"))
    joined = exploded.join(v, exploded["_tok"] == v["_v_tok"], "left")
    return (joined.groupBy("id")
            .agg(F.count("_tok").alias("n_tok"),
                 F.count(F.when(F.col("_tok").isNotNull()
                                & F.col("_in_vocab").isNull(), 1))
                  .alias("n_oov"))
            .withColumn("oov_rate",
                        F.when(F.col("n_tok") > 0,
                               F.col("n_oov") / F.col("n_tok"))
                         .cast("double"))
            # id column keeps the CALLER's name, like tfidf_topk — the
            # internal 'id' leaked and broke join-back (round-5 batch 12)
            .withColumnRenamed("id", id_col))


# ----------------------------------------------------------- TF-IDF (t9)

def tfidf_topk(df: DataFrame, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id",
               broadcast_idf: bool = True) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword-extraction
    / relevance-feature operator: ``score = tf · (ln((N+1)/(df+1)) + 1)``
    (smoothed idf, sklearn's ``smooth_idf`` convention) where ``N`` is the
    number of documents with at least one word.

    Output: ``(id, rank, term, tf, df, score)`` with ``rank`` 1-based by
    (score desc, term asc) — ties deterministic.

    Scale shape: explode → one map-side-combined hash agg to ``(doc,
    term, tf)`` → term-level agg to the document-frequency table (|vocab|
    rows; ``N`` is a 1-row agg cross-joined in, never a driver action) →
    join idf back (broadcast by default; ``broadcast_idf=False`` falls
    back to a shuffle hash join for vocabularies too large to broadcast)
    → per-document top-k window. The window partitions by document id —
    max partition size is the document's distinct-term count, so there is
    no skew at any corpus size.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window
    tf = (df.select(F.col(id_col).alias("id"),
                    F.explode(words(F.col(text_col))).alias("term"))
            .groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf")))
    n_docs = tf.agg(F.countDistinct("id").alias("_n"))
    docfreq = (tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
                 .crossJoin(F.broadcast(n_docs))
                 .withColumn("idf",
                             F.log((F.col("_n") + F.lit(1.0))
                                   / (F.col("df") + F.lit(1.0)))
                             + F.lit(1.0))
                 .drop("_n"))
    if broadcast_idf:
        docfreq = F.broadcast(docfreq)
    scored = (tf.join(docfreq, "term")
                .withColumn("score", F.col("tf") * F.col("idf")))
    w = Window.partitionBy("id").orderBy(F.col("score").desc(),
                                         F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select(F.col("id").alias(id_col), "rank", "term", "tf", "df",
                    "score"))


# --------------------------------------- char-model cross-entropy (t10)

def char_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus character unigram counts ``(ch, cnt)`` over the lower-cased
    text — the training pass of the cross-entropy quality model. One
    explode + map-side-combined aggregation; the result has at most
    |alphabet| rows."""
    return (df.select(F.explode(F.split(F.lower(F.col(text_col)), ""))
                      .alias("ch"))
            .where(F.col("ch") != "")
            .groupBy("ch").agg(F.count(F.lit(1)).alias("cnt")))


def char_cross_entropy(df: DataFrame, char_freq=None,
                       text_col: str = "text", id_col: str = "doc_id",
                       alpha: float = 0.5) -> DataFrame:
    """Per-document cross-entropy (bits/char) under a corpus character
    unigram model — the cheap stand-in for CCNet's LM-perplexity quality
    signal: gibberish, key-mash and wrong-script text score far above the
    corpus norm; filter or bucket on it like any other quality metric.

    ``char_freq`` is a :func:`char_frequencies` table (train on a clean
    reference corpus and score any other); default trains on ``df``
    itself. Laplace-``alpha`` smoothing covers unseen characters.

    Scale shape: the model is ≤ |alphabet| rows → collected once and
    embedded as a literal map, so SCORING is a pure codegen projection —
    ``transform`` + map lookup + ``aggregate`` — zero shuffle, zero
    Python, no join. Empty documents score null.
    """
    if char_freq is None:
        char_freq = char_frequencies(df, text_col)
    rows = char_freq.collect()
    total = sum(r["cnt"] for r in rows)
    vocab = len(rows) + 1                      # +1 unseen bucket
    denom = total + alpha * vocab
    import math
    # -log2 p(ch), Laplace-smoothed; unseen chars take the alpha-only mass
    bits = {r["ch"]: -math.log2((r["cnt"] + alpha) / denom) for r in rows}
    unseen = -math.log2(alpha / denom)
    pairs = []
    for ch, b in sorted(bits.items()):
        pairs.extend([F.lit(ch), F.lit(b)])
    model = F.create_map(*pairs) if pairs else \
        F.create_map().cast("map<string,double>")
    chars = F.filter(F.split(F.lower(F.col(text_col)), ""),
                     lambda c: c != "")
    n = F.size(chars)
    total_bits = F.aggregate(
        chars, F.lit(0.0),
        lambda acc, c: acc + F.coalesce(model[c], F.lit(unseen)))
    return df.select(
        F.col(id_col),
        n.alias("n_chars_scored"),
        F.when(n > 0, F.round(total_bits / n, 4)).alias("bits_per_char"))
