"""Line-level corpus cleaning: within-document line dedup and
corpus-level boilerplate removal.

The two line-granularity passes of a C4-style cleanup:

- :func:`dedup_lines` — drop repeated lines *within* a document, keeping
  the first occurrence. A pure projection (``array_distinct`` preserves
  first-occurrence order), zero shuffle — a 100 TB corpus cleans in one
  codegen pass.
- :func:`remove_boilerplate` — drop lines that recur across *many*
  documents (nav bars, footers, cookie banners). Two passes: a line-hash
  frequency aggregation (map-side combined, fixed-width ``xxhash64``
  shuffle keys), then explode → broadcast anti-join against the (small,
  capped) flagged set → positional rebuild. The only full shuffle carries
  the surviving line stream once.

Lines are ``\\n``-separated (:func:`doc_lines`); lines shorter than
``min_len`` characters are never treated as boilerplate and, for
:func:`dedup_lines`, are always kept (blank separator lines survive).

No reference analog; training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tag separator for the short-line keep-alive trick — NUL never occurs in
# sane text and is stripped back out after the distinct
_TAG = "\x00"


def doc_lines(col: Column) -> Column:
    """Text split into lines (trailing empties kept). CRLF-tolerant:
    ``\\r\\n`` and ``\\n`` both terminate a line — with a bare ``\\n``
    split, every CRLF line kept its ``\\r`` so 'foo\\r' and 'foo'
    hashed as different boilerplate lines and ``min_len`` was off by
    one on CRLF documents (round-5 review batch 13). Rebuilt docs are
    LF-normalized as a consequence."""
    return F.split(col, "\\r?\\n", -1)


# --- markup stripping -------------------------------------------------------
# Patterns restricted to the Java-regex ∩ RE2 subset (inline (?is) flags,
# lazy quantifiers, explicit whitespace classes — no lookaround, no
# backreferences, no \s whose definition differs between engines) so a SQL
# oracle can state the IDENTICAL expressions (same discipline as
# redaction.py).
#
# Each block pattern has an unterminated-\z fallback: HTML treats an
# unclosed <script>/<!-- as running to end-of-document, and WITHOUT the
# fallback a doc with many unclosed openers makes Java's lazy .*? scan
# to the end once PER opener — O(openers × length), an effective
# executor hang on pathological scraped HTML (round-5 review batch 13;
# RE2 is linear regardless, so the oracle is unaffected but states the
# same pattern).
_MARKUP_SCRIPT = r"(?is)<script[^>]*>(.*?</script[ \t\n\r\f]*>|.*\z)"
_MARKUP_STYLE = r"(?is)<style[^>]*>(.*?</style[ \t\n\r\f]*>|.*\z)"
_MARKUP_COMMENT = r"(?s)<!--(.*?-->|.*\z)"
_MARKUP_TAG = r"(?s)<[^>]*>"
_MARKUP_WS = r"[ \t\n\r\f]+"
# &amp; decoded LAST so double-escaped text ("&amp;lt;") resolves to the
# single-escaped form ("&lt;") rather than decoding twice — the html.unescape
# convention
_MARKUP_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def strip_markup(col: Column) -> Column:
    """HTML/markup stripped to plain text — the C4 "remove anything that
    isn't rendered prose" pass: ``<script>``/``<style>`` blocks (content
    and all), comments, then every remaining tag become a space; the six
    ubiquitous character entities decode; whitespace runs collapse to one
    space and the result is trimmed.

    One codegen projection (chained ``regexp_replace``/``replace``), zero
    shuffle — at 100 TB this fuses into whatever scan feeds it. Not a
    conformant HTML5 parser (no CDATA, no conditional comments, entities
    beyond the common six survive verbatim) — the right trade for bulk
    corpus cleanup where a real parser would mean a per-row Python UDF.
    """
    c = F.regexp_replace(col, _MARKUP_SCRIPT, " ")
    c = F.regexp_replace(c, _MARKUP_STYLE, " ")
    c = F.regexp_replace(c, _MARKUP_COMMENT, " ")
    c = F.regexp_replace(c, _MARKUP_TAG, " ")
    for ent, ch in _MARKUP_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, _MARKUP_WS, " "))


def dedup_lines(col: Column, min_len: int = 0) -> Column:
    """Text with repeated lines removed, first occurrence kept.

    Lines shorter than ``min_len`` characters are always kept (so blank
    lines and short separators don't collapse): they are tagged with their
    position before the distinct and untagged after — all inside one
    projection, no shuffle.
    """
    lines = doc_lines(col)
    if min_len > 0:
        lines = F.transform(
            lines,
            lambda x, i: F.when(F.length(x) >= min_len, x)
                          .otherwise(F.concat(x, F.lit(_TAG),
                                              i.cast("string"),
                                              F.lit(_TAG))))
    kept = F.array_distinct(lines)
    if min_len > 0:
        # strip only the TRAILING NUL-delimited tag the tagging step
        # appended (NUL + position + NUL): the old single-NUL suffix
        # pattern also matched a GENUINE long line ending in NUL+digits
        # (binary-ish scraped text), truncating it and collapsing
        # distinct lines like 'data\\x001'/'data\\x002' (round-5 review
        # batch 13); a line ending in NUL-digits-NUL remains the one
        # documented residual collision
        kept = F.transform(
            kept, lambda x: F.regexp_replace(x, "\x00\\d+\x00$", ""))
    return F.array_join(kept, "\n")


def dedup_lines_docs(df: DataFrame, text_col: str = "text",
                     min_len: int = 0) -> DataFrame:
    """Corpus with ``text_col`` line-deduped in place (pure projection)."""
    return df.withColumn(text_col, dedup_lines(F.col(text_col), min_len))


def line_frequencies(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     min_len: int = 10) -> DataFrame:
    """``(line_hash, line, n_docs)`` — in how many distinct documents each
    line of ≥ ``min_len`` characters occurs. Lines are de-duplicated per
    document first (``array_distinct``), so ``count(*)`` after the
    explode IS the distinct-document count — no ``count_distinct`` state.
    The shuffle key is the fixed-width 64-bit hash, not the string."""
    lines = (df.select(F.explode(F.filter(
                 F.array_distinct(doc_lines(F.col(text_col))),
                 lambda x: F.length(x) >= min_len)).alias("line")))
    return (lines.groupBy(F.xxhash64("line").alias("line_hash"))
            .agg(F.first("line").alias("line"),
                 F.count("*").cast("long").alias("n_docs")))


def boilerplate_lines(df: DataFrame, min_docs: int = 2,
                      min_len: int = 10, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_lines: int = 1_000_000) -> DataFrame:
    """The flagged set: lines occurring in ≥ ``min_docs`` documents,
    capped at the ``max_lines`` most frequent (deterministic hash
    tiebreak) so the set stays broadcastable at any corpus size."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 — at 1 every line "
                         "is boilerplate")
    return (line_frequencies(df, text_col, id_col, min_len)
            .where(F.col("n_docs") >= min_docs)
            .orderBy(F.col("n_docs").desc(), F.col("line_hash"))
            .limit(max_lines))


def _exploded_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(id, pos, line)`` — one row per line, position preserved."""
    return df.select(
        F.col(id_col),
        F.posexplode(doc_lines(F.col(text_col))).alias("pos", "line"))


def _rebuild_docs(df: DataFrame, kept: DataFrame, text_col: str,
                  id_col: str) -> DataFrame:
    """``df`` with ``text_col`` rebuilt from the surviving ``(id, pos,
    line)`` rows (original order) plus ``n_removed_lines``. Documents
    reduced to nothing keep an empty string. The per-document
    ``collect_list`` state is bounded by the document's own line count —
    the same order as holding the text itself."""
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]),
                        "\n").alias("_clean"),
                    F.count("*").cast("long").alias("_n_kept")))
    n_lines = F.size(doc_lines(F.col(text_col)))
    null_text = F.col(text_col).isNull()
    return (df.join(rebuilt, id_col, "left")
            # NULL text stays NULL with 0 removed (it has no lines) —
            # coercing it to '' destroyed null provenance and emitted a
            # NULL/-1 n_removed_lines that poisoned sums, diverging from
            # dedup_lines which preserves NULL (round-5 review batch 13)
            .withColumn("n_removed_lines",
                        F.when(null_text, F.lit(0)).otherwise(
                            n_lines - F.coalesce(F.col("_n_kept"),
                                                 F.lit(0))))
            .withColumn(text_col,
                        F.when(null_text,
                               F.lit(None).cast("string"))
                         .otherwise(F.coalesce(F.col("_clean"),
                                               F.lit(""))))
            .drop("_clean", "_n_kept"))


def remove_boilerplate(df: DataFrame, min_docs: int = 2, min_len: int = 10,
                       text_col: str = "text", id_col: str = "doc_id",
                       max_lines: int = 1_000_000) -> DataFrame:
    """Corpus with cross-document boilerplate lines removed (lines in ≥
    ``min_docs`` documents — see :func:`boilerplate_lines`); ``text_col``
    is rebuilt in original order plus ``n_removed_lines``."""
    flagged = boilerplate_lines(df, min_docs, min_len, text_col, id_col,
                                max_lines).select("line_hash")
    lines = _exploded_lines(df, text_col, id_col)
    kept = lines.join(F.broadcast(flagged),
                      F.xxhash64(lines["line"]) == flagged["line_hash"],
                      "left_anti")
    return _rebuild_docs(df, kept, text_col, id_col)


def dedup_lines_corpus(df: DataFrame, min_len: int = 10,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """CORPUS-level exact line dedup, keep-first (C4's repeated-span
    removal at line granularity): every line of ≥ ``min_len`` characters
    survives only at its earliest ``(id, pos)`` occurrence in the whole
    corpus; later repeats are dropped. Lines shorter than ``min_len``
    (blank separators etc.) are always kept.

    Unlike :func:`remove_boilerplate` (which drops EVERY copy of a
    frequent line) the first occurrence is preserved, and a single repeat
    is already removed — no frequency threshold.

    Scale shape: the line stream shuffles twice on the fixed-width 64-bit
    line hash (a ``min``-reduce for the keeper ``(id, pos)``, map-side
    combined, then the join back) plus the positional rebuild — O(total
    lines), no per-line state beyond the keeper struct. Grouping is by
    hash: distinct lines colliding in 64 bits (≈ n²/2^64) would be
    over-dropped.
    """
    lines = _exploded_lines(df, text_col, id_col)
    elig = (lines.where(F.length("line") >= min_len)
            .withColumn("_h", F.xxhash64("line")))
    keepers = (elig.groupBy("_h")
               .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                   F.col("pos").alias("p"))).alias("_k")))
    kept_elig = (elig.join(keepers, "_h")
                 .where((F.col(id_col) == F.col("_k.i"))
                        & (F.col("pos") == F.col("_k.p")))
                 .drop("_h", "_k"))
    kept = kept_elig.unionByName(
        lines.where(F.length("line") < min_len))
    return _rebuild_docs(df, kept, text_col, id_col)
