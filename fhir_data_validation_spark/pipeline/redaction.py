"""PII detection and redaction over text columns.

Standard pre-training hygiene (C4 / RefinedWeb-style): emails, phone
numbers, IPv4 addresses and SSN-shaped ids are replaced with typed
placeholder tokens before the corpus is packed. Everything compiles to
native ``regexp_replace`` / ``regexp_extract_all`` projections — no Python
in the scan path, so a 100 TB corpus redacts in one whole-stage-codegen
pass with zero shuffle.

The patterns live in the Java-regex ∩ RE2 common subset (no lookaround, no
backreferences) so the DuckDB oracle states the *identical* expressions.
Kinds apply in the fixed :data:`PII_PATTERNS` order and each kind matches
against the text as already redacted by the previous kinds — so a phone
number inside an email local part counts once, as an email. Counts use the
same sequential semantics (they are "matches replaced at this step").

Known boundary caveat (inherent to lookaround-free patterns, shared with
the oracle bit-for-bit): an IPv4-shaped substring inside a longer dotted
run (``not1.2.3.4.5``) still matches from the first interior word
boundary.

No reference analog; training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# kind -> pattern, in application order (email first so addresses aren't
# shredded by the phone/number kinds; ssn before phone so 3-2-4 groups
# aren't half-eaten by a later pass).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9]{7,15}\b|\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    # octet-bounded (0-255): the naive [0-9]{1,3} quad redacted version
    # strings and section numbers like 10.1.400.999 as <IPV4> and
    # inflated PII prevalence (round-5 review batch 13); Java∩RE2 safe
    "ipv4": r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
            r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b",
}


def redaction_token(kind: str) -> str:
    """Placeholder the ``kind`` redacts to: ``<EMAIL>``, ``<IPV4>``, …"""
    return f"<{kind.upper()}>"


def _kinds(kinds: list[str] | None) -> list[str]:
    ks = list(PII_PATTERNS) if kinds is None else list(kinds)
    unknown = [k for k in ks if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; "
                         f"known: {list(PII_PATTERNS)}")
    # preserve canonical order regardless of caller order — the sequential
    # semantics depend on it
    return [k for k in PII_PATTERNS if k in ks]


def pii_profile(col: Column, kinds: list[str] | None = None
                ) -> tuple[dict[str, Column], Column]:
    """``({kind: count}, redacted_text)`` with sequential semantics: each
    kind counts and replaces matches in the text as redacted so far."""
    counts: dict[str, Column] = {}
    cur = col
    for kind in _kinds(kinds):
        pat = PII_PATTERNS[kind]
        counts[kind] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, redaction_token(kind))
    return counts, cur


def redact(col: Column, kinds: list[str] | None = None) -> Column:
    """Text with every selected PII kind replaced by its placeholder."""
    return pii_profile(col, kinds)[1]


def pii_counts(col: Column, kinds: list[str] | None = None) -> Column:
    """Struct of per-kind match counts (sequential semantics)."""
    counts, _ = pii_profile(col, kinds)
    return F.struct(*(c.alias(k) for k, c in counts.items()))


def redact_docs(df: DataFrame, text_col: str = "text",
                kinds: list[str] | None = None,
                counts: bool = True) -> DataFrame:
    """Corpus with ``text_col`` redacted in place; with ``counts``, a
    ``n_pii_<kind>`` int column per kind. One projection over the scan —
    no shuffle, no Python."""
    cnts, red = pii_profile(F.col(text_col), kinds)
    out = df
    # counts first: they reference text_col, which the redaction replaces
    if counts:
        for kind, c in cnts.items():
            out = out.withColumn(f"n_pii_{kind}", c)
    return out.withColumn(text_col, red)
