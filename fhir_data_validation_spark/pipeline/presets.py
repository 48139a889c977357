"""Corpus quality-filter rule presets (Gopher/C4-style heuristics).

Declarative rule sets over a documents table — the text-quality analog of
the token table's default rule set. Every predicate is a native Catalyst
expression (the engine's CustomExpr lane), so quality filtering fuses into
the same one-scan violation pass as every other rule; a pipeline drops the
flagged doc_ids.

Heuristics (public, from the Gopher / C4 data-cleaning literature):
word-count bounds, mean-word-length band, duplicate-word fraction,
non-alphanumeric symbol ratio.
"""

from __future__ import annotations

from ..model import RuleSet

_WORDS = "filter(split(lower({c}), '[^a-z0-9]+'), x -> x <> '')"


def gopher_quality_rules(text_col: str = "text",
                         min_words: int = 5, max_words: int = 100_000,
                         min_mean_wlen: float = 2.0,
                         max_mean_wlen: float = 12.0,
                         max_dup_word_frac: float = 0.5,
                         max_symbol_ratio: float = 0.3) -> dict:
    """Rule-set dict of quality filters; parse with ``RuleSet.parse`` and
    run through the ValidationEngine like any other rules."""
    w = _WORDS.format(c=text_col)
    n = f"size({w})"
    alpha = f"length(regexp_replace({text_col}, '[^a-zA-Z]', ''))"
    rules = [
        {"id": "QF-WORDCOUNT", "type": "CustomExpr",
         "errorCode": "QUALITY_WORD_COUNT",
         "expr": f"{n} >= {min_words} AND {n} <= {max_words}"},
        {"id": "QF-WORDLEN", "type": "CustomExpr",
         "errorCode": "QUALITY_MEAN_WORD_LENGTH",
         "expr": (f"{n} = 0 OR (CAST({alpha} AS DOUBLE) / {n} "
                  f">= {min_mean_wlen} AND CAST({alpha} AS DOUBLE) / {n} "
                  f"<= {max_mean_wlen})")},
        {"id": "QF-DUPWORDS", "type": "CustomExpr",
         "errorCode": "QUALITY_DUPLICATE_WORDS",
         "expr": (f"{n} = 0 OR 1.0 - CAST(size(array_distinct({w})) "
                  f"AS DOUBLE) / {n} <= {max_dup_word_frac}")},
        # whitespace (tab/newline/CR) is NOT a symbol: counting it flagged
        # ordinary multi-line prose purely for its line structure
        # (round-5 review batch 13)
        {"id": "QF-SYMBOLS", "type": "CustomExpr",
         "errorCode": "QUALITY_SYMBOL_RATIO",
         "expr": (f"length({text_col}) = 0 OR "
                  f"CAST(length(regexp_replace({text_col}, "
                  f"'[a-zA-Z0-9 \\t\\n\\r]', '')) AS DOUBLE) / "
                  f"length({text_col}) "
                  f"<= {max_symbol_ratio}")},
    ]
    return {"version": "1.0", "rules": rules}


def gopher_quality_ruleset(**kwargs) -> RuleSet:
    return RuleSet.parse(gopher_quality_rules(**kwargs))


def c4_quality_rules(text_col: str = "text",
                     min_sentences: int = 3) -> dict:
    """C4-style cleaning heuristics (Raffel et al., public) adapted from
    line-level to document-level rules: minimum sentence count, boilerplate
    markers (lorem ipsum), code markers (curly braces), and the
    'javascript' cookie/enable-JS boilerplate signal. Like the Gopher set,
    every predicate is a native Catalyst expression fused into the one-scan
    pass."""
    sentences = (f"size(filter(split({text_col}, '[.!?]'), "
                 "s -> length(trim(s)) > 0))")
    rules = [
        {"id": "QF-C4-SENTENCES", "type": "CustomExpr",
         "errorCode": "QUALITY_SENTENCE_COUNT",
         "expr": f"{sentences} >= {min_sentences}"},
        {"id": "QF-C4-LOREM", "type": "CustomExpr",
         "errorCode": "QUALITY_PLACEHOLDER_TEXT",
         "expr": f"NOT contains(lower({text_col}), 'lorem ipsum')"},
        {"id": "QF-C4-BRACE", "type": "CustomExpr",
         "errorCode": "QUALITY_CODE_MARKUP",
         "expr": f"NOT contains({text_col}, '{{')"},
        {"id": "QF-C4-JS", "type": "CustomExpr",
         "errorCode": "QUALITY_JS_BOILERPLATE",
         "expr": f"NOT contains(lower({text_col}), 'javascript')"},
    ]
    return {"version": "1.0", "rules": rules}


def c4_quality_ruleset(**kwargs) -> RuleSet:
    return RuleSet.parse(c4_quality_rules(**kwargs))
