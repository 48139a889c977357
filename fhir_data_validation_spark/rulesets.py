"""Canonical rule set for the token table (FIXTURES.md F5).

The declarative JSON the engine ships with — the analog of
``examples/sample-rules-correct.json`` in the reference, re-keyed to the
input_hint schema ``(doc_id, tokens, n_tok, source)``.
"""

from __future__ import annotations

from .model import RuleSet
from .sources.synth import MAX_N_TOK, SOURCES, VOCAB_SIZE

# FHIR id grammar (JsonNodeStructuralValidator.cs:100-101) applied to doc_id
DOC_ID_PATTERN = "^[A-Za-z0-9.-]{1,64}$"


def default_token_rules(vocab: int = VOCAB_SIZE,
                        max_n_tok: int = MAX_N_TOK,
                        with_drift: bool = False) -> dict:
    rules = [
        {"id": "REQ-001", "type": "Required", "column": "tokens",
         "severity": "error"},
        {"id": "REQ-002", "type": "Required", "column": "source",
         "severity": "error"},
        {"id": "LEN-001", "type": "ArrayLength", "column": "tokens",
         "params": {"min": 1, "max": max_n_tok}},
        {"id": "INV-001", "type": "CustomExpr",
         "expr": "size(tokens) = n_tok",
         "errorCode": "ARRAY_LENGTH_VIOLATION"},
        {"id": "RGX-001", "type": "Regex", "column": "doc_id",
         "params": {"pattern": DOC_ID_PATTERN}},
        {"id": "ALW-001", "type": "Enum", "column": "source",
         "params": {"values": list(SOURCES)}},
        {"id": "DOM-001", "type": "TokenDomain", "column": "tokens",
         "params": {"min": 0, "maxExclusive": vocab}},
        {"id": "FIX-001", "type": "FixedValue", "source": "wiki",
         "scope": {"kind": "filter", "condition": "n_tok < 16"},
         "column": "source", "params": {"value": "wiki"}},
        {"id": "UNQ-001", "type": "Unique", "column": "doc_id"},
        {"id": "REF-001", "type": "Reference", "column": "source",
         "params": {"dim": "sources_dim", "on": "source"}},
        {"id": "CRD-001", "type": "RequiredResources",
         "params": {"requirements": [{"source": s, "min": 1}
                                     for s in SOURCES],
                    "rejectUndeclared": True}},
    ]
    if with_drift:
        rules.append(
            {"id": "DRF-001", "type": "Drift", "column": "n_tok",
             "params": {"baseline": "stats_baseline", "psiMax": 0.2,
                        "ksAlpha": 0.01, "bucketWidth": 64}})
    return {"version": "1.0", "rules": rules}


def default_token_ruleset(**kwargs) -> RuleSet:
    return RuleSet.parse(default_token_rules(**kwargs))
