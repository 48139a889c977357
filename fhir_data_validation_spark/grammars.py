"""Primitive-format grammar registry (T2 — STRUCTURE authority).

The reference's per-type lexical validators
(``Validation/JsonNodeStructuralValidator.cs:84-97`` registry; impls
``:738-827`` and ``:1209-1286``) re-expressed as compile-time rule
factories: each primitive maps to a Regex or TypeCheck rule that fuses
into the ordinary one-scan pass at STRUCTURE stage severity.

Grammar fidelity notes (vs the C# validators):

* ``boolean`` — exactly ``true``/``false`` (not Spark's permissive cast).
* ``integer`` — ``try_cast(int)``: 32-bit like C# ``int.TryParse``
  (``try_cast(bigint)`` would wave through values that overflow int32).
* ``decimal`` — digit grammar with optional sign/point: ``decimal.TryParse``
  rejects ``NaN``/``Infinity``/exponent forms that a double cast accepts.
* ``date`` — ``^\\d{4}(-\\d{2}(-\\d{2})?)?$`` (``:741``).
* ``dateTime`` — ISO-8601 parseable ⇒ ``try_cast(timestamp)``.
* ``id`` — ``^[A-Za-z0-9\\-\\.]{1,64}$`` (``:100-101``).
* ``string`` — no newline characters (``:780-790``).
* ``code`` — no whitespace and no control characters (``:820-843``:
  ``char.IsWhiteSpace`` ∪ ``char.IsControl``; the reference also rejects
  EMPTY codes — presence is a separate Required rule here, since the
  Regex lane skips empty values by the engine-wide skip-empty contract).
* ``uri`` — no whitespace/control characters (``:1209-1230``; .NET's
  relative-or-absolute TryCreate accepts any such string).
* ``url`` — absolute URI: scheme ``:`` rest, no whitespace/control
  (``:1236-1256``).
* ``canonical`` — absolute URI with at most one ``|version`` suffix
  (``:1258-1300``).
* ``reference`` — Reference.reference format (``:1010-1077``): relative
  ``ResourceType/id`` (type starts uppercase, alphanumeric; id follows
  the id grammar), ``urn:uuid:<dashed-hex uuid>`` (uuid part
  case-insensitive, ``urn:`` lowercase like the C# flow), or an
  absolute ``http(s)://`` URL (scheme case-insensitive).  Simplification
  vs ``Guid.TryParse``: only the canonical dashed form is accepted (the
  reference's own tests use no other form).
"""

from __future__ import annotations

from .errors import ErrorCode, RuleConfigurationError
from .model import RuleDefinition, RuleSet

_SCHEME = r"[a-zA-Z][a-zA-Z0-9+.\-]*"

# C# char.IsWhiteSpace ∪ char.IsControl == Unicode categories Z ∪ Cc
# (every Unicode White_Space code point is a separator (Z) or a control
# (Cc): tab/LF/CR/VT/FF/NEL are Cc; space/NBSP/ogham/en-quad…/ideographic
# are Zs; LS is Zl, PS is Zp).  Java regex and DuckDB RE2 both support
# \p{Z}/\p{Cc} inside a negated class with identical semantics (parity
# pinned in tests/test_grammars.py), so the oracle stays exact — Java's
# ASCII-only \S would wave control characters like  clean through.
_SAFE = r"[^\p{Z}\p{Cc}]"
_UUID = (r"[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}"
         r"-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}")

# Anchors are \z (absolute end of input), NOT $: Java's regex (Spark
# rlike) lets $ match before a final line terminator, so "abc\n" passes
# ^\S+$ — a trailing newline would silently validate clean through every
# grammar. (DuckDB's RE2 supports \z identically, keeping oracles exact.)
PRIMITIVE_GRAMMARS: dict[str, dict] = {
    "boolean": {"type": "Regex", "pattern": r"^(true|false)\z"},
    "integer": {"type": "TypeCheck", "dataType": "int"},
    # decimal.TryParse trims whitespace and accepts a trailing point
    # ("7."); it rejects NaN/Infinity/exponent forms. (Simplification vs
    # C#: thousands separators are rejected here.)
    "decimal": {"type": "Regex",
                "pattern": r"^\s*[+-]?(\d+\.?\d*|\.\d+)\s*\z"},
    # partial dates (YYYY, YYYY-MM) are shape-checked only, but a full
    # 10-char date must also be a real calendar date — the reference runs
    # DateTime.TryParse when Length == 10 (":744-761"), so 2024-02-30
    # must fire.  try_cast keeps the check infallible under ANSI mode.
    "date": {"type": "CustomExpr",
             "expr": ("{col} IS NULL OR trim({col}) = '' OR "
                      "({col} RLIKE "
                      "'^\\\\d{{4}}(-\\\\d{{2}}(-\\\\d{{2}})?)?\\\\z'"
                      " AND (length({col}) < 10"
                      " OR try_cast({col} AS DATE) IS NOT NULL))")},
    "dateTime": {"type": "TypeCheck", "dataType": "timestamp"},
    "id": {"type": "Regex", "pattern": r"^[A-Za-z0-9\-\.]{1,64}\z"},
    "string": {"type": "Regex", "pattern": r"^[^\n\r]*\z"},
    "code": {"type": "Regex", "pattern": rf"^{_SAFE}+\z"},
    "uri": {"type": "Regex", "pattern": rf"^{_SAFE}+\z"},
    "url": {"type": "Regex", "pattern": rf"^{_SCHEME}:{_SAFE}*\z"},
    "canonical": {"type": "Regex",
                  "pattern": (rf"^{_SCHEME}:[^\p{{Z}}\p{{Cc}}|]*"
                              rf"(\|[^\p{{Z}}\p{{Cc}}|]+)?\z")},
    "reference": {"type": "Regex",
                  "pattern": (rf"^([A-Z][A-Za-z0-9]*/[A-Za-z0-9.\-]{{1,64}}"
                              rf"|urn:(?i:uuid:){_UUID}"
                              rf"|(?i:https?)://{_SAFE}+)\z")},
}


def grammar_rule(primitive: str, column: str, rule_id: str | None = None,
                 source: str = "*") -> RuleDefinition:
    """One STRUCTURE-stage grammar rule for ``column``."""
    spec = PRIMITIVE_GRAMMARS.get(primitive)
    if spec is None:
        raise RuleConfigurationError(
            rule_id or column, ErrorCode.RULE_CONFIGURATION_ERROR,
            f"unknown primitive {primitive!r} "
            f"(expected one of {sorted(PRIMITIVE_GRAMMARS)})")
    raw: dict = {
        "id": rule_id or f"GRAM-{primitive}-{column}",
        "type": spec["type"],
        "column": column,
        "source": source,
        "errorCode": ErrorCode.INVALID_PRIMITIVE,
    }
    if spec["type"] == "Regex":
        raw["params"] = {"pattern": spec["pattern"]}
    elif spec["type"] == "CustomExpr":
        # the column name is spliced into the expression template; quote
        # it with backticks so any legal Spark column name works.  The
        # IS NULL / trim() = '' prefix keeps the engine-wide skip-empty
        # contract (the CustomExpr lane itself treats null as violation).
        raw["expr"] = spec["expr"].format(col=f"`{column}`")
        raw["params"] = {}
    else:
        raw["params"] = {"dataType": spec["dataType"]}
    return RuleDefinition.parse(raw)


def grammar_ruleset(bindings: dict[str, str], source: str = "*") -> RuleSet:
    """RuleSet from ``{column: primitive}`` bindings — the tabular analog
    of schema-driven structural validation (every bound column gets its
    lexical grammar check)."""
    rules = tuple(grammar_rule(prim, col, source=source)
                  for col, prim in sorted(bindings.items()))
    return RuleSet(version="grammars-1", rules=rules)
