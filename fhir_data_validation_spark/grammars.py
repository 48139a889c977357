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
* ``code`` — no whitespace anywhere (``:801-813``; the reference also
  rejects EMPTY codes — presence is a separate Required rule here, since
  the Regex lane skips empty values by the engine-wide skip-empty
  contract).
* ``uri`` — no whitespace/control characters (``:1209-1234``; .NET's
  relative-or-absolute TryCreate accepts any such string).
* ``url`` — absolute URI: scheme ``:`` rest, no whitespace (``:1236-1257``).
* ``canonical`` — absolute URI with at most one ``|version`` suffix
  (``:1259-1286``).
"""

from __future__ import annotations

from .errors import ErrorCode, RuleConfigurationError
from .model import RuleDefinition, RuleSet

_SCHEME = r"[a-zA-Z][a-zA-Z0-9+.\-]*"

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
    "date": {"type": "Regex", "pattern": r"^\d{4}(-\d{2}(-\d{2})?)?\z"},
    "dateTime": {"type": "TypeCheck", "dataType": "timestamp"},
    "id": {"type": "Regex", "pattern": r"^[A-Za-z0-9\-\.]{1,64}\z"},
    "string": {"type": "Regex", "pattern": r"^[^\n\r]*\z"},
    "code": {"type": "Regex", "pattern": r"^\S+\z"},
    "uri": {"type": "Regex", "pattern": r"^\S+\z"},
    "url": {"type": "Regex", "pattern": rf"^{_SCHEME}:\S*\z"},
    "canonical": {"type": "Regex",
                  "pattern": rf"^{_SCHEME}:[^\s|]*(\|[^\s|]+)?\z"},
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
