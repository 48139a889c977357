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
    # ("7."); it rejects NaN/Infinity/exponent forms. (Simplifications
    # vs C#: thousands separators rejected; Unicode whitespace like NBSP
    # that TryParse trims is rejected too.) Whitespace is the EXPLICIT
    # [ \t\n\f\r] class, not \s — Java's \s includes \x0B where RE2's
    # does not, so a bare \s breaks the module's Spark↔DuckDB parity
    # discipline (round-5 review batch 13).
    "decimal": {"type": "Regex",
                "pattern":
                    r"^[ \t\n\f\r]*[+-]?(\d+\.?\d*|\.\d+)[ \t\n\f\r]*\z"},
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
        # it through the same guard as every generated-SQL path in this
        # module (backtick injection rejected at rule build).  The
        # IS NULL / trim() = '' prefix keeps the engine-wide skip-empty
        # contract (the CustomExpr lane itself treats null as violation).
        raw["expr"] = spec["expr"].format(
            col=_sql_col_ref(column, raw["id"]))
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


def _sql_ident(name: str, rule_id: str) -> str:
    """Backtick-quote a field name for splicing into a generated SQL
    expression; reject names that could escape the quoting."""
    if "`" in name or "\n" in name or "\r" in name:
        raise RuleConfigurationError(
            rule_id, ErrorCode.RULE_CONFIGURATION_ERROR,
            f"field name {name!r} cannot be quoted safely")
    return f"`{name}`"


def _sql_col_ref(path: str, rule_id: str) -> str:
    """A dotted struct path (``meta.ext``) as a generated-SQL reference:
    every dot segment quoted individually, so nested struct columns
    resolve instead of being treated as one literal identifier."""
    return ".".join(_sql_ident(p, rule_id) for p in path.split("."))


def extension_rules(column: str, value_fields: list[str],
                    nested_field: str = "extension",
                    rule_prefix: str = "EXT",
                    source: str = "*") -> tuple[RuleDefinition, ...]:
    """Extension-grammar rules (T7) for an ``array<struct>`` column —
    ``ValidateExtensionGrammar`` (``JsonNodeStructuralValidator.cs:1087-
    1208``) re-expressed over tabular extension arrays:

    1. every element's ``url`` must be present and non-empty
       (``FHIR_EXTENSION_MISSING_URL``) — compiled through the engine's
       element-path machinery (``{column}[*].url``) so each bad element
       reports its index, like the reference's per-element JSON pointer;
    2. every element must carry EITHER one ``value[x]`` field OR a
       non-empty nested ``extension`` array, never both and never
       neither (``FHIR_EXTENSION_INVALID_SHAPE``: reasons ``empty`` /
       ``both``) — a single ``forall`` higher-order predicate, fused
       into the scan like every CustomExpr lane;
    3. at most one ``value[x]`` field per element (the reference's
       multiple-value[x] check inside extensions, value[x] exclusivity).

    ``value_fields`` lists the struct's value[x] member names (e.g.
    ``["valueString", "valueCode"]``) — explicit because parquet schemas
    carry every declared member regardless of which one a row uses.

    Works at ANY depth: ``column`` may be a dotted struct path
    (``meta.ext``) and may descend through nested repetition
    (``ext[*].extension``) — the shape lanes wrap their per-element
    predicate in one ``forall`` per array level, and the url lane rides
    the engine's arbitrary-depth element-path machinery.  When the
    innermost struct has NO nested-extension member (typical leaf
    level), pass ``nested_field=None``: the shape check then requires a
    value[x] on every element (nothing can nest).
    """
    if not value_fields:
        raise RuleConfigurationError(
            rule_prefix, ErrorCode.RULE_CONFIGURATION_ERROR,
            "extension_rules needs the struct's value[x] field names")
    if column.endswith("[*]"):
        raise RuleConfigurationError(
            rule_prefix, ErrorCode.RULE_CONFIGURATION_ERROR,
            f"column {column!r} must name the array itself, not its "
            f"elements (drop the trailing [*])")
    url_rule = RuleDefinition.parse({
        "id": f"{rule_prefix}-URL", "type": "Required",
        "column": f"{column}[*].url", "source": source,
        "errorCode": "FHIR_EXTENSION_MISSING_URL",
        "params": {"perElement": True}})
    vfs = [_sql_ident(v, rule_prefix) for v in value_fields]

    # per-element predicates use the {E} placeholder for the lambda
    # variable (not string replacement of a literal prefix, which a field
    # name could collide with)
    has_value = "(" + " OR ".join(
        f"{{E}}.{v} IS NOT NULL" for v in vfs) + ")"
    if nested_field is None:
        has_nested = "false"
    else:
        nst = _sql_ident(nested_field, rule_prefix)
        has_nested = (f"({{E}}.{nst} IS NOT NULL "
                      f"AND size({{E}}.{nst}) > 0)")
    n_values = "(" + " + ".join(
        f"IF({{E}}.{v} IS NOT NULL, 1, 0)" for v in vfs) + ")"

    # one forall per array level: "a[*].b" → a IS NULL OR forall(a,
    # x0 -> x0.b IS NULL OR forall(x0.b, x1 -> <pred(x1)>))
    segs = column.split("[*].")

    def wrap(pred_of_e: str) -> str:
        def build(i: int, base: str) -> str:
            var = f"x{i}"
            if i == len(segs) - 1:
                body = pred_of_e.format(E=var)
            else:
                inner = f"{var}.{_sql_col_ref(segs[i + 1], rule_prefix)}"
                body = build(i + 1, inner)
            return f"{base} IS NULL OR forall({base}, {var} -> ({body}))"
        return build(0, _sql_col_ref(segs[0], rule_prefix))

    return (
        url_rule,
        RuleDefinition.parse({
            "id": f"{rule_prefix}-SHAPE", "type": "CustomExpr",
            "source": source,
            "errorCode": "FHIR_EXTENSION_INVALID_SHAPE",
            "expr": wrap(f"{has_value} != {has_nested}")}),
        RuleDefinition.parse({
            "id": f"{rule_prefix}-VALUEX", "type": "CustomExpr",
            "source": source,
            "errorCode": "VALUE_EXCLUSIVITY_VIOLATION",
            "expr": wrap(f"{n_values} <= 1")}),
    )
