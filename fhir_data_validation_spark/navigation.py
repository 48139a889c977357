"""Violation navigation: RFC 6901 JSON pointers + human breadcrumbs for
violation locations, and first-match path resolution for authoring.

Analog of the reference's smart-path navigation surface —
``Navigation/SmartPathNavigationService.cs:29-406`` (path → JSON pointer
resolution, with the AUTHORING-mode resource-level ``where()`` scan at
``:63-116``) and the frontend breadcrumb formatting
(``frontend/src/utils/smartPathFormatting.ts``) — re-keyed from
FHIRPath-over-Bundle-JSON to this engine's column paths.

The reference resolves a rule's ``fieldPath`` plus a concrete
``entryIndex`` into a pointer like ``/entry/3/resource/name/0/family`` so
a UI can jump to the offending node. Here the addressable unit is one ROW
(doc), so pointers are *within-row*: the violation's ``column`` path
(``groups[*].items[*].l_quantity``) plus the per-element indexes the
engine already records in ``detail`` (``index`` / ``innerIndex``,
compiler per-element fan-out) resolve to ``/groups/0/items/2/l_quantity``.

Three tiers, by where the work belongs:

* :func:`json_pointer` / :func:`breadcrumbs` — pure driver-side string
  functions for one location (the UI/debugging hot path; no cluster).
* :func:`with_pointer` — a Spark-native PROJECTION adding the pointer
  (and optionally a breadcrumb) column to a violations DataFrame: pure
  codegen string ops over ``column`` + ``detail``, zero shuffle, safe to
  fuse into any downstream write at 100-TB violation volume.
* :func:`resolve_first_match` — the reference's AUTHORING mode
  (``SmartPathNavigationService.cs:63-116``: iterate entries, find the
  first one matching a ``where()`` condition, then resolve): one filtered
  min-aggregation per group instead of a driver loop.

Resolution contract (matches the reference's "pointer to the deepest
addressable node"):

* every ``[*]`` marker consumes one recorded index, in order
  (``index`` then ``innerIndex``);
* at the first marker with NO index available, the pointer stops at the
  array node itself (the reference's array-level pointer when no
  ``entryIndex`` is supplied);
* paths deeper than two ``[*]`` levels resolve only the outer index:
  the engine's composite detail stores the FLATTENED ordinal as
  ``innerIndex`` for depth ≥ 3 (see ``compiler._nested_indexed``), which
  is not a physical sub-array index, so the pointer honestly stops at the
  second-level array rather than fabricating a location.

Name escaping follows RFC 6901 (``~`` → ``~0``, ``/`` → ``~1``).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .model import RuleDefinition

_STAR = "[*]"


def _escape(name: str) -> str:
    """RFC 6901 token escaping."""
    return name.replace("~", "~0").replace("/", "~1")


def split_segments(path: str) -> list[tuple[str, bool]]:
    """``groups[*].items[*].l_quantity`` →
    ``[("groups", True), ("items", True), ("l_quantity", False)]``.

    Each element is ``(field_name, is_array_marker)`` in path order;
    dotted struct descent stays inside one segment chain (``a.b[*].c`` →
    ``[("a", False), ("b", True), ("c", False)]``).
    """
    if not path:
        return []
    out: list[tuple[str, bool]] = []
    for chunk in path.split("."):
        starred = chunk.endswith(_STAR)
        name = chunk[: -len(_STAR)] if starred else chunk
        if not name or _STAR in name:
            raise ValueError(f"malformed path segment {chunk!r} in {path!r}")
        out.append((name, starred))
    return out


def json_pointer(path: str, indexes: Sequence[int | None] = ()) -> str | None:
    """Resolve ``path`` + per-array ``indexes`` to an RFC 6901 pointer.

    ``indexes`` supplies one entry per ``[*]`` marker in order; ``None``
    (or exhaustion) stops resolution at that array node. Empty path →
    ``None`` (dataset-level violations have no location).

    Paths with THREE or more markers resolve only the FIRST array: the
    engine's detail convention carries (index, innerIndex) where
    innerIndex at depth ≥ 3 is a flattened ordinal, not the second
    array's index — consuming it as one would fabricate a location
    (round-5 review batch 10; matches ``with_pointer``, which stops at
    the second-level array for the same reason).
    """
    segs = split_segments(path)
    if not segs:
        return None
    idx = list(indexes)
    if sum(1 for _, starred in segs if starred) >= 3:
        idx = idx[:1]
    parts: list[str] = []
    for name, starred in segs:
        parts.append(_escape(name))
        if starred:
            i = idx.pop(0) if idx else None
            if i is None:
                break
            parts.append(str(int(i)))
    return "/" + "/".join(parts)


def breadcrumbs(path: str, indexes: Sequence[int | None] = ()) -> list[str]:
    """Human segment list: ``["groups[0]", "items[2]", "l_quantity"]``.

    The frontend breadcrumb shape (``smartPathFormatting.ts``): one crumb
    per field, array fields suffixed with their resolved index (or ``[*]``
    when unresolved — the crumb still names the array). Same ≥3-marker
    truncation as :func:`json_pointer` (innerIndex is a flattened
    ordinal there, not the second array's index).
    """
    segs = split_segments(path)
    idx = list(indexes)
    if sum(1 for _, starred in segs if starred) >= 3:
        idx = idx[:1]
    out: list[str] = []
    resolved = True
    for name, starred in segs:
        if not resolved:
            break
        if starred:
            i = idx.pop(0) if idx else None
            if i is None:
                out.append(f"{name}[*]")
                resolved = False
            else:
                out.append(f"{name}[{int(i)}]")
        else:
            out.append(name)
    return out


def _seg_ptr(col: Column) -> Column:
    """Native translate of one inter-marker path chunk (``.items.x``) into
    pointer text (``/items/x``) with RFC 6901 escaping. Dots are segment
    separators (never part of a field name), so escape first, then map
    dots to slashes."""
    esc = F.regexp_replace(
        F.regexp_replace(col, "~", "~0"), "/", "~1")
    return F.translate(esc, ".", "/")


def with_pointer(violations: DataFrame, *, pointer_col: str = "json_pointer",
                 breadcrumb_col: str | None = None) -> DataFrame:
    """Add a native ``json_pointer`` column to a violations DataFrame.

    Pure projection (zero shuffle, whole-stage codegen): splits the
    ``column`` path on ``[*]``, substitutes ``detail['index']`` /
    ``detail['innerIndex']`` per the module resolution contract, and
    escapes names per RFC 6901. Dataset-level violations (empty
    ``column``) get NULL. With ``breadcrumb_col`` also emits the
    ``a[0] > b[2] > leaf`` human rendering.

    Scale shape: at 10^12 rows the violations DF is the *reduced* output
    of validation; this adds O(|path|) string work per violation row and
    fuses into whatever write follows — never a separate job.
    """
    cols = violations.columns
    if "column" not in cols or "detail" not in cols:
        raise ValueError("with_pointer expects a violations DataFrame "
                         "with 'column' and 'detail' columns")
    parts = F.split(F.col("column"), re.escape(_STAR))
    n_markers = F.size(parts) - F.lit(1)
    idx = F.col("detail").getItem("index")
    idx2 = F.col("detail").getItem("innerIndex")

    base = F.concat(F.lit("/"), _seg_ptr(F.element_at(parts, 1)))
    one = F.concat(base, F.lit("/"), idx, _seg_ptr(F.element_at(parts, 2)))
    two = F.concat(one, F.lit("/"), idx2, _seg_ptr(F.element_at(parts, 3)))

    ptr = (F.when(F.col("column") == "", F.lit(None).cast("string"))
            .when(n_markers == 0, base)
            .when(idx.isNull(), base)
            # depth >= 3: innerIndex is the flattened ordinal, not a
            # physical index — stop at the second-level array (honest
            # deepest-addressable node)
            .when((n_markers == 2) & idx2.isNotNull(), two)
            .otherwise(one))
    out = violations.withColumn(pointer_col, ptr)
    if breadcrumb_col is not None:
        crumb = F.when(
            F.col("column") == "", F.lit(None).cast("string")
        ).otherwise(
            F.concat_ws(" > ", F.split(
                # rewrite resolved markers inline, then split into crumbs
                F.when(n_markers == 0, F.col("column"))
                 .when(idx.isNull(),
                       F.concat(F.element_at(parts, 1), F.lit(_STAR)))
                 .when((n_markers == 2) & idx2.isNotNull(),
                       F.concat(F.element_at(parts, 1),
                                F.lit("["), idx, F.lit("]"),
                                F.element_at(parts, 2),
                                F.lit("["), idx2, F.lit("]"),
                                F.element_at(parts, 3)))
                 .when(n_markers == 1,
                       F.concat(F.element_at(parts, 1),
                                F.lit("["), idx, F.lit("]"),
                                F.element_at(parts, 2)))
                 # n >= 2 with the inner array unresolved: crumb stops at
                 # the second-level array, marked [*] like the pointer stop
                 .otherwise(F.concat(F.element_at(parts, 1),
                                     F.lit("["), idx, F.lit("]"),
                                     F.element_at(parts, 2),
                                     F.lit(_STAR))),
                re.escape("."))))
        out = out.withColumn(breadcrumb_col, crumb)
    return out


def resolve_first_match(df: DataFrame, condition: str, path: str,
                        key_col: str = "doc_id",
                        group_col: str = "source") -> DataFrame:
    """AUTHORING mode: per group, the FIRST row (by ``key_col`` order)
    matching ``condition``, with the pointer ``path`` resolves to.

    The reference iterates bundle entries until the ``where()`` condition
    matches and returns that entry's pointer
    (``SmartPathNavigationService.cs:63-116``). Distributed analog: one
    filtered min-aggregation per group — no driver loop, no collect of
    the corpus. Groups with no match are absent (the reference returns
    null). The pointer stops at unresolved ``[*]`` arrays (no element
    index is knowable pre-validation).
    """
    from .compiler import _safe_expr  # shared SQL parse probe
    probe = RuleDefinition(id="<resolve_first_match>", type="CustomExpr",
                           params={})
    cond = _safe_expr(probe, condition)
    ptr = json_pointer(path)
    if ptr is None:
        raise ValueError("resolve_first_match needs a non-empty path")
    return (df.filter(cond)
              .groupBy(group_col)
              .agg(F.min(key_col).alias(key_col))
              .withColumn("json_pointer", F.lit(ptr)))
