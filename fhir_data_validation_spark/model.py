"""Declarative rule model: the analog of the reference's RuleSet DSL.

Mirrors the *shape* of ``Models/RuleSet.cs:10-129`` and
``Models/InstanceScope.cs:9-89`` (see ``docs/03_rule_dsl_spec.md:4-22``) but
re-keyed to columns of a fixed DataFrame schema instead of FHIR paths.
Pure Python — no Spark imports — so rule sets parse and validate without a
SparkSession (the reference's stateless-ruleset-ingest contract,
``ValidationPipeline.cs:677-735``).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from .errors import ErrorCode, RuleConfigurationError, Severity, ValidationClass


def probe_pattern(pattern: str) -> str:
    """Translate a Java/RE2 regex into a PYTHON-re-checkable probe — the
    probe runs in Python ``re`` for compile-time syntax validation only;
    the ORIGINAL pattern string is what executes in Spark/DuckDB.

    Translations: Java's absolute-end anchor ``\\z`` (Python spells it
    ``\\Z``) and Unicode property classes ``\\p{..}``/``\\P{..}`` (Python
    re lacks them entirely — substituting a plain literal keeps the
    surrounding syntax checkable, inside or outside a character class;
    ``[^{}]+`` covers every Java property spelling incl. ``gc=Lu`` /
    ``blk=Greek`` / ``IsAlphabetic``).  Single shared implementation:
    ``require_pattern`` and ``governance.review_rule`` must agree on
    which patterns are valid.
    """
    return re.sub(r"\\[pP]\{[^{}]+\}", "A",
                  pattern.replace(r"\z", r"\Z"))


@dataclass(frozen=True)
class InstanceScope:
    """Which rows of the scoped group a rule applies to.

    Discriminated union ``all | first | filter(condition)`` as in
    ``Models/InstanceScope.cs:9-89``; ``condition`` is a Spark SQL boolean
    expression (our FHIRPath analog, applied by the compiler as
    ``F.expr(condition)`` — ``Services/ResourceSelector.cs:91-152``).
    """

    kind: str = "all"  # all | first | filter
    condition: str | None = None

    KINDS = ("all", "first", "filter")

    @staticmethod
    def parse(raw: Any, rule_id: str) -> "InstanceScope":
        if raw is None:
            return InstanceScope()
        if isinstance(raw, str):
            raw = {"kind": raw}
        kind = raw.get("kind", "all")
        if kind not in InstanceScope.KINDS:
            raise RuleConfigurationError(
                rule_id, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"unknown scope kind {kind!r} (expected one of {InstanceScope.KINDS})")
        cond = raw.get("condition")
        if kind == "filter" and not cond:
            raise RuleConfigurationError(
                rule_id, ErrorCode.RULE_CONFIGURATION_ERROR,
                "scope kind 'filter' requires a 'condition' expression")
        if kind != "filter" and cond:
            # only the filter kind evaluates a condition — silently
            # storing one on 'all'/'first' dropped the author's row
            # filter and validated rows they meant to exclude (round-5
            # review batch 10); a typo'd kind must be loud
            raise RuleConfigurationError(
                rule_id, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"scope kind {kind!r} does not take a 'condition' "
                f"(did you mean kind: 'filter'?)")
        return InstanceScope(kind=kind, condition=cond)


@dataclass(frozen=True)
class RuleDefinition:
    """One declarative rule (``Models/RuleSet.cs:51-129``).

    ``source`` scopes the rule to one group value of the grouping column
    (the reference's ``resourceType`` discriminator) or ``"*"`` for all.
    """

    id: str
    type: str
    source: str = "*"
    column: str | None = None
    expr: str | None = None
    scope: InstanceScope = field(default_factory=InstanceScope)
    severity: str = Severity.ERROR
    validation_class: str = ValidationClass.BUSINESS
    error_code: str | None = None
    params: dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def parse(raw: dict[str, Any]) -> "RuleDefinition":
        rule_id = raw.get("id") or ""
        if not rule_id:
            raise RuleConfigurationError(
                "<missing>", ErrorCode.RULE_CONFIGURATION_ERROR, "rule has no 'id'")
        rtype = raw.get("type")
        if not rtype:
            raise RuleConfigurationError(
                rule_id, ErrorCode.RULE_CONFIGURATION_ERROR, "rule has no 'type'")
        severity = raw.get("severity", Severity.ERROR)
        if severity not in Severity.ALL:
            raise RuleConfigurationError(
                rule_id, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"severity {severity!r} not in {Severity.ALL}")
        vclass = raw.get("validationClass", raw.get("validation_class",
                                                    ValidationClass.BUSINESS))
        if vclass not in ValidationClass.ALL:
            raise RuleConfigurationError(
                rule_id, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"validationClass {vclass!r} not in {ValidationClass.ALL}")
        return RuleDefinition(
            id=rule_id,
            type=rtype,
            source=raw.get("source", "*"),
            column=raw.get("column"),
            expr=raw.get("expr"),
            scope=InstanceScope.parse(raw.get("scope"), rule_id),
            severity=severity,
            validation_class=vclass,
            error_code=raw.get("errorCode", raw.get("error_code")),
            params=dict(raw.get("params") or {}),
        )

    # -- typed param accessors with the reference's missing-param contract --

    def require_param(self, name: str) -> Any:
        if name not in self.params or self.params[name] is None:
            raise RuleConfigurationError(
                self.id, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"rule type {self.type!r} requires params.{name}")
        return self.params[name]

    def require_column(self) -> str:
        if not self.column:
            raise RuleConfigurationError(
                self.id, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"rule type {self.type!r} requires 'column'")
        return self.column

    def require_pattern(self) -> str:
        pattern = self.require_param("pattern")
        try:
            re.compile(probe_pattern(pattern))
        except re.error as exc:
            raise RuleConfigurationError(
                self.id, ErrorCode.RULE_CONFIGURATION_ERROR,
                f"invalid regex pattern {pattern!r}: {exc}") from exc
        return pattern


@dataclass(frozen=True)
class RuleSet:
    """Parsed rule set (``Models/RuleSet.cs:10-46``): versioned container of
    rules; code systems / constraint dims arrive separately as broadcast
    dimension DataFrames (SURVEY §1.1 CodeSystem/CodeMaster rows)."""

    version: str = "1.0"
    rules: tuple[RuleDefinition, ...] = ()

    @staticmethod
    def parse(raw: dict[str, Any]) -> "RuleSet":
        rules = tuple(RuleDefinition.parse(r) for r in raw.get("rules", []))
        seen: set[str] = set()
        for r in rules:
            if r.id in seen:
                raise RuleConfigurationError(
                    r.id, ErrorCode.RULE_CONFIGURATION_ERROR, "duplicate rule id")
            seen.add(r.id)
        return RuleSet(version=str(raw.get("version", "1.0")), rules=rules)

    @staticmethod
    def from_json(text_or_path: str) -> "RuleSet":
        if text_or_path.lstrip().startswith("{"):
            return RuleSet.parse(json.loads(text_or_path))
        with open(text_or_path, encoding="utf-8") as fh:
            return RuleSet.parse(json.load(fh))
