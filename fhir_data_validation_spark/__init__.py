"""PySpark-native constraint-validation engine.

A brand-new engine with the query semantics of the reference validator
(``TuNguyenSynapxe/fhir-data-validation``) re-expressed as DataFrame/Catalyst
dataflow over tables of pre-tokenized training sequences
``(doc_id string, tokens array<int>, n_tok int, source string)``.
See SURVEY.md for the full semantic mapping.
"""

from . import skew, stats  # noqa: F401  (operator namespaces)
from .bloom import KeyIndex
from .compiler import EngineConfig, compile_ruleset
from .engine import ValidationEngine, ValidationResult, validate
from .details_contract import (DETAILS_CONTRACT, contract_report,
                               validate_details)
from .errors import ErrorCode, RuleConfigurationError, Severity, ValidationClass
from .explanations import explain_rule, explain_ruleset, explain_violation
from .governance import (ReviewIssue, RuleReviewResult, review_report,
                         review_rule, review_ruleset)
from .grammars import PRIMITIVE_GRAMMARS, grammar_rule, grammar_ruleset
from .incremental_stats import IncrementalProfiler
from .lineage import LineageStore, ResumableRun
from .lint import LintFinding, lint_dataset, lint_report
from .model import InstanceScope, RuleDefinition, RuleSet
from .plans import (expectation_report, group_cardinality_counts,
                    outlier_bounds)
from .questions import question_rules, question_rules_from_json
from .report import QualityReport, quality_report
from .suggestions import suggest_rules

__all__ = [
    "DETAILS_CONTRACT", "contract_report", "validate_details",
    "explain_rule", "explain_ruleset", "explain_violation",
    "EngineConfig", "ErrorCode", "IncrementalProfiler", "InstanceScope",
    "KeyIndex", "LineageStore",
    "LintFinding", "PRIMITIVE_GRAMMARS", "ReviewIssue",
    "RuleReviewResult", "grammar_rule", "grammar_ruleset",
    "QualityReport", "ResumableRun", "RuleConfigurationError",
    "RuleDefinition", "RuleSet", "Severity", "ValidationClass",
    "ValidationEngine", "ValidationResult", "compile_ruleset",
    "expectation_report", "group_cardinality_counts", "outlier_bounds",
    "lint_dataset", "lint_report", "quality_report", "question_rules",
    "question_rules_from_json", "review_report", "review_rule",
    "review_ruleset", "suggest_rules",
    "skew", "stats", "validate",
]

__version__ = "0.1.0"
