"""Error-code taxonomy and engine exceptions.

Re-expresses the reference's unified error model
(``/root/reference/backend/src/Pss.FhirProcessor.Engine/Validation/ErrorCodes.cs:16-252``
and ``docs/08_unified_error_model.md:16-46``) for the token-table data model.
Every violation row carries exactly one of these machine codes; the engine
never emits prose-only errors (the reference's "no legacy message" guardrail,
``Phase4/NoLegacyMessageAllowedTests.cs``).
"""

from __future__ import annotations


class Severity:
    ERROR = "error"
    WARNING = "warning"
    INFO = "info"

    ALL = (ERROR, WARNING, INFO)


class ValidationClass:
    """Mirrors ``Models/RuleSet.cs:93-100``: Contract rules are never
    severity-downgraded; Business rules may be."""

    CONTRACT = "Contract"
    BUSINESS = "Business"

    ALL = (CONTRACT, BUSINESS)


class Stage:
    """Evaluation stages in priority order (lower = earlier authority).

    Mirrors the reference pipeline's stage ordering
    (``Core/ValidationPipeline.cs:80-480``): STRUCTURE findings outrank
    later stages during dedup (``ValidationPipeline.cs:783-827``).
    """

    STRUCTURE = 0
    BUSINESS = 1
    CONSTRAINT = 2
    REFERENCE = 3
    DATASET = 4
    DRIFT = 5


class ErrorCode:
    # per-row predicate family (SURVEY §2.3)
    FIELD_REQUIRED = "FIELD_REQUIRED"
    FIXED_VALUE_MISMATCH = "FIXED_VALUE_MISMATCH"
    VALUE_NOT_ALLOWED = "VALUE_NOT_ALLOWED"
    PATTERN_MISMATCH = "PATTERN_MISMATCH"
    ARRAY_LENGTH_OUT_OF_RANGE = "ARRAY_LENGTH_OUT_OF_RANGE"
    ARRAY_LENGTH_VIOLATION = "ARRAY_LENGTH_VIOLATION"
    CODE_NOT_IN_VALUESET = "CODE_NOT_IN_VALUESET"
    CUSTOM_CONDITION_FAILED = "CUSTOM_CONDITION_FAILED"
    # structural / grammar family (SURVEY §2.7)
    INVALID_ENUM_VALUE = "INVALID_ENUM_VALUE"
    ENUM_VALIDATION_SKIPPED = "ENUM_VALIDATION_SKIPPED"
    INVALID_PRIMITIVE = "INVALID_PRIMITIVE"
    VALUE_EXCLUSIVITY_VIOLATION = "VALUE_EXCLUSIVITY_VIOLATION"
    # constraint family (SURVEY §2.6)
    ANSWER_OUT_OF_RANGE = "ANSWER_OUT_OF_RANGE"
    MAX_LENGTH_EXCEEDED = "MAX_LENGTH_EXCEEDED"
    PRECISION_VIOLATION = "PRECISION_VIOLATION"
    # dataset family (SURVEY §2.4-2.5, §2.8)
    DUPLICATE_KEY = "DUPLICATE_KEY"
    REFERENCE_NOT_FOUND = "REFERENCE_NOT_FOUND"
    REFERENCE_TYPE_MISMATCH = "REFERENCE_TYPE_MISMATCH"
    RESOURCE_REQUIREMENT_VIOLATION = "RESOURCE_REQUIREMENT_VIOLATION"
    UNEXPECTED_RESOURCE = "UNEXPECTED_RESOURCE"
    DISTRIBUTION_DRIFT = "DISTRIBUTION_DRIFT"
    EXPECTATION_VIOLATION = "EXPECTATION_VIOLATION"
    OUTLIER_VALUE = "OUTLIER_VALUE"
    VECTOR_CHECK_FAILED = "VECTOR_CHECK_FAILED"
    SEQUENCE_SHAPE_VIOLATION = "SEQUENCE_SHAPE_VIOLATION"
    JSON_PATH_VIOLATION = "JSON_PATH_VIOLATION"
    AGGREGATE_MISMATCH = "AGGREGATE_MISMATCH"
    GROUP_SHARE_VIOLATION = "GROUP_SHARE_VIOLATION"
    MONOTONICITY_VIOLATION = "MONOTONICITY_VIOLATION"
    DISTINCT_BAND_VIOLATION = "DISTINCT_BAND_VIOLATION"
    FUNCTIONAL_DEPENDENCY_VIOLATION = "FUNCTIONAL_DEPENDENCY_VIOLATION"
    HEAVY_HITTER_VIOLATION = "HEAVY_HITTER_VIOLATION"
    # terminology / CodeMaster family (SURVEY §2.5 R6, J4-J5)
    CODESYSTEM_MISMATCH = "CODESYSTEM_MISMATCH"
    UNKNOWN_SCREENING_TYPE = "UNKNOWN_SCREENING_TYPE"
    MISSING_QUESTION_CODE = "MISSING_QUESTION_CODE"
    INVALID_QUESTION_CODE = "INVALID_QUESTION_CODE"
    INVALID_ANSWER_VALUE = "INVALID_ANSWER_VALUE"
    MULTIPLE_VALUES_NOT_ALLOWED = "MULTIPLE_VALUES_NOT_ALLOWED"
    # configuration (compile-time, SURVEY §2.3 R2 missing-param contract)
    RULE_CONFIGURATION_ERROR = "RULE_CONFIGURATION_ERROR"
    INVALID_FIELD_PATH = "INVALID_FIELD_PATH"


class RuleConfigurationError(ValueError):
    """Raised at rule-compile time for malformed rules.

    The analog of the reference's ``RULE_CONFIGURATION_ERROR`` /
    ``INVALID_FIELD_PATH`` pre-flight rejection
    (``RuleEngines/FhirPathRuleEngine.cs:94-124``,
    ``FhirPathRuleEngineTests.cs:147-176``): bad rules never reach
    execution; they fail the compile step with a machine code.
    """

    def __init__(self, rule_id: str, code: str, message: str):
        self.rule_id = rule_id
        self.code = code
        super().__init__(f"[{code}] rule {rule_id!r}: {message}")
