"""Lenient semi-structured ingest (S2 — strict→lenient parse, executable).

The reference parses each bundle strictly and, on failure, re-parses
leniently while CAPTURING the strict error as a violation — the scan
never aborts (``Core/ValidationPipeline.cs:486-604``,
``ParseBundleWithContext``). The Spark analog for JSON/JSONL corpora is
PERMISSIVE mode with a corrupt-record column: malformed rows land with
their raw text in ``_corrupt_record`` and every typed column null, and
:func:`corrupt_record_violations` turns exactly those rows into
unified-model violations — data errors become rows in the violations
table, never job failures.

Parquet inputs don't need this lane (schema enforced at write); it exists
for the raw-JSON edge of a pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..errors import ErrorCode, Severity, Stage

CORRUPT_COL = "_corrupt_record"

INGEST_RULE_ID = "INGEST-001"


def read_json_lenient(spark: SparkSession, path: str,
                      schema: StructType) -> DataFrame:
    """PERMISSIVE JSON(L) read: malformed lines survive as rows whose
    ``_corrupt_record`` carries the raw text (all typed columns null).

    The schema MUST be explicit — schema inference would both scan twice
    and silently drop the corrupt-record column."""
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        schema = StructType(list(schema.fields)
                            + [StructField(CORRUPT_COL, StringType())])
    return (spark.read
            .schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def corrupt_record_violations(df: DataFrame, key_col: str = "doc_id",
                              group_col: str = "source",
                              rule_id: str = INGEST_RULE_ID,
                              max_snippet: int = 200) -> DataFrame:
    """Unified-model violations for the rows the strict parse rejected
    (the captured-strict-error analog). Detail carries a bounded raw-text
    snippet; doc_id is whatever survived lenient parsing (often null)."""
    return (df.where(F.col(CORRUPT_COL).isNotNull())
            .select(
                F.col(key_col).cast("string").alias("doc_id"),
                F.lit(rule_id).alias("rule_id"),
                F.lit("Ingest").alias("rule_type"),
                F.lit(ErrorCode.INVALID_PRIMITIVE).alias("error_code"),
                F.lit(Severity.ERROR).alias("severity"),
                F.col(group_col).cast("string").alias("source"),
                F.lit("").alias("column"),
                F.create_map(
                    F.lit("raw"),
                    F.substring(F.col(CORRUPT_COL), 1, max_snippet))
                 .alias("detail"),
                F.lit(Stage.STRUCTURE).alias("stage")))


def clean_rows(df: DataFrame) -> DataFrame:
    """The rows the strict parse accepted, corrupt column dropped — the
    DataFrame downstream validation runs on."""
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def schema_diff(actual, expected) -> list[dict]:
    """Schema-conformance report between an observed schema and the
    expected contract: a list of ``{column, status, expected, actual}``
    dicts with ``status`` ∈ ``missing`` (contract column absent),
    ``unexpected`` (new column arrived), ``type_changed``,
    ``nullability_relaxed`` (contract says required, data says nullable).
    Empty list ⇒ conformant.

    Pure metadata — no job runs; call it before validation so a silently
    evolved upstream schema fails fast with a named diff instead of a
    mid-scan analysis error. ``actual``/``expected`` accept a DataFrame
    or a StructType.
    """
    from pyspark.sql.types import StructType

    def fields(x):
        st = x.schema if hasattr(x, "schema") else x
        if not isinstance(st, StructType):
            raise TypeError("expected a DataFrame or StructType")
        return {f.name: f for f in st.fields}

    act, exp = fields(actual), fields(expected)
    out: list[dict] = []
    for name, f in exp.items():
        if name not in act:
            out.append({"column": name, "status": "missing",
                        "expected": f.dataType.simpleString(),
                        "actual": None})
        elif act[name].dataType != f.dataType:
            out.append({"column": name, "status": "type_changed",
                        "expected": f.dataType.simpleString(),
                        "actual": act[name].dataType.simpleString()})
        elif act[name].nullable and not f.nullable:
            out.append({"column": name, "status": "nullability_relaxed",
                        "expected": "NOT NULL", "actual": "nullable"})
    for name, f in act.items():
        if name not in exp:
            out.append({"column": name, "status": "unexpected",
                        "expected": None,
                        "actual": f.dataType.simpleString()})
    return sorted(out, key=lambda d: (d["status"], d["column"]))
