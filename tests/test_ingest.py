"""Lenient JSON ingest (S2): malformed records become violations, the
scan never aborts (ValidationPipeline.cs:486-604 re-expressed)."""

from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from fhir_data_validation_spark.sources.ingest import (
    clean_rows, corrupt_record_violations, read_json_lenient)

SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("tokens", ArrayType(IntegerType())),
    StructField("n_tok", IntegerType()),
    StructField("source", StringType()),
])


def test_lenient_ingest_never_aborts(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([
        '{"doc_id": "d1", "tokens": [1, 2], "n_tok": 2, "source": "web"}',
        '{"doc_id": "d2", "tokens": [3], "n_tok": 1, "source": "web"',  # bad
        'not json at all',                                              # bad
        '{"doc_id": "d3", "tokens": [], "n_tok": 0, "source": "wiki"}',
    ]))
    df = read_json_lenient(spark, str(p), SCHEMA)
    assert df.count() == 4  # nothing dropped, nothing raised

    clean = clean_rows(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == ["d1", "d3"]
    assert "_corrupt_record" not in clean.columns

    viol = corrupt_record_violations(df).collect()
    assert len(viol) == 2
    assert all(v["rule_id"] == "INGEST-001"
               and v["severity"] == "error"
               and v["detail"]["raw"] for v in viol)
    raws = {v["detail"]["raw"] for v in viol}
    assert "not json at all" in raws


def test_clean_rows_flow_into_engine(spark, tmp_path):
    from fhir_data_validation_spark import RuleSet, ValidationEngine
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join([
        '{"doc_id": "d1", "tokens": [], "n_tok": 0, "source": "web"}',
        'garbage line',
    ]))
    df = read_json_lenient(spark, str(p), SCHEMA)
    rs = RuleSet.parse({"rules": [
        {"id": "LEN-1", "type": "ArrayLength", "column": "tokens",
         "params": {"min": 1}}]})
    res = ValidationEngine(rs).validate(clean_rows(df))
    ingest = corrupt_record_violations(df)
    all_viol = res.violations.unionByName(ingest.drop("stage"))
    got = {(r["rule_id"],) for r in all_viol.collect()}
    assert got == {("LEN-1",), ("INGEST-001",)}


def test_schema_diff_reports_all_drift_kinds(spark):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    from fhir_data_validation_spark.sources.ingest import schema_diff
    expected = StructType([
        StructField("id", LongType(), nullable=False),
        StructField("text", StringType(), nullable=True),
        StructField("gone", StringType(), nullable=True)])
    actual = spark.createDataFrame(
        [(1, "x", "new")], "id long, text string, extra string")
    diff = schema_diff(actual, expected)
    by_col = {d["column"]: d["status"] for d in diff}
    assert by_col == {"gone": "missing", "extra": "unexpected",
                      "id": "nullability_relaxed"}
    # conformant pair -> empty
    assert schema_diff(expected, expected) == []
    # type change detected
    changed = spark.createDataFrame([("1", "x", "y")],
                                    "id string, text string, gone string")
    assert any(d["column"] == "id" and d["status"] == "type_changed"
               for d in schema_diff(changed, expected))
    import pytest as _pt
    with _pt.raises(TypeError):
        schema_diff(42, expected)
