"""Spec hints (SpecHintService.cs / Hl7SpecHintGenerator.cs analog):
catalog generation from schema/contract + one-pass advisory scan."""

import contextlib
import io

import pytest
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from fhir_data_validation_spark.errors import RuleConfigurationError
from fhir_data_validation_spark.spechints import SpecHint, generate, scan


def test_generate_from_schema_and_contract():
    schema = StructType([
        StructField("doc_id", StringType(), nullable=False),
        StructField("tokens", ArrayType(IntegerType()), nullable=False),
        StructField("note", StringType(), nullable=True),
    ])
    hints = generate(schema, contract={
        "note": {"reason": "notes required for web docs",
                 "source": "web", "severity": "info"},
    })
    by_path = {h.path: h for h in hints}
    assert set(by_path) == {"doc_id", "tokens", "note"}
    assert by_path["doc_id"].severity == "warning"
    assert by_path["note"].source == "web"
    assert by_path["note"].severity == "info"
    with pytest.raises(ValueError):
        SpecHint(path="x", reason="r", severity="error")


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("d1", "web", "hello", [1, 2]),
        ("d2", "web", "", [1, None]),          # note empty, bad element
        ("d3", "api", None, []),               # note null, empty array
        ("d4", "api", "x", None),              # array null
    ]
    return spark.createDataFrame(
        rows, "doc_id string, source string, note string, tokens array<int>")


def test_scan_counts_and_witness(frame):
    out = scan(frame, [
        SpecHint(path="note", reason="r1"),
        SpecHint(path="tokens", reason="r2"),
    ])
    got = {(r["source"], r["path"]): (r["n_missing"], r["n_checked"],
                                      r["witness"])
           for r in out.collect()}
    # empty string counts missing (engine Required convention)
    assert got[("web", "note")] == (1, 2, "d2")
    assert got[("api", "note")] == (1, 2, "d3")
    assert got[("web", "tokens")] == (0, 2, None)
    assert got[("api", "tokens")] == (2, 2, "d3")


def test_scan_conditional_and_source_scope(frame):
    out = scan(frame, [
        SpecHint(path="note", reason="web docs need notes", source="web"),
        SpecHint(path="note", reason="long docs need notes",
                 condition="size(tokens) >= 2"),
    ])
    rows = out.collect()
    scoped = [r for r in rows if not r["conditional"]]
    cond = [r for r in rows if r["conditional"]]
    # source-scoped hint reports only for its group
    assert {r["source"] for r in scoped} == {"web"}
    # conditional: only d1/d2 have size>=2; d2's note is empty
    got = {(r["source"]): (r["n_missing"], r["n_checked"]) for r in cond}
    assert got == {"web": (1, 2)}


def test_scan_applies_to_each_elements(frame):
    out = scan(frame, [SpecHint(path="tokens", reason="no null tokens",
                                applies_to_each=True)])
    got = {r["source"]: r["n_missing"] for r in out.collect()}
    # web: d2 has a null element; api: d3 empty + d4 null
    assert got == {"web": 1, "api": 2}
    with pytest.raises(RuleConfigurationError):
        scan(frame, [SpecHint(path="note", reason="x",
                              applies_to_each=True)])


def test_scan_unknown_path_raises_before_any_job(frame):
    with pytest.raises(RuleConfigurationError):
        scan(frame, [SpecHint(path="nope", reason="x")])
    with pytest.raises(ValueError):
        scan(frame, [])


def test_scan_is_one_fused_aggregation(frame):
    out = scan(frame, [
        SpecHint(path="note", reason="a"),
        SpecHint(path="tokens", reason="b"),
        SpecHint(path="tokens", reason="c", applies_to_each=True),
    ])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    # all hints ride ONE aggregation: a single exchange, no join/union
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Union" not in plan
