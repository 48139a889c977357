"""Navigation: JSON pointers + breadcrumbs for violation locations
(SmartPathNavigationService.cs:29-406 analog) — driver-side helpers,
the native with_pointer projection (plan-pinned shuffle-free), and
AUTHORING-mode first-match resolution."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark.compiler import EngineConfig
from fhir_data_validation_spark.engine import ValidationEngine
from fhir_data_validation_spark.errors import RuleConfigurationError
from fhir_data_validation_spark.model import RuleSet
from fhir_data_validation_spark.navigation import (breadcrumbs, json_pointer,
                                                   resolve_first_match,
                                                   split_segments,
                                                   with_pointer)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------- driver-side ----

def test_json_pointer_resolution_contract():
    # scalar / dotted struct paths: plain pointer
    assert json_pointer("n_tok") == "/n_tok"
    assert json_pointer("meta.lang") == "/meta/lang"
    # one array level, resolved and unresolved
    assert json_pointer("tags[*].code", (3,)) == "/tags/3/code"
    assert json_pointer("tags[*].code") == "/tags"          # stop at array
    assert json_pointer("tags[*]", (0,)) == "/tags/0"
    # two levels
    assert json_pointer("g[*].items[*].q", (1, 4)) == "/g/1/items/4/q"
    assert json_pointer("g[*].items[*].q", (1,)) == "/g/1/items"
    assert json_pointer("g[*].items[*].q", (None, 4)) == "/g"
    # dataset-level violations carry no location
    assert json_pointer("") is None
    # RFC 6901 escaping
    assert json_pointer("a~b.c/d") == "/a~0b/c~1d"


def test_split_segments_rejects_malformed():
    assert split_segments("a[*].b") == [("a", True), ("b", False)]
    with pytest.raises(ValueError):
        split_segments("a[*]b.c")
    with pytest.raises(ValueError):
        split_segments("a..b")


def test_breadcrumbs_human_rendering():
    assert breadcrumbs("g[*].items[*].q", (1, 4)) == ["g[1]", "items[4]", "q"]
    assert breadcrumbs("g[*].items[*].q", (1,)) == ["g[1]", "items[*]"]
    assert breadcrumbs("meta.lang") == ["meta", "lang"]
    assert breadcrumbs("") == []


# ------------------------------------------------- native projection ----

@pytest.fixture(scope="module")
def nested_violations(spark):
    rows = [
        ("d1", [{"items": [{"q": 99}, {"q": 5}]},
                {"items": [{"q": 100}]}], "s1"),
        ("d2", [{"items": [{"q": 1}]}], "s1"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, g array<struct<items:array<struct<q:int>>>>, "
              "src string")
    engine = ValidationEngine(RuleSet.parse({"rules": [
        {"id": "NAV-1", "type": "Range", "column": "g[*].items[*].q",
         "params": {"min": 0, "max": 50, "perElement": True}},
        {"id": "NAV-2", "type": "Required", "column": "doc_id"},
    ]}), config=EngineConfig(key_col="doc_id", group_col="src"))
    return engine.validate(df).violations


def test_with_pointer_matches_driver_side(nested_violations):
    out = with_pointer(nested_violations, breadcrumb_col="crumb")
    got = {(r["doc_id"], r["json_pointer"], r["crumb"])
           for r in out.collect()}
    # d1: g[0].items[0].q = 99 and g[1].items[0].q = 100 violate
    assert ("d1", "/g/0/items/0/q", "g[0] > items[0] > q") in got
    assert ("d1", "/g/1/items/0/q", "g[1] > items[0] > q") in got
    assert len(got) == 2
    # parity with the driver-side resolver
    for r in out.collect():
        idx = r["detail"].get("index")
        idx2 = r["detail"].get("innerIndex")
        idxs = tuple(int(i) for i in (idx, idx2) if i is not None)
        assert r["json_pointer"] == json_pointer(r["column"], idxs)
        assert r["crumb"] == " > ".join(breadcrumbs(r["column"], idxs))


def test_with_pointer_scalar_and_dataset_rows(spark):
    viol = spark.createDataFrame(
        [("d1", "n_tok", {"actual": "0"}),
         ("d2", "", {"group": "s1"}),
         ("d3", "tags[*].code", {})],          # element lane, no index
        "doc_id string, column string, detail map<string,string>")
    got = {r["doc_id"]: r["json_pointer"]
           for r in with_pointer(viol).collect()}
    assert got == {"d1": "/n_tok", "d2": None, "d3": "/tags"}


def test_with_pointer_is_shuffle_free(nested_violations):
    plan = _explain(with_pointer(nested_violations.localCheckpoint(),
                                 breadcrumb_col="crumb"))
    assert "Exchange" not in plan


# --------------------------------------------------- authoring mode ----

def test_resolve_first_match_first_key_per_group(spark):
    df = spark.createDataFrame(
        [("d3", "s1", 9), ("d1", "s1", 9), ("d2", "s1", 1),
         ("d9", "s2", 9), ("d8", "s2", 1)],
        "doc_id string, src string, v int")
    got = {(r["src"], r["doc_id"], r["json_pointer"])
           for r in resolve_first_match(df, "v > 5", "tags[*].code",
                                        group_col="src").collect()}
    assert got == {("s1", "d1", "/tags"), ("s2", "d9", "/tags")}


def test_resolve_first_match_rejects_bad_expr(spark):
    df = spark.createDataFrame([("d1", "s1", 1)],
                               "doc_id string, src string, v int")
    with pytest.raises(RuleConfigurationError):
        resolve_first_match(df, "v >= (", "tags[*].code", group_col="src")


def test_pointer_depth3_stops_at_second_array():
    """round-5 review regressions (batch 10): with ≥3 markers the second
    detail index is a FLATTENED ordinal, not the second array's index —
    json_pointer/breadcrumbs must stop where with_pointer stops instead
    of fabricating a location."""
    from fhir_data_validation_spark.navigation import (breadcrumbs,
                                                       json_pointer)
    assert json_pointer("a[*].b[*].c[*].d", (1, 2)) == "/a/1/b"
    assert breadcrumbs("a[*].b[*].c[*].d", (1, 2)) == ["a[1]", "b[*]"]
    # two markers keep full resolution (innerIndex IS the second index)
    assert json_pointer("a[*].b[*].c", (1, 2)) == "/a/1/b/2/c"
