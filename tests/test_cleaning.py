"""PII redaction + line-level cleaning (redaction.py / cleaning.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark.pipeline import cleaning, redaction

PII_TEXT = ("mail bob.smith+x@ex-ample.co.uk here 10.0.255.7 call "
            "+6591234567 or 555-123-4567 ssn 123-45-6789 not1.2.3.4.5 "
            "v1.2.3")


# ---------------------------------------------------------------- redaction

def test_redact_all_kinds(spark):
    df = spark.createDataFrame([(1, PII_TEXT)], "doc_id long, text string")
    row = redaction.redact_docs(df).collect()[0]
    assert row["text"] == ("mail <EMAIL> here <IPV4> call <PHONE> or "
                           "<PHONE> ssn <SSN> not1.<IPV4> v1.2.3")
    assert (row["n_pii_email"], row["n_pii_ssn"],
            row["n_pii_phone"], row["n_pii_ipv4"]) == (1, 1, 2, 2)


def test_redact_matches_duckdb_re2(spark):
    """The whole point of the pattern subset: DuckDB's RE2 engine applied
    sequentially produces the identical redacted string and counts."""
    df = spark.createDataFrame([(1, PII_TEXT)], "doc_id long, text string")
    row = redaction.redact_docs(df).collect()[0]
    con = duckdb.connect()
    cur, counts = PII_TEXT, {}
    for kind, pat in redaction.PII_PATTERNS.items():
        counts[kind] = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [cur, pat]).fetchone()[0]
        cur = con.execute(
            "SELECT regexp_replace(?, ?, ?, 'g')",
            [cur, pat, redaction.redaction_token(kind)]).fetchone()[0]
    assert row["text"] == cur
    assert {k: row[f"n_pii_{k}"] for k in counts} == counts


def test_redact_sequential_no_double_count(spark):
    # the digits in an email local part must not also count as a phone
    df = spark.createDataFrame([(1, "reach +6591234567@relay.example.org")],
                               "doc_id long, text string")
    row = redaction.redact_docs(df).collect()[0]
    assert row["n_pii_email"] == 1 and row["n_pii_phone"] == 0
    assert row["text"] == "reach <EMAIL>"


def test_redact_kind_subset_and_unknown(spark):
    df = spark.createDataFrame([(1, PII_TEXT)], "doc_id long, text string")
    row = redaction.redact_docs(df, kinds=["ipv4"]).collect()[0]
    assert "<EMAIL>" not in row["text"] and "<IPV4>" in row["text"]
    assert "n_pii_email" not in row.asDict()
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redaction.redact(F.col("text"), kinds=["email", "nope"])


def test_redact_is_single_projection(spark):
    df = spark.createDataFrame([(1, PII_TEXT)], "doc_id long, text string")
    plan = (redaction.redact_docs(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ----------------------------------------------------------- line dedup

def test_dedup_lines_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "aaa long line\n\nbbb\naaa long line\n\nbbb\nccc"), (2, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in cleaning.dedup_lines_docs(df).collect()}
    assert out[1] == "aaa long line\n\nbbb\nccc"
    assert out[2] == ""


def test_dedup_lines_min_len_keeps_short_lines(spark):
    df = spark.createDataFrame(
        [(1, "aaa long line\n\nbbb\naaa long line\n\nbbb\nccc")],
        "doc_id long, text string")
    out = cleaning.dedup_lines_docs(df, min_len=5).collect()[0]["text"]
    # blank lines and the short 'bbb' survive; the long duplicate goes
    assert out == "aaa long line\n\nbbb\n\nbbb\nccc"


def test_dedup_lines_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = (cleaning.dedup_lines_docs(df, min_len=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ----------------------------------------------------------- strip_markup

HTML_DOC = ('<html><head><STYLE type="text/css">body { color: red }\n'
            '</STYLE><script>\nvar x = "<p>not text</p>";\n</script ></head>'
            '<body><!-- nav\nstarts --><h1 class="t">Fish &amp; Chips</h1>'
            '<p>1 &lt; 2,&nbsp;&quot;q&quot; &#39;s&#39; &amp;lt;raw</p>\n'
            '<br/>tail</body></html>')

HTML_PLAIN = 'Fish & Chips 1 < 2, "q" \'s\' &lt;raw tail'


def test_strip_markup_basic(spark):
    """script/style content dies, comments die, tags become spaces, the six
    entities decode (&amp; last: '&amp;lt;' → '&lt;', never '<'), whitespace
    collapses, result trimmed."""
    df = spark.createDataFrame([(1, HTML_DOC), (2, "no markup  here"),
                                (3, None)], "doc_id long, text string")
    out = {r["doc_id"]: r["clean"]
           for r in df.select("doc_id",
                              cleaning.strip_markup(F.col("text"))
                              .alias("clean")).collect()}
    assert out[1] == HTML_PLAIN
    assert out[2] == "no markup here"
    assert out[3] is None


def test_strip_markup_matches_duckdb_re2(spark):
    """Patterns live in the Java∩RE2 subset: DuckDB applying the identical
    expression chain produces the identical plain text."""
    df = spark.createDataFrame([(1, HTML_DOC)], "doc_id long, text string")
    got = df.select(cleaning.strip_markup(F.col("text"))
                    .alias("c")).collect()[0]["c"]
    con = duckdb.connect()
    cur = HTML_DOC
    for pat in (cleaning._MARKUP_SCRIPT, cleaning._MARKUP_STYLE,
                cleaning._MARKUP_COMMENT, cleaning._MARKUP_TAG):
        cur = con.execute("SELECT regexp_replace(?, ?, ' ', 'g')",
                          [cur, pat]).fetchone()[0]
    for ent, ch in cleaning._MARKUP_ENTITIES:
        cur = con.execute("SELECT replace(?, ?, ?)",
                          [cur, ent, ch]).fetchone()[0]
    cur = con.execute("SELECT trim(regexp_replace(?, ?, ' ', 'g'))",
                      [cur, cleaning._MARKUP_WS]).fetchone()[0]
    assert got == cur


def test_strip_markup_no_shuffle(spark):
    df = spark.createDataFrame([(1, HTML_DOC)], "doc_id long, text string")
    plan = (df.select(cleaning.strip_markup(F.col("text")).alias("c"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ----------------------------------------------------------- boilerplate

@pytest.fixture(scope="module")
def footered(spark):
    rows = [(i, f"body text number {i} here\nfooter common line x")
            for i in range(5)]
    rows.append((9, "only unique body text\nshort"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_flagged(spark, footered):
    flagged = cleaning.boilerplate_lines(footered, min_docs=3).collect()
    assert [(r["line"], r["n_docs"]) for r in flagged] == \
        [("footer common line x", 5)]


def test_remove_boilerplate(spark, footered):
    out = {r["doc_id"]: r for r in
           cleaning.remove_boilerplate(footered, min_docs=3)
           .orderBy("doc_id").collect()}
    for i in range(5):
        assert out[i]["text"] == f"body text number {i} here"
        assert out[i]["n_removed_lines"] == 1
    assert out[9]["text"] == "only unique body text\nshort"
    assert out[9]["n_removed_lines"] == 0


def test_remove_boilerplate_doc_fully_removed(spark):
    rows = [(i, "the repeated footer") for i in range(3)]
    rows.append((7, "the repeated footer\nplus some real content"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           cleaning.remove_boilerplate(df, min_docs=3).collect()}
    assert out[0]["text"] == "" and out[0]["n_removed_lines"] == 1
    assert out[7]["text"] == "plus some real content"


def test_remove_boilerplate_short_lines_never_flagged(spark):
    df = spark.createDataFrame([(i, "hey\nhey\nhey") for i in range(4)],
                               "doc_id long, text string")
    out = cleaning.remove_boilerplate(df, min_docs=2, min_len=10).collect()
    assert all(r["text"] == "hey\nhey\nhey" for r in out)


def test_boilerplate_min_docs_guard(spark, footered):
    with pytest.raises(ValueError, match="min_docs"):
        cleaning.boilerplate_lines(footered, min_docs=1)


def test_remove_boilerplate_broadcast_plan(spark, footered):
    """The flagged set must reach the anti-join as a broadcast — no
    sort-merge over the line stream."""
    plan = (cleaning.remove_boilerplate(footered, min_docs=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# ------------------------------------------------------- repetition stats

def test_repetition_profile(spark):
    from fhir_data_validation_spark.pipeline.text import repetition_profile
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),          # 3/4 dup words, 2/3 dup 2-grams
         (2, "all words are different here"),
         (3, "a\nb\na\nb"),                   # 2/4 dup lines
         (4, ""), (5, "one")],                # degenerate: no repeats
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_profile(df).collect()}
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["dup_2gram_frac"] == round(2 / 3, 4)
    assert out[2]["dup_word_frac"] == 0.0
    assert out[3]["dup_line_frac"] == 0.5
    assert out[4]["dup_word_frac"] == 0.0 and out[4]["dup_line_frac"] == 0.0
    assert out[5]["dup_2gram_frac"] == 0.0    # shorter than n: no shingles


def test_repetition_profile_single_projection(spark):
    from fhir_data_validation_spark.pipeline.text import repetition_profile
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = (repetition_profile(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------- corpus-level line dedup

def test_dedup_lines_corpus_keep_first(spark):
    rows = [(1, "unique opening line one\nshared repeated line x"),
            (2, "shared repeated line x\nunique second body line"),
            (3, "shared repeated line x\nshort\nunique third body line")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           cleaning.dedup_lines_corpus(df, min_len=10).collect()}
    # first occurrence (doc 1) keeps the shared line; later docs lose it
    assert out[1]["text"] == ("unique opening line one\n"
                              "shared repeated line x")
    assert out[1]["n_removed_lines"] == 0
    assert out[2]["text"] == "unique second body line"
    assert out[2]["n_removed_lines"] == 1
    # the short line is never eligible and survives in place
    assert out[3]["text"] == "short\nunique third body line"


def test_dedup_lines_corpus_stable_under_repartition(spark):
    rows = [(i, f"body {i} asdf qwer\ncommon repeated tail line")
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["text"]
         for r in cleaning.dedup_lines_corpus(df).collect()}
    b = {r["doc_id"]: r["text"]
         for r in cleaning.dedup_lines_corpus(df.repartition(5)).collect()}
    assert a == b
    assert "common repeated tail line" in a[0]
    assert all("common repeated tail line" not in a[i] for i in range(1, 6))


def test_dedup_lines_corpus_within_doc_repeat(spark):
    # a repeat INSIDE one document is also a later occurrence
    df = spark.createDataFrame(
        [(1, "repeated inside doc line\nmiddle unique content\n"
             "repeated inside doc line")],
        "doc_id long, text string")
    out = cleaning.dedup_lines_corpus(df).collect()[0]
    assert out["text"] == "repeated inside doc line\nmiddle unique content"
    assert out["n_removed_lines"] == 1


def test_round5_batch13_cleaning_edges(spark):
    """round-5 review regressions (batch 13): CRLF-tolerant line split,
    NUL-tagged keep-alive no longer corrupts genuine NUL+digit suffixes,
    NULL text survives the boilerplate rebuild, and unterminated
    script/comment blocks strip to end-of-doc instead of driving Java's
    lazy scan quadratic."""
    from fhir_data_validation_spark.pipeline import cleaning
    # keep path: genuine trailing NUL+digits survives dedup_lines
    df = spark.createDataFrame([("d1", "data\x007\nother long line here")],
                               "doc_id string, text string")
    out = df.select(cleaning.dedup_lines(F.col("text"), min_len=3)
                    .alias("t")).collect()[0]["t"]
    assert out == "data\x007\nother long line here"
    # two distinct NUL-suffixed lines stay distinct
    df2 = spark.createDataFrame([("d", "data\x001\ndata\x002")],
                                "doc_id string, text string")
    out2 = df2.select(cleaning.dedup_lines(F.col("text"), min_len=3)
                      .alias("t")).collect()[0]["t"]
    assert out2 == "data\x001\ndata\x002"
    # CRLF and LF copies of a boilerplate line hash identically now
    crlf = spark.createDataFrame(
        [("a", "keep me unique A\r\ncookie banner line\r\n"),
         ("b", "keep me unique B\ncookie banner line\n"),
         ("c", None)],
        "doc_id string, text string")
    cleaned = {r["doc_id"]: r for r in cleaning.remove_boilerplate(
        crlf, min_docs=2, min_len=10).collect()}
    assert "cookie banner" not in cleaned["a"]["text"]
    assert "cookie banner" not in cleaned["b"]["text"]
    assert cleaned["c"]["text"] is None           # NULL provenance kept
    assert cleaned["c"]["n_removed_lines"] == 0
    # unterminated blocks strip to end (and stay linear-time)
    ht = spark.createDataFrame(
        [("h", "before <script>never closed " + "<!-- " * 1000 + "x")],
        "doc_id string, text string")
    stripped = ht.select(cleaning.strip_markup(F.col("text"))
                         .alias("t")).collect()[0]["t"]
    assert stripped == "before"


def test_round5_batch13_ipv4_octet_bounds(spark):
    """round-5 review regressions (batch 13): dotted quads with octets
    above 255 (version strings, section numbers) are not PII."""
    from fhir_data_validation_spark.pipeline.redaction import redact_docs
    df = spark.createDataFrame(
        [("d1", "from 10.1.400.999 to 10.2.500.999 via 192.168.0.1")],
        "doc_id string, text string")
    r = redact_docs(df).collect()[0]
    assert r["n_pii_ipv4"] == 1
    assert "10.1.400.999" in r["text"] and "<IPV4>" in r["text"]
