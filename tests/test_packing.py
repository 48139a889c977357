"""Sequence packing (concat-and-chunk): mapping invariants + assembly."""

import pytest
from pyspark.sql import functions as F

from fhir_data_validation_spark.pipeline.packing import (assemble_sequences,
                                                         pack_sequences,
                                                         with_shards)


@pytest.fixture(scope="module")
def token_df(spark):
    rows = [
        ("a", "d1", list(range(0, 5)), 5),     # stream a: 5+7+3+9 = 24 tokens
        ("a", "d2", list(range(10, 17)), 7),
        ("a", "d3", [99, 98, 97], 3),
        ("a", "d4", list(range(20, 29)), 9),
        ("a", "d0", [], 0),                    # zero-token doc: dropped
        ("b", "d5", list(range(50, 63)), 13),  # stream b: 13 tokens
    ]
    return spark.createDataFrame(
        rows, "source string, doc_id string, tokens array<int>, n_tok int")


def test_pieces_tile_sequences_exactly(spark, token_df):
    pieces = pack_sequences(token_df, seq_len=8).collect()
    # shard a: 24 tokens -> seqs 0,1,2 all full; shard b: 13 -> seq0 full,
    # seq1 has 5
    by_seq = {}
    for p in pieces:
        by_seq.setdefault((p["shard"], p["seq"]), []).append(p)
    lens = {k: sum(p["piece_len"] for p in v) for k, v in by_seq.items()}
    assert lens == {("a", 0): 8, ("a", 1): 8, ("a", 2): 8,
                    ("b", 0): 8, ("b", 1): 5}
    for (shard, seq), v in by_seq.items():
        offs = sorted((p["seq_offset"], p["piece_len"]) for p in v)
        pos = 0
        for o, ln in offs:     # pieces tile [0, total) with no gap/overlap
            assert o == pos
            pos += ln
    # no zero-token doc appears
    assert all(p["doc_id"] != "d0" for p in pieces)


def test_straddling_doc_offsets(spark, token_df):
    pieces = {(p["doc_id"], p["seq"]): p
              for p in pack_sequences(token_df, seq_len=8).collect()
              if p["shard"] == "a"}
    # order within shard a: d1(5) d2(7) d3(3) d4(9) -> d2 occupies [5,12):
    # straddles seqs 0/1 at the 8-boundary
    p0, p1 = pieces[("d2", 0)], pieces[("d2", 1)]
    assert (p0["doc_offset"], p0["seq_offset"], p0["piece_len"]) == (0, 5, 3)
    assert (p1["doc_offset"], p1["seq_offset"], p1["piece_len"]) == (3, 0, 4)
    assert p0["piece"] == [10, 11, 12] and p1["piece"] == [13, 14, 15, 16]


def test_assemble_round_trip(spark, token_df):
    pieces = pack_sequences(token_df, seq_len=8)
    seqs = {(r["shard"], r["seq"]): r
            for r in assemble_sequences(pieces).collect()}
    # concat order within shard = doc_id order; re-concatenating the
    # assembled sequences in seq order must reproduce the doc streams
    stream_a = (list(range(0, 5)) + list(range(10, 17)) + [99, 98, 97]
                + list(range(20, 29)))
    got_a = sum((seqs[("a", i)]["tokens"] for i in range(3)), [])
    assert got_a == stream_a
    got_b = seqs[("b", 0)]["tokens"] + seqs[("b", 1)]["tokens"]
    assert got_b == list(range(50, 63))
    assert seqs[("a", 0)]["n_tok"] == 8 and seqs[("b", 1)]["n_tok"] == 5
    # d2 straddle -> seq a/0 holds pieces of d1 and d2
    assert seqs[("a", 0)]["n_docs"] == 2


def test_custom_order_and_validation(spark, token_df):
    ordered = pack_sequences(token_df, seq_len=8,
                             order_cols=("n_tok", "doc_id")).collect()
    first = min((p for p in ordered if p["shard"] == "a"),
                key=lambda p: (p["seq"], p["seq_offset"]))
    assert first["doc_id"] == "d3"         # shortest doc packs first
    with pytest.raises(ValueError):
        pack_sequences(token_df, seq_len=0)


def test_with_shards_deterministic(spark, token_df):
    a = with_shards(token_df, 4).select("doc_id", "shard").collect()
    b = with_shards(token_df, 4).select("doc_id", "shard").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["shard"] < 4 for r in a)


# ---------------------------------------------------------- chunk_windows

def test_chunk_windows_overlap_coverage(spark):
    from fhir_data_validation_spark.pipeline.packing import chunk_windows
    df = spark.createDataFrame(
        [("d1", [f"t{i}" for i in range(10)]),   # 10 toks, W4 S2 -> 4 chunks
         ("d2", ["a", "b", "c"]),                # n < W -> one short chunk
         ("d3", [])],                            # empty -> dropped
        "doc_id string, tokens array<string>")
    out = {(r["doc_id"], r["chunk"]): r
           for r in chunk_windows(df, window=4, stride=2).collect()}
    assert {k[0] for k in out} == {"d1", "d2"}
    d1 = [out[("d1", i)] for i in range(4)]
    assert [r["chunk_start"] for r in d1] == [0, 2, 4, 6]
    assert [r["chunk_len"] for r in d1] == [4, 4, 4, 4]
    assert d1[3]["chunk_tokens"] == ["t6", "t7", "t8", "t9"]
    # sliding windows overlap by window - stride tokens
    assert d1[0]["chunk_tokens"][2:] == d1[1]["chunk_tokens"][:2]
    # every token covered (stride <= window)
    covered = sorted({t for r in d1 for t in r["chunk_tokens"]})
    assert covered == sorted(f"t{i}" for i in range(10))
    assert out[("d2", 0)]["chunk_tokens"] == ["a", "b", "c"]
    assert out[("d2", 0)]["chunk_len"] == 3
    assert ("d1", 4) not in out           # no pure-suffix trailing chunk


def test_chunk_windows_short_tail_and_guards(spark):
    from fhir_data_validation_spark.pipeline.packing import chunk_windows
    df = spark.createDataFrame([("d", [str(i) for i in range(7)])],
                               "doc_id string, tokens array<string>")
    rows = sorted(chunk_windows(df, window=4, stride=3).collect(),
                  key=lambda r: r["chunk"])
    # starts 0, 3 -> last chunk reaches the end and is full; n=7
    assert [(r["chunk_start"], r["chunk_len"]) for r in rows] == [(0, 4), (3, 4)]
    rows = sorted(chunk_windows(df, window=3, stride=3).collect(),
                  key=lambda r: r["chunk"])
    assert [(r["chunk_start"], r["chunk_len"]) for r in rows] == [
        (0, 3), (3, 3), (6, 1)]           # exact tiling w/ short tail
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_windows(df, window=0)
    with _pt.raises(ValueError):
        chunk_windows(df, window=4, stride=-1)


def test_chunk_windows_stride_exceeds_window(spark):
    """stride > window samples disjoint windows with gaps; no start may
    land at or past the document end (regression: the uncapped chunk
    count scheduled start=16 on a 12-token doc — negative slice length
    crashed the job — and an empty chunk at start == n)."""
    from fhir_data_validation_spark.pipeline.packing import chunk_windows
    df = spark.createDataFrame(
        [("d1", [str(i) for i in range(12)]),   # starts 0, 8 (16 is past)
         ("d2", [str(i) for i in range(10)]),   # starts 0, 5 (10 == n)
         ("d3", [str(i) for i in range(5)])],   # start 0 only
        "doc_id string, tokens array<string>")
    out = {}
    for r in chunk_windows(df, window=3, stride=8).collect():
        out.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(out["d1"], key=lambda r: r["chunk"])
    assert [(r["chunk_start"], r["chunk_len"]) for r in d1] == [(0, 3), (8, 3)]
    assert d1[1]["chunk_tokens"] == ["8", "9", "10"]
    rows = sorted(chunk_windows(df.where("doc_id = 'd2'"),
                                window=3, stride=5).collect(),
                  key=lambda r: r["chunk"])
    assert [(r["chunk_start"], r["chunk_len"]) for r in rows] == [(0, 3), (5, 3)]
    assert all(r["chunk_len"] > 0 for r in rows)
    rows = chunk_windows(df.where("doc_id = 'd3'"),
                         window=2, stride=10).collect()
    assert [(r["chunk_start"], r["chunk_len"]) for r in rows] == [(0, 2)]


def test_chunk_windows_no_shuffle(spark):
    from fhir_data_validation_spark.pipeline.packing import chunk_windows
    df = spark.createDataFrame([("d", ["a", "b"])],
                               "doc_id string, tokens array<string>")
    plan = chunk_windows(df, window=2, stride=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan         # pure projection + generate


def test_assemble_sequences_doc_spans(spark, token_df):
    from fhir_data_validation_spark.pipeline.packing import (
        assemble_sequences, pack_sequences)
    seqs = assemble_sequences(pack_sequences(token_df, seq_len=8),
                              include_spans=True).collect()
    for s in seqs:
        spans = s["doc_spans"]
        # spans tile the sequence exactly, in order, one per piece
        assert spans[0]["start"] == 0
        for a, b in zip(spans, spans[1:]):
            assert a["start"] + a["len"] == b["start"]
        assert spans[-1]["start"] + spans[-1]["len"] == s["n_tok"]
        assert len(spans) == s["n_docs"]
