"""Packing-efficiency report (text.pack_stats) and frequent
tool-call sequences (conversations.conv_tool_ngrams), round 7:
driver-style oracle parity at SF_TINY plus exact hand-fixture
accounting and the sequence-contiguity contract.

Tail gates `doc_pack_stats` / `conv_tool_ngrams` are pinned here
until their first driver rows."""

from __future__ import annotations

import pytest

from cimpy_spark.functions import text as T
from cimpy_spark.functions.conversations import conv_tool_ngrams
from tests.conftest import SF_TINY
from tools.compare import compare


def test_pack_tool_ngrams_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["doc_pack_stats", "conv_tool_ngrams"])


def test_pack_stats_hand_accounting(spark):
    """One shard, budget 10, docs of 4+3+5=12 tokens: the last doc
    straddles the boundary at offset 7, the shard fills 1 full
    sequence with a 2-token tail, and the padding waste is exactly
    (10−2)/(2·10) = 0.4."""
    docs = spark.createDataFrame(
        [(1, "w w w w"), (2, "w w w"), (3, "w w w w w")],
        "doc_id long, text string",
    )
    rows = T.pack_stats(docs, budget=10, n_shards=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 3 and r["total_tokens"] == 12
    assert r["n_straddle"] == 1
    assert r["n_seqs"] == 2 and r["tail_tokens"] == 2
    assert r["pad_waste_micro"] == 400_000


def test_pack_stats_consistency_with_packing(spark):
    """Σ n_docs over shards = corpus size; per shard tail < budget,
    straddle ≤ n_docs, and an exact-chop shard reports zero waste by
    the CASE contract (identity checked arithmetically for all)."""
    import __spark_entry__ as E

    docs = E._docs(spark, SF_TINY)
    rows = T.pack_stats(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r["tail_tokens"] < 256
        assert r["n_straddle"] <= r["n_docs"]
        full = r["total_tokens"] // 256
        assert r["n_seqs"] == full + (1 if r["tail_tokens"] else 0)
        if r["tail_tokens"] == 0:
            assert r["pad_waste_micro"] == 0


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )


def test_tool_ngrams_hand_sequences(spark):
    """[search, read, write, read, write] yields the three
    overlapping 3-grams once each; two conversations sharing a chain
    count n_occurrences=2 / n_convs=2."""
    t = _tr(spark, [
        ("c1", 1, "search"), ("c1", 2, "read"), ("c1", 3, "write"),
        ("c1", 4, "read"), ("c1", 5, "write"),
        ("c2", 1, "search"), ("c2", 2, "read"), ("c2", 3, "write"),
    ])
    rows = {r["seq"]: r for r in conv_tool_ngrams(t, min_support=1).collect()}
    assert rows["search>read>write"]["n_occurrences"] == 2
    assert rows["search>read>write"]["n_convs"] == 2
    assert rows["read>write>read"]["n_occurrences"] == 1
    assert rows["write>read>write"]["n_convs"] == 1
    assert conv_tool_ngrams(t, min_support=2).count() == 1


def test_tool_ngrams_null_turns_do_not_break_chains(spark):
    """Non-tool turns between calls are skipped BEFORE windowing —
    the tool-call subsequence is contiguous (the transitions-op
    contract), so a chain with chat turns interleaved still mines."""
    t = _tr(spark, [
        ("c1", 1, "a"), ("c1", 2, None), ("c1", 3, "b"),
        ("c1", 4, None), ("c1", 5, "c"),
    ])
    rows = conv_tool_ngrams(t, min_support=1).collect()
    assert [r["seq"] for r in rows] == ["a>b>c"]


def test_tool_ngrams_n_contract(spark):
    t = _tr(spark, [("c1", 1, "a"), ("c1", 2, "b")])
    with pytest.raises(ValueError, match="n >= 2"):
        conv_tool_ngrams(t, n=1)
    rows = conv_tool_ngrams(t, n=2, min_support=1).collect()
    assert [r["seq"] for r in rows] == ["a>b"]
