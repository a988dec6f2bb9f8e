"""BGP matcher (pipeline.bgp_match) and Flesch readability
(text.readability), round 7: driver-style oracle parity at SF_TINY
plus hand-graph pattern semantics and hand-computed fixed-point
scores.

Tail gates `kg_bgp_match` / `doc_readability` are pinned here until
their first driver rows."""

from __future__ import annotations

import pytest

import cimpy_spark.pipeline as P
from cimpy_spark.functions import text as T
from tests.conftest import SF_TINY
from tools.compare import compare


def _edges(spark, triples):
    return spark.createDataFrame(
        list(triples), "src string, pred string, dst string"
    )


def test_bgp_readability_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["kg_bgp_match", "doc_readability"])


def test_bgp_bag_semantics_counts_paths(spark):
    """A diamond a→{b,c}→d yields TWO bindings for the 2-hop pattern
    — solution mappings are a bag, one row per distinct path."""
    e = _edges(spark, [("a", "p", "b"), ("a", "p", "c"),
                       ("b", "p", "d"), ("c", "p", "d")])
    rows = P.bgp_match(
        e, [("?s", "p", "?m"), ("?m", "p", "?t")]
    ).collect()
    assert sorted((r["s"], r["m"], r["t"]) for r in rows) == [
        ("a", "b", "d"), ("a", "c", "d"),
    ]


def test_bgp_constant_terms_filter(spark):
    e = _edges(spark, [("a", "p", "b"), ("a", "p", "c"), ("x", "p", "b")])
    rows = P.bgp_match(e, [("a", "p", "?o")]).collect()
    assert sorted(r["o"] for r in rows) == ["b", "c"]
    rows = P.bgp_match(e, [("?s", "p", "b")]).collect()
    assert sorted(r["s"] for r in rows) == ["a", "x"]


def test_bgp_repeated_variable_is_self_loop(spark):
    e = _edges(spark, [("a", "p", "a"), ("a", "p", "b")])
    rows = P.bgp_match(e, [("?x", "p", "?x")]).collect()
    assert [r["x"] for r in rows] == ["a"]


def test_bgp_disconnected_patterns_cross_join(spark):
    e = _edges(spark, [("a", "p", "b"), ("c", "q", "d"), ("e", "q", "f")])
    rows = P.bgp_match(e, [("?s", "p", "?o"), ("?u", "q", "?v")]).collect()
    assert len(rows) == 2  # 1 p-edge × 2 q-edges... per binding row
    assert {(r["s"], r["o"], r["u"], r["v"]) for r in rows} == {
        ("a", "b", "c", "d"), ("a", "b", "e", "f"),
    }


def test_bgp_fail_loud_contracts(spark):
    e = _edges(spark, [("a", "p", "b")])
    with pytest.raises(ValueError, match="rdf:type"):
        P.bgp_match(e, [("?x", "rdf:type", "T0")])
    with pytest.raises(ValueError, match="ground pattern"):
        P.bgp_match(e, [("a", "p", "b")])
    with pytest.raises(ValueError, match="empty pattern"):
        P.bgp_match(e, [])


def test_readability_hand_values(spark):
    """'The cat sat.' — 3 words / 1 sentence / 3 syllables →
    206.835 − 1.015·3 − 84.6·1 = 119.19 exactly in micro-units; a
    vowel-free word floors to 1 syllable; no punctuation floors to 1
    sentence; NULL text drops."""
    docs = spark.createDataFrame(
        [
            (1, "The cat sat."),
            (2, "xyz."),
            (3, "no punctuation here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.readability(docs).collect()}
    assert set(out) == {1, 2, 3}
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (3, 1, 3)
    assert r1["flesch_micro"] == 206_835_000 - 3_045_000 - 84_600_000
    assert abs(r1["flesch"] - 119.19) < 1e-9
    r2 = out[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 1)
    assert r2["flesch_micro"] == 206_835_000 - 1_015_000 - 84_600_000
    assert out[3]["n_sentences"] == 1
