"""Curation-report wave (round 7): duplication cluster histogram
(dedup.dup_cluster_stats) and unigram token entropy
(text.token_entropy). Driver-style oracle parity at SF_TINY plus
exact consistency against the underlying dedup_corpus clustering and
hand-computed fixed-point entropy values.

Tail gates `doc_dup_clusters` / `doc_token_entropy` are pinned here
until their first driver rows."""

from __future__ import annotations

from cimpy_spark.functions import dedup as D
from cimpy_spark.functions import text as T
from tests.conftest import SF_TINY
from tools.compare import compare


def test_dup_clusters_entropy_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["doc_dup_clusters", "doc_token_entropy"])


def test_dup_clusters_consistent_with_dedup_corpus(spark):
    """The histogram must be an exact regrouping of dedup_corpus:
    Σ n_docs = corpus size, Σ n_clusters = distinct canonical ids,
    Σ n_removed = the is_kept = false count, and per row
    n_removed = n_docs − n_clusters."""
    import __spark_entry__ as E

    organic = E._organic_docs(spark, SF_TINY)
    dc = D.dedup_corpus(organic).collect()
    hist = D.dup_cluster_stats(organic).collect()
    assert sum(r["n_docs"] for r in hist) == len(dc)
    assert sum(r["n_clusters"] for r in hist) == len(
        {r["canonical_doc_id"] for r in dc}
    )
    assert sum(r["n_removed"] for r in hist) == sum(
        1 for r in dc if not r["is_kept"]
    )
    for r in hist:
        assert r["n_removed"] == r["n_docs"] - r["n_clusters"]
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_dup_clusters_has_multi_doc_clusters(spark):
    """The organic fixture plants verbatim + above-threshold copies,
    so the histogram must contain size ≥ 2 rows — the report can't
    silently degenerate to all-singletons."""
    import __spark_entry__ as E

    hist = D.dup_cluster_stats(E._organic_docs(spark, SF_TINY)).collect()
    assert any(r["cluster_size"] >= 2 and r["n_clusters"] > 0 for r in hist)


def test_token_entropy_hand_values(spark):
    """Exact fixed-point values: a uniform doc has H = 0, an
    all-distinct doc has H = ln n (rounded at micro), empty text
    tokenizes to the single '' token (n = 1, H = 0), and a NULL-text
    doc drops — the same contract as the oracle's unnest."""
    docs = spark.createDataFrame(
        [
            (1, "x x x x"),
            (2, "a b c d"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.token_entropy(docs).collect()}
    assert set(out) == {1, 2, 3}
    # doc 1: n=4, one word: sum_t = round(4·ln4·1e6) = 5545177,
    # 5545177 div 4 = 1386294 = round(ln4·1e6) → H_micro = 0
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 1
    assert out[1]["entropy_micro"] == 0
    # doc 2: every c=1 → sum_t = 0 → H_micro = round(ln4·1e6)
    assert out[2]["n_tokens"] == 4 and out[2]["n_distinct"] == 4
    assert out[2]["entropy_micro"] == 1386294
    assert abs(out[2]["entropy"] - 1.386294) < 1e-9
    # doc 3: '' splits to [''] → n=1, H=0
    assert out[3]["n_tokens"] == 1 and out[3]["entropy_micro"] == 0


def test_token_entropy_bounds(spark):
    """0 ≤ H ≤ ln n (+1 micro rounding slack) over the real corpus,
    and H = ln n exactly when all tokens are distinct."""
    import math

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    for r in T.token_entropy(docs).collect():
        hi = round(math.log(r["n_tokens"]) * 1e6)
        assert -1 <= r["entropy_micro"] <= hi + 1
        if r["n_distinct"] == r["n_tokens"]:
            assert r["entropy_micro"] == hi
