"""ANN recall evaluation (similarity.ann_recall_eval, round 7):
driver-style oracle parity at SF_TINY, the identity control
(self-recall = 1.0 exactly), and the absent-query denominator rule.

Tail gate `emb_recall_eval` is pinned here until its first driver
row."""

from __future__ import annotations

from cimpy_spark.functions import similarity as S
from tests.conftest import SF_TINY
from tools.compare import compare


def test_ann_recall_eval_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["emb_recall_eval"])


def test_ann_recall_identity_control(spark):
    """Scoring the exact control against itself must report recall
    1.0 on every query — anything else is an eval bug, not a search
    result."""
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    exact = S.cosine_topk(emb)
    rows = S.ann_recall_eval(exact, exact).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["recall_micro"] == 1_000_000
        assert r["n_hits"] == r["n_exact"] == r["n_approx"]


def test_ann_recall_bounds_and_live_signal(spark):
    """n_hits ≤ min(n_exact, n_approx) per query, and the gated
    IVF-vs-exact pair must show at least one non-perfect query (the
    fixture's coarse cells genuinely miss neighbors — a degenerate
    all-ones report would mean the eval compares a result to
    itself)."""
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    rows = S.ann_recall_eval(
        S.cosine_topk(emb), S.ivf_topk(emb, nprobe=2)
    ).collect()
    assert any(r["recall_micro"] < 1_000_000 for r in rows)
    for r in rows:
        assert r["n_hits"] <= min(r["n_exact"], r["n_approx"])


def test_ann_recall_absent_query_keeps_denominator(spark):
    """A query with no ANN rows at all stays in the report with
    recall 0 — the left-join contract shared with dedup_eval."""
    exact = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 10, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(0, 10, 1)], "query_id long, neighbor_id long, rank int"
    )
    rows = {r["query_id"]: r for r in S.ann_recall_eval(exact, approx).collect()}
    assert rows[0]["n_hits"] == 1 and rows[0]["recall_micro"] == 500_000
    assert rows[1]["n_approx"] == 0 and rows[1]["recall_micro"] == 0
