"""Product quantization (round 7 continuation): per-subspace Lloyd
codebooks + ADC top-k. Driver-style oracle parity at SF_TINY (tail
entries until their first driver rows) plus invariants: code-table
shape, fail-loud dimension contracts, determinism, and the planted
near-duplicate recall that justifies the operator (cos≈0.98 copies
sit far inside the random cloud's distance band, so even 2-bit
codebooks must surface them)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cimpy_spark.functions import similarity as SIM
from tests.conftest import SF_SMALL, SF_TINY
from tools.compare import compare

NEW_GATES = ["emb_pq_codes", "emb_pq_topk"]


def test_pq_oracle_parity(spark):
    assert compare(spark, SF_TINY, NEW_GATES)


def _emb(spark, sf=SF_TINY):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_pq_codes_shape(spark):
    emb = _emb(spark)
    n = emb.count()
    codes, books = SIM.pq_codes(emb, m=4, k=4)
    rows = codes.collect()
    assert len(rows) == n * 4
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r["vec_id"], set()).add(r["sub"])
        assert 0 <= r["code"] < 4
    assert all(subs == {0, 1, 2, 3} for subs in per_vec.values())
    # one codebook per subspace, k centroids each, of width d/m
    assert set(books) == {0, 1, 2, 3}
    for cents in books.values():
        assert len(cents) == 4
        assert all(len(c) == 16 for c in cents.values())


def test_pq_fail_loud_contracts(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        SIM.pq_codes(emb, m=5)
    two = emb.select("vec_id", "embedding")
    ragged = two.select(
        "vec_id", F.slice("embedding", 1, 63).alias("embedding")
    ).limit(10).unionByName(two.limit(10))
    with pytest.raises(ValueError, match="mixed vector lengths"):
        SIM.pq_codes(ragged, m=4)


def test_pq_topk_is_deterministic(spark):
    emb = _emb(spark)
    a = SIM.pq_topk(emb, m=4, k=4, n_queries=4, topk=3)
    b = SIM.pq_topk(emb, m=4, k=4, n_queries=4, topk=3)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_pq_topk_finds_planted_near_duplicates(spark):
    # organic corpus: vec v (v % 11 == 2) has a cos≈0.98 modulated
    # copy at v + 1_000_000 — its PQ-ADC distance is far below the
    # random cloud's band, so the copy must appear in the top-5 for
    # every planted source query even at 2-bit codebooks
    from cimpy_spark.fixtures.organic import organic_embeddings

    org = organic_embeddings(_emb(spark, SF_SMALL))
    res = SIM.pq_topk(org, m=4, k=4, n_queries=30, topk=5).collect()
    top = {}
    for r in res:
        top.setdefault(r["query_id"], set()).add(r["vec_id"])
    for v in (2, 13, 24):
        assert v + 1_000_000 in top[v], f"planted copy of {v} missed"
