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


def test_ivfpq_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["emb_ivfpq_topk"])


def test_ivfpq_full_probe_equals_full_scan(spark):
    # probing every coarse cell removes the restriction: IVF+PQ must
    # reduce EXACTLY to the full ADC scan
    emb = _emb(spark)
    full = SIM.pq_topk(emb, m=4, k=4, n_queries=4, topk=3)
    ivf = SIM.ivfpq_topk(
        emb, coarse_k=4, nprobe=4, m=4, k=4, n_queries=4, topk=3
    )
    assert full.exceptAll(ivf).count() == 0
    assert ivf.exceptAll(full).count() == 0


def test_ivfpq_results_come_from_probed_cells(spark):
    # with nprobe=1 every result vector must sit in its query's single
    # probed (nearest) coarse cell — the restriction is real
    emb = _emb(spark)
    assign, cents = SIM.kmeans_cells(emb, k=4, iters=2)
    cell_of = {r["vec_id"]: r["cell"] for r in assign.collect()}
    res = SIM.ivfpq_topk(
        emb, coarse_k=4, nprobe=1, m=4, k=4, n_queries=4, topk=3
    ).collect()
    assert res
    for r in res:
        # the query's own cell is its nearest (it belongs to it), so
        # with nprobe=1 the probed cell IS the query's cell
        assert cell_of[r["vec_id"]] == cell_of[r["query_id"]]


def test_ivfpq_finds_planted_near_duplicates(spark):
    # a cos≈0.98 copy lands in the same coarse cell as its source, so
    # the probe never hides it — the composition keeps the recall
    # that matters
    from cimpy_spark.fixtures.organic import organic_embeddings

    org = organic_embeddings(_emb(spark, SF_SMALL))
    res = SIM.ivfpq_topk(
        org, coarse_k=4, nprobe=2, m=4, k=4, n_queries=30, topk=5
    ).collect()
    top = {}
    for r in res:
        top.setdefault(r["query_id"], set()).add(r["vec_id"])
    for v in (2, 13, 24):
        assert v + 1_000_000 in top[v], f"planted copy of {v} missed"
