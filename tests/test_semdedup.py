"""SemDeDup (similarity.semdedup, round 7): driver-style parity vs
its DuckDB oracle (the shared unrolled-Lloyd chain + brute-force
within-cell cosine), the planted-duplicate contract on the organic
embedding corpus, and the one-shot (anti-chaining) keep rule the
operator docstring promises.

Tail gate `emb_semdedup` is pinned here until its first driver row.
"""

from __future__ import annotations

import duckdb
import pytest

from cimpy_spark.fixtures.organic import (
    ORGANIC_COS_THRESHOLD,
    organic_embeddings,
)
from cimpy_spark.functions import doc_oracles as O
from cimpy_spark.functions import similarity as S
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_TINY}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def out_rows(spark, emb):
    return S.semdedup(
        organic_embeddings(emb), threshold=ORGANIC_COS_THRESHOLD
    ).collect()


def _norm_row(vec_id, cell, max_sim_lower, is_kept):
    s = None if max_sim_lower is None else round(max_sim_lower, 9)
    return (int(vec_id), int(cell), s, bool(is_kept))


def test_semdedup_parity_vs_duckdb(out_rows):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_TINY}/embeddings.parquet')"
    )
    du = {_norm_row(*r) for r in con.execute(O.semdedup_sql()).fetchall()}
    sp = {
        _norm_row(r["vec_id"], r["cell"], r["max_sim_lower"], r["is_kept"])
        for r in out_rows
    }
    assert sp == du


def test_semdedup_planted_contract(out_rows):
    """The amplitude-modulated copies (cos ≈ 0.98 to their base, ids
    base+1M) are dropped by min-id-wins whenever they share their
    base's cell (all but at most a few boundary cases); the
    sign-flipped hard negatives (cos ≈ 0, ids base+2M) and the bases
    themselves always survive."""
    by_range = {"base": [], "mod": [], "flip": []}
    for r in out_rows:
        v = r["vec_id"]
        key = "base" if v < 10**6 else ("mod" if v < 2 * 10**6 else "flip")
        by_range[key].append(r)
    assert all(r["is_kept"] for r in by_range["base"])
    assert all(r["is_kept"] for r in by_range["flip"])
    mod_dropped = [r for r in by_range["mod"] if not r["is_kept"]]
    # the overwhelming majority of planted dups must be caught (a
    # copy can only escape by landing across a cell boundary)
    assert len(mod_dropped) >= 0.8 * len(by_range["mod"])
    assert all(
        r["max_sim_lower"] >= ORGANIC_COS_THRESHOLD for r in mod_dropped
    )
    # every input vector appears exactly once
    ids = [r["vec_id"] for r in out_rows]
    assert len(ids) == len(set(ids))


def test_semdedup_one_shot_not_chained(spark):
    """A~B and B~C with A!~C: the keep rule consults raw lower-id
    neighbors, not surviving ones, so B AND C are both dropped (the
    documented anti-chaining contract; transitive-closure semantics
    lives in emb_dedup_corpus)."""
    import math

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    # cos(16°) ≈ 0.961 ≥ 0.95; cos(32°) ≈ 0.848 < 0.95
    rows = [(0, vec(0.0)), (1, vec(16.0)), (2, vec(32.0))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in S.semdedup(df, k=1, iters=1, threshold=0.95).collect()
    }
    assert out[0]["is_kept"]
    assert not out[1]["is_kept"]  # A~B
    assert not out[2]["is_kept"]  # B~C, even though B itself dropped
    assert out[2]["max_sim_lower"] == pytest.approx(
        math.cos(math.radians(16.0)), abs=1e-5
    )
