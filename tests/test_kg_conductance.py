"""Community conductance (pipeline.community_conductance, round 7):
driver-style oracle parity at SF_TINY (tail entry until its first
driver row), the exact cut/volume accounting invariants, and the
denominator-zero branch on a hand-built single-community graph.

Tail gate `kg_conductance` is pinned here until its first driver
row."""

from __future__ import annotations

import cimpy_spark.pipeline as P
from tests.conftest import SF_TINY
from tools.compare import compare


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in pairs], "src string, pred string, dst string"
    )


def test_conductance_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["kg_conductance"])


def test_conductance_accounting_invariants(spark):
    """volume = 2·internal + cut per community; Σ cut is even (each
    boundary edge is charged to both sides); Σ internal + Σ cut / 2
    = m (every undirected edge lands in exactly one bucket); node
    counts partition the graph; 0 ≤ φ ≤ 1 in micro-units."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    ce = E._graph(spark, SF_TINY).canon_edges
    rows = P.community_conductance(ce, iters=1).collect()
    m = (
        ce.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst"), F.greatest("src", "dst"))
        .distinct()
        .count()
    )
    n_nodes = (
        ce.select(F.col("src").alias("n"))
        .union(ce.select("dst"))
        .distinct()
        .count()
    )
    assert rows
    for r in rows:
        assert r["volume"] == 2 * r["internal_edges"] + r["cut_edges"]
        assert 0 <= r["conductance_micro"] <= 1_000_000
    total_cut = sum(r["cut_edges"] for r in rows)
    assert total_cut % 2 == 0
    assert sum(r["internal_edges"] for r in rows) + total_cut // 2 == m
    assert sum(r["n_nodes"] for r in rows) == n_nodes


def test_conductance_single_community_denominator_zero(spark):
    """Triangle a-b-c: synchronous LPA converges to ONE community by
    round 2 (round 1 rotates labels, round 2's plurality collapses
    them), so vol = 2m, denom = min(vol, 2m − vol) = 0, and the
    contract reports φ_micro = 0 instead of dividing by zero."""
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    rows = P.community_conductance(edges, iters=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_nodes"] == 3
    assert r["internal_edges"] == 3 and r["cut_edges"] == 0
    assert r["volume"] == 6
    assert r["conductance_micro"] == 0


def test_conductance_two_blocks_bridge(spark):
    """Two triangles joined by one bridge: if LPA keeps them as two
    communities, each side has internal = 3, cut = 1, vol = 7, and
    φ = 1/7 → 142857 micro (exact integer division both engines)."""
    edges = _edges(
        spark,
        [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("x", "z"),
            ("c", "x"),
        ],
    )
    rows = {r["community"]: r for r in
            P.community_conductance(edges, iters=3).collect()}
    # synchronous LPA settles by round 3 to one label per triangle
    # ({a,b,c} under 'a', {x,y,z} under 'c' — probed: rounds 4 and 5
    # are identical); whatever the two winning labels are, the
    # accounting must be the bridge split
    assert len(rows) == 2
    for r in rows.values():
        assert r["n_nodes"] == 3
        assert r["internal_edges"] == 3
        assert r["cut_edges"] == 1
        assert r["volume"] == 7
        assert r["conductance_micro"] == 142857
