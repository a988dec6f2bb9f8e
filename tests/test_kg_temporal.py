"""KG temporal/provenance wave (late round 7): SCD2 edge timelines,
per-edge provenance/evidence, and as-of point-in-time attribute
reconstruction. Driver-style oracle parity at SF_TINY (tail entries
until their first driver rows) plus hand-built invariants: run
collapsing on target flips, unresolved-target exclusion, alias
merging before run construction, lexicographic-first provenance
under shuffled input order, and the watermark's run-containment
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

import cimpy_spark.pipeline as P
from tests.conftest import SF_TINY
from tools.compare import compare

NEW_GATES = [
    "kg_edge_history",
    "kg_edge_provenance",
    "kg_asof_nodes",
    "kg_metapaths",
]


def test_kg_temporal_oracle_parity(spark):
    assert compare(spark, SF_TINY, NEW_GATES)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_kind string, "
        "conv_id string, turn_idx int, mention_idx int, role string",
    )


def _cmap(spark, pairs):
    return spark.createDataFrame(
        pairs, "entity_id string, canonical_id string"
    )


def _ents(spark, ids):
    return spark.createDataFrame(
        [(i, "T0") for i in ids], "entity_id string, type string"
    )


def test_edge_history_runs_and_unresolved_exclusion(spark):
    # S.controls: A, B, B, A in mention order → 3 versions (A:1,
    # B:2, A:1); the dangling target X never enters the timeline
    rows = [
        ("S", "controls", "A", "ref", "c1", 0, 0, "user"),
        ("S", "controls", "B", "ref", "c1", 1, 0, "user"),
        ("S", "controls", "B", "ref", "c2", 0, 0, "user"),
        ("S", "controls", "A", "ref", "c2", 1, 0, "user"),
        ("S", "controls", "X", "ref", "c1", 2, 0, "user"),
    ]
    ids = ["S", "A", "B"]
    out = sorted(
        P.edge_history(
            _triples(spark, rows), _ents(spark, ids),
            _cmap(spark, [(i, i) for i in ids]),
        ).collect(),
        key=lambda r: r.version,
    )
    assert [(r.version, r.dst, r.n_assertions) for r in out] == [
        (1, "A", 1), (2, "B", 2), (3, "A", 1),
    ]
    # run 2's provenance is its FIRST assertion
    assert (out[1].from_conv_id, out[1].from_turn_idx) == ("c1", 1)


def test_edge_history_merges_aliases_before_runs(spark):
    # S9 is an alias of S1; their interleaved assertions form ONE
    # per-canonical-subject timeline, and the alias's target (also an
    # alias) canonicalizes before run comparison — so all three
    # assertions are one run of the SAME canonical edge
    rows = [
        ("S1", "feeds", "A1", "ref", "c1", 0, 0, "user"),
        ("S9", "feeds", "A9", "ref", "c1", 1, 0, "user"),
        ("S1", "feeds", "A1", "ref", "c1", 2, 0, "user"),
    ]
    cmap = _cmap(
        spark,
        [("S1", "S1"), ("S9", "S1"), ("A1", "A1"), ("A9", "A1")],
    )
    out = P.edge_history(
        _triples(spark, rows), _ents(spark, ["S1", "S9", "A1", "A9"]), cmap
    ).collect()
    assert len(out) == 1
    assert (out[0].src, out[0].dst, out[0].n_assertions) == ("S1", "A1", 3)


def test_edge_provenance_counts_and_first(spark):
    # input rows deliberately NOT in mention order: first_* must be
    # the lexicographic (conv, turn, mention) minimum, not row order
    rows = [
        ("S", "feeds", "A", "ref", "c2", 5, 0, "user"),
        ("S", "feeds", "A", "ref", "c1", 9, 3, "user"),
        ("S", "feeds", "A", "ref", "c1", 9, 1, "user"),
        ("S", "feeds", "B", "ref", "c1", 0, 0, "user"),
    ]
    ids = ["S", "A", "B"]
    out = {
        (r.src, r.pred, r.dst): r
        for r in P.edge_provenance(
            _triples(spark, rows), _ents(spark, ids),
            _cmap(spark, [(i, i) for i in ids]),
        ).collect()
    }
    ea = out[("S", "feeds", "A")]
    assert (ea.n_asserts, ea.n_convs) == (3, 2)
    assert (ea.first_conv_id, ea.first_turn_idx, ea.first_mention_idx) == (
        "c1", 9, 1,
    )
    assert out[("S", "feeds", "B")].n_convs == 1


def test_asof_nodes_watermark_semantics(spark):
    # E.p: 'a' (c1) → 'b' (c2) → 'c' (c9); E.q: one run STARTING at
    # c1 that continues asserting into c9 (still in force at any
    # later watermark); F.r first asserted only at c9 (absent below)
    rows = [
        ("E", "p", "a", "literal", "c1", 0, 0, "user"),
        ("E", "p", "b", "literal", "c2", 0, 0, "user"),
        ("E", "p", "c", "literal", "c9", 0, 0, "user"),
        ("E", "q", "k", "literal", "c1", 1, 0, "user"),
        ("E", "q", "k", "literal", "c9", 1, 0, "user"),
        ("F", "r", "z", "literal", "c9", 0, 0, "user"),
    ]
    cmap = _cmap(spark, [("E", "E"), ("F", "F")])
    tr = _triples(spark, rows)

    def asof(w):
        return {
            (r.entity_id, r.attr): (r.value, r.version)
            for r in P.asof_nodes(tr, cmap, conv_watermark=w).collect()
        }

    at_c2 = asof("c2")
    assert at_c2[("E", "p")] == ("b", 2)
    assert at_c2[("E", "q")] == ("k", 1)  # run spans past watermark
    assert ("F", "r") not in at_c2  # first asserted after watermark
    at_c9 = asof("c9")
    assert at_c9[("E", "p")] == ("c", 3)
    assert at_c9[("F", "r")] == ("z", 1)


def test_metapaths_hub_factorization(spark):
    """A hub mid node with 3 in-edges and 2 out-edges yields 3×2
    pattern instances — the factorized census must equal the
    enumeration count WITHOUT building the 6 paths; backtracking
    paths (a→m→a) are legitimate 2-paths and counted."""
    edges = spark.createDataFrame(
        [
            ("a1", "p", "m"), ("a2", "p", "m"), ("b1", "q", "m"),
            ("m", "r", "c1"), ("m", "r", "a1"),
        ],
        "src string, pred string, dst string",
    )
    ents = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("m", "M"), ("c1", "C")],
        "entity_id string, type string",
    )
    out = {
        (r.src_type, r.pred1, r.mid_type, r.pred2, r.dst_type): r.n_paths
        for r in P.metapaths(edges, ents).collect()
    }
    assert out == {
        ("A", "p", "M", "r", "C"): 2,
        ("A", "p", "M", "r", "A"): 2,  # includes the a1→m→a1 backtrack
        ("B", "q", "M", "r", "C"): 1,
        ("B", "q", "M", "r", "A"): 1,
        ("M", "r", "A", "p", "M"): 1,  # m→a1→m: a1 is a mid too
    }


def test_asof_matches_full_nodes_at_max_watermark(spark, request):
    """At a watermark >= every conv id, as-of values must equal the
    FINAL value of each (entity, attr) timeline — tying asof_nodes to
    attr_history end-to-end on the real fixture."""
    from __spark_entry__ import _graph

    g = _graph(spark, SF_TINY)
    final = {
        (r.entity_id, r.attr): r
        for r in P.attr_history(g.triples, g.cmap).collect()
    }
    last = {}
    for (e, a), r in final.items():
        cur = last.get((e, a))
        if cur is None or r.version > cur.version:
            last[(e, a)] = r
    asof = {
        (r.entity_id, r.attr): r
        for r in P.asof_nodes(g.triples, g.cmap, "c~").collect()
    }  # '~' sorts after every digit
    assert set(asof) == set(last)
    for k, r in asof.items():
        assert (r.value, r.version) == (last[k].value, last[k].version)
