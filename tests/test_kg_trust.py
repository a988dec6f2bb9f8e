"""KG trust/closure wave (late round 7): iterative truth discovery +
source trust, ER merge clusters, rdf:type subclass closure. Each op
gets (a) the driver-style oracle parity check at SF_TINY (these
entries sit in the rotation tail until their first driver rows) and
(b) hand-built invariant tests pinning the semantics the fixture
alone can't isolate — the round-2 trust REWEIGHTING actually flipping
a majority-vote winner, exact integer trust values, transitive
cluster merging, DAG min-depth closure, and the cycle fail-loud."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import cimpy_spark.pipeline as P
from cimpy_spark.operators.schema import type_closure
from tests.conftest import SF_TINY
from tools.compare import compare

NEW_GATES = [
    "kg_truth_discovery",
    "kg_source_trust",
    "kg_er_clusters",
    "kg_type_closure",
    "kg_range_conformance",
]


def test_kg_trust_oracle_parity(spark):
    assert compare(spark, SF_TINY, NEW_GATES)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_kind string, "
        "conv_id string, turn_idx int, mention_idx int, role string",
    )


def _cmap_identity(spark, ids):
    return spark.createDataFrame(
        [(i, i) for i in ids], "entity_id string, canonical_id string"
    )


def _trust_fixture(spark):
    """Four background facts F1..F4 where s1 and s4 agree (their value
    wins 2 votes to 1+1) while s2/s3 each assert a DIFFERENT wrong
    value; one contested fact (E, p) where s1 says 'good' and s2+s3
    both say 'bad'. Majority vote (round 1) elects 'bad' 2:1; round-1
    trust is s1=4/5, s4=4/4, s2=s3=1/5, so round 2 rescores the
    contested fact 800000 ('good') vs 400000 ('bad') — the
    reweighting FLIPS the winner."""
    rows = []
    for i in range(1, 5):
        rows += [
            (f"F{i}", "q", f"v{i}", "literal", "s1", i, 0, "user"),
            (f"F{i}", "q", f"v{i}", "literal", "s4", i, 0, "user"),
            (f"F{i}", "q", f"w{i}", "literal", "s2", i, 0, "user"),
            (f"F{i}", "q", f"x{i}", "literal", "s3", i, 0, "user"),
        ]
    rows += [
        ("E", "p", "good", "literal", "s1", 9, 0, "user"),
        ("E", "p", "bad", "literal", "s2", 9, 0, "user"),
        ("E", "p", "bad", "literal", "s3", 9, 0, "user"),
    ]
    ids = [f"F{i}" for i in range(1, 5)] + ["E"]
    return _triples(spark, rows), _cmap_identity(spark, ids)


def test_truth_discovery_round2_flips_majority(spark):
    triples, cmap = _trust_fixture(spark)
    r1 = {
        (r.entity_id, r.attr): r
        for r in P.truth_discovery(triples, cmap, iters=1).collect()
    }
    r2 = {
        (r.entity_id, r.attr): r
        for r in P.truth_discovery(triples, cmap, iters=2).collect()
    }
    # round 1 IS the majority vote: 'bad' wins the contested fact 2:1
    assert r1[("E", "p")].value == "bad"
    assert r1[("E", "p")].score_micro == 2 * P.TRUST_SCALE
    # round 2 reweights by source reliability and flips it
    assert r2[("E", "p")].value == "good"
    assert r2[("E", "p")].score_micro == 800_000
    assert r2[("E", "p")].n_sources == 1
    # the uncontested background facts never flip
    for i in range(1, 5):
        assert r1[(f"F{i}", "q")].value == f"v{i}"
        assert r2[(f"F{i}", "q")].value == f"v{i}"


def test_source_trust_exact_integers(spark):
    triples, cmap = _trust_fixture(spark)
    t1 = {
        r.conv_id: r for r in P.source_trust(triples, cmap, iters=1).collect()
    }
    # after round 1 (majority winners): s1 matches 4/5, s4 4/4,
    # s2 1/5 (only the contested 'bad'), s3 1/5 — wait: s3's claims
    # are x1..x4 (all lose) + 'bad' (wins round 1) = 1/5
    assert (t1["s1"].n_claims, t1["s1"].n_correct) == (5, 4)
    assert t1["s1"].trust_micro == 800_000
    assert t1["s4"].trust_micro == P.TRUST_SCALE
    assert t1["s2"].trust_micro == 200_000
    assert t1["s3"].trust_micro == 200_000
    # after round 2 the flip costs s2/s3 their one win
    t2 = {
        r.conv_id: r for r in P.source_trust(triples, cmap, iters=2).collect()
    }
    assert (t2["s1"].n_claims, t2["s1"].n_correct) == (5, 5)
    assert t2["s1"].trust_micro == P.TRUST_SCALE
    assert t2["s2"].trust_micro == 0
    assert t2["s3"].trust_micro == 0


def test_truth_discovery_dedupes_repeated_assertions(spark):
    # one source repeating itself is ONE claim — repetition inside a
    # conversation must not outvote an independent source
    rows = [
        ("E", "p", "spam", "literal", "s1", i, 0, "user") for i in range(5)
    ] + [
        ("E", "p", "ham", "literal", "s2", 0, 0, "user"),
        ("E", "p", "ham", "literal", "s3", 0, 0, "user"),
    ]
    out = P.truth_discovery(
        _triples(spark, rows), _cmap_identity(spark, ["E"]), iters=1
    ).collect()
    assert len(out) == 1 and out[0].value == "ham"
    assert out[0].n_sources == 2


def test_truth_discovery_rejects_zero_iters(spark):
    triples, cmap = _trust_fixture(spark)
    with pytest.raises(ValueError):
        P.truth_discovery(triples, cmap, iters=0)


def test_er_clusters_transitive_merge(spark):
    """Every entity_match pair must land in one cluster, cluster ids
    are the min member, sizes are consistent — and the SF_TINY fixture
    has chained pairs, so transitivity (A~B, B~C with no A~C pair) is
    genuinely exercised (asserted below)."""
    from __spark_entry__ import _graph

    g = _graph(spark, SF_TINY)
    pairs = [
        (r.entity_a, r.entity_b)
        for r in P.entity_match(g.triples, g.cmap, g.canon_edges).collect()
    ]
    cl = {
        r.entity_id: (r.cluster_id, r.cluster_size)
        for r in P.er_clusters(g.triples, g.cmap, g.canon_edges).collect()
    }
    # exactly the matched entities appear
    assert set(cl) == {e for p in pairs for e in p}
    for a, b in pairs:
        assert cl[a][0] == cl[b][0]
    # cluster id = min member; size = member count
    from collections import defaultdict

    members = defaultdict(set)
    for e, (cid, _) in cl.items():
        members[cid].add(e)
    for cid, ms in members.items():
        assert cid == min(ms)
        for e in ms:
            assert cl[e][1] == len(ms)
    # the fixture chains: at least one cluster is BIGGER than any
    # single pair, so CC does work a pair-list cannot
    assert max(len(ms) for ms in members.values()) >= 3


def _hier(spark, rows):
    return spark.createDataFrame(rows, "child string, parent string")


def _ents(spark, rows):
    return spark.createDataFrame(rows, "entity_id string, type string")


def test_type_closure_chain_and_reflexive(spark):
    # chain A→B→C→D→E exercises depth 4 (two doublings)
    hier = _hier(spark, [("A", "B"), ("B", "C"), ("C", "D"), ("D", "E")])
    ents = _ents(spark, [("e1", "A"), ("e2", "D")])
    out = {
        (r.entity_id, r.is_a): r.depth
        for r in type_closure(ents, hier).collect()
    }
    assert out == {
        ("e1", "A"): 0, ("e1", "B"): 1, ("e1", "C"): 2,
        ("e1", "D"): 3, ("e1", "E"): 4,
        ("e2", "D"): 0, ("e2", "E"): 1,
    }


def test_type_closure_diamond_min_depth(spark):
    # diamond D→{B,C}→A: D is_a A appears ONCE at min depth 2
    hier = _hier(spark, [("D", "B"), ("D", "C"), ("B", "A"), ("C", "A")])
    out = type_closure(_ents(spark, [("e", "D")]), hier).collect()
    rows = [(r.is_a, r.depth) for r in out]
    assert sorted(rows) == [("A", 2), ("B", 1), ("C", 1), ("D", 0)]


def test_type_closure_cycle_fails_loud(spark):
    hier = _hier(spark, [("A", "B"), ("B", "A")])
    with pytest.raises(RuntimeError, match="cyclic"):
        type_closure(_ents(spark, [("e", "A")]), hier, max_doublings=4)


def test_range_conformance_kinds(spark):
    """Hierarchy A0→A→B→C (child→parent). Dominant range of p is B
    (2 edges); an A0 target conforms via a DEPTH-2 subclass path, a C
    target is an ANCESTOR of B — broader than the range, a violation
    under RDFS semantics — and an off-ontology Z target violates."""
    from cimpy_spark.operators.schema import range_conformance

    hier = _hier(spark, [("A0", "A"), ("A", "B"), ("B", "C")])
    ents = spark.createDataFrame(
        [("s", "B"), ("b1", "B"), ("a0", "A0"), ("c1", "C"), ("z1", "Z")],
        "entity_id string, type string",
    )
    rows = [
        ("s", "p", "b1", "ref", "c1", 0, 0, "user"),
        ("s", "p", "b1", "ref", "c1", 1, 0, "user"),
        ("s", "p", "a0", "ref", "c1", 2, 0, "user"),
        ("s", "p", "c1", "ref", "c1", 3, 0, "user"),
        ("s", "p", "z1", "ref", "c1", 4, 0, "user"),
        ("s", "p", "gone", "ref", "c1", 5, 0, "user"),  # unresolved: out
    ]
    out = {
        r.dst_type: (r.kind, r.n_edges, r.dom_range)
        for r in range_conformance(
            _triples(spark, rows), ents, hier
        ).collect()
    }
    assert out == {
        "B": ("exact", 2, "B"),
        "A0": ("subclass", 1, "B"),
        "C": ("violation", 1, "B"),
        "Z": ("violation", 1, "B"),
    }


def test_range_conformance_dominant_tiebreak(spark):
    # equal counts → lexicographically smallest type elected dominant
    from cimpy_spark.operators.schema import range_conformance

    hier = _hier(spark, [("A", "B")])
    ents = spark.createDataFrame(
        [("s", "B"), ("x", "X"), ("y", "Y")],
        "entity_id string, type string",
    )
    rows = [
        ("s", "p", "x", "ref", "c1", 0, 0, "user"),
        ("s", "p", "y", "ref", "c1", 1, 0, "user"),
    ]
    out = range_conformance(_triples(spark, rows), ents, hier).collect()
    assert all(r.dom_range == "X" for r in out)


def test_type_closure_undeclared_type_is_reflexive_only(spark):
    # an entity whose type is outside the ontology still gets its
    # depth-0 row (closure join misses, reflexive row does not)
    hier = _hier(spark, [("A", "B")])
    out = type_closure(_ents(spark, [("e", "Zzz")]), hier).collect()
    assert [(r.is_a, r.depth) for r in out] == [("Zzz", 0)]
