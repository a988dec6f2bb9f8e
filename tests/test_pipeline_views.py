"""Unit tests for graph view operators in cimpy_spark.pipeline
(adjacency, reachability guard) — exact values at corpus scale are
covered by the DuckDB oracle gate; these check the operator contracts
on tiny closed-form graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cimpy_spark import pipeline as P


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def test_adjacency_emits_sorted_scalar_neighbors(spark):
    """Neighbors must be a ','-joined SORTED string (hashable scalar —
    the round-2 driver comparator could not hash array cells), one row
    per (src, pred), count matching."""
    edges = _edges(
        spark,
        [
            ("a", "p", "z"),
            ("a", "p", "m"),
            ("a", "p", "b"),
            ("a", "q", "x"),
            ("b", "p", "a"),
        ],
    )
    rows = {
        (r["src"], r["pred"]): (r["neighbors"], r["n_neighbors"], r["overflow"])
        for r in P.adjacency(edges).collect()
    }
    assert rows == {
        ("a", "p"): ("b,m,z", 3, False),
        ("a", "q"): ("x", 1, False),
        ("b", "p"): ("a", 1, False),
    }
    # scalar string type, never array — the comparator contract
    schema = dict(P.adjacency(edges).dtypes)
    assert schema["neighbors"] == "string"


def test_adjacency_hub_key_is_bounded(spark):
    """A hub exceeding max_neighbors emits the FIRST K sorted
    neighbors, the EXACT total count, and overflow=true — no
    aggregation buffer ever holds the full neighbor set (the round-3
    verdict's hub-key scale fix)."""
    hub = [("hub", "p", f"d{i:03d}") for i in range(10)]
    edges = _edges(spark, hub + [("small", "p", "x")])
    rows = {
        (r["src"], r["pred"]): (r["neighbors"], r["n_neighbors"], r["overflow"])
        for r in P.adjacency(edges, max_neighbors=4).collect()
    }
    assert rows[("hub", "p")] == ("d000,d001,d002,d003", 10, True)
    assert rows[("small", "p")] == ("x", 1, False)
    # one shuffle: the top-K groupBy reuses the ranking window's
    # exchange (its keys are a superset of the partition keys)
    plan = P.adjacency(edges, max_neighbors=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_reachability_closure_and_guard(spark):
    # chain 0->1->...->9: closure has 10*9/2 = 45 pairs
    chain = _edges(
        spark, [(f"n{i}", "feeds", f"n{i + 1}") for i in range(9)]
    )
    out = P.reachability(chain)
    assert out.count() == 45
    # same chain with a tight cap must raise BEFORE materializing the
    # full closure (the dense-pred guard, like dedup's max_bucket)
    with pytest.raises(RuntimeError, match="max_pairs"):
        P.reachability(chain, max_pairs=20)
    # cap below even the base edge set raises before iterating
    with pytest.raises(RuntimeError, match="max_pairs"):
        P.reachability(chain, max_pairs=5)


def test_results_writeback_roundtrip(spark):
    """Reverse converter: results rows become SvVoltage node rows
    (magnitude + phase) that union cleanly into the canonical store's
    long format — the DPsimToCIMpy write-back direction."""
    import math

    results = spark.createDataFrame(
        [("a", 3.0, 4.0), ("b", 1.0, 0.0)],
        "entity_id string, v_re double, v_im double",
    )
    rows = {
        (r["entity_id"], r["attr"]): (r["num_value"], r["profile"])
        for r in P.results_to_nodes(results).collect()
    }
    assert rows[("a", "sv_v")] == (5.0, "sv")
    assert rows[("a", "sv_angle")] == (round(math.atan2(4.0, 3.0), 4), "sv")
    assert rows[("b", "sv_v")] == (1.0, "sv")
    assert rows[("b", "sv_angle")] == (0.0, "sv")
    # unions into the node store shape (entity_id, attr, value-ish, profile)
    assert set(P.results_to_nodes(results).columns) == {
        "entity_id", "attr", "num_value", "profile"
    }


def test_reachability_cycle_terminates(spark):
    cyc = _edges(
        spark,
        [("a", "feeds", "b"), ("b", "feeds", "c"), ("c", "feeds", "a")],
    )
    rows = {
        (r["src"], r["dst"]) for r in P.reachability(cyc).collect()
    }
    # every vertex reaches every vertex (including itself via the cycle)
    assert rows == {(s, d) for s in "abc" for d in "abc"}


def test_pagerank_fixed_point_hand_check(spark):
    """One iteration on a 3-node graph, every value hand-derived:
    a->b, a->c, b->a; c dangles. SCALE=1e12, n=3, r0=333333333333.
    contrib(b)=contrib(c)=r0//2=166666666666; contrib(a)=r0;
    dang=r0; dang//n=111111111111; base=3e12//(20*3)=50000000000.
    a = base + (17*(333333333333+111111111111))//20 = 427777777777
    b = c = base + (17*(166666666666+111111111111))//20 = 286111111110
    """
    e = _edges(
        spark,
        [("a", "p", "b"), ("a", "q", "c"), ("b", "p", "a")],
    )
    rows = {
        r["entity_id"]: r["rank_fp"]
        for r in P.pagerank(e, iters=1).collect()
    }
    assert rows == {
        "a": 427777777777,
        "b": 286111111110,
        "c": 286111111110,
    }
    # duplicate predicates collapse: adding a second a->b edge under
    # another pred must change nothing
    e2 = _edges(
        spark,
        [("a", "p", "b"), ("a", "z", "b"), ("a", "q", "c"), ("b", "p", "a")],
    )
    rows2 = {
        r["entity_id"]: r["rank_fp"]
        for r in P.pagerank(e2, iters=1).collect()
    }
    assert rows2 == rows


def test_pagerank_mass_conservation(spark):
    """Across iterations the total fixed-point mass stays within
    floor-loss distance of SCALE (each of the n node updates loses
    <1 unit at each of 3 divisions, plus the per-edge contribution
    floors) — a cheap invariant that catches sign/joint errors."""
    e = _edges(
        spark,
        [
            ("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
            ("d", "p", "a"), ("a", "p", "c"), ("e", "p", "a"),
        ],
    )
    out = P.pagerank(e, iters=4).collect()
    total = sum(r["rank_fp"] for r in out)
    assert 10**12 * 0.999 < total <= 10**12
    # dangling-free strongly-connected-ish graph: every rank positive
    assert all(r["rank_fp"] > 0 for r in out)


def test_triangle_stats_k4_plus_tail(spark):
    """K4 (every node: 3 triangles, clustering 1.0) with a pendant
    path: the path node has degree 2 but closes no triangle
    (clustering 0.0), the pendant has degree 1 (defined 0.0)."""
    k4 = [
        ("a", "p", "b"), ("a", "p", "c"), ("a", "p", "d"),
        ("b", "p", "c"), ("b", "p", "d"), ("c", "p", "d"),
    ]
    tail = [("d", "p", "e"), ("e", "p", "f")]
    out = {
        r["entity_id"]: r
        for r in P.triangle_stats(_edges(spark, k4 + tail)).collect()
    }
    for v in "abc":
        assert (out[v]["degree"], out[v]["n_triangles"]) == (3, 3)
        assert out[v]["clustering"] == 1.0
    assert (out["d"]["degree"], out["d"]["n_triangles"]) == (4, 3)
    assert out["d"]["clustering"] == 0.5
    assert (out["e"]["degree"], out["e"]["n_triangles"], out["e"]["clustering"]) == (2, 0, 0.0)
    assert (out["f"]["degree"], out["f"]["n_triangles"], out["f"]["clustering"]) == (1, 0, 0.0)


def test_triangle_stats_direction_and_pred_invariant(spark):
    """Triangles live on the UNDIRECTED simple graph: reversed edges,
    duplicate predicates and self-loops change nothing."""
    base = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")]
    noisy = base + [
        ("b", "q", "a"), ("a", "z", "b"), ("c", "p", "c"),
    ]
    clean = {tuple(r) for r in P.triangle_stats(_edges(spark, base)).collect()}
    noised = {tuple(r) for r in P.triangle_stats(_edges(spark, noisy)).collect()}
    assert clean == noised
    assert all(r[2] == 1 for r in clean)  # one triangle each


def _trip(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, subj string, pred string, obj string, obj_kind string"
    )


def _idmap(spark, ids):
    return spark.createDataFrame(
        [(i, i) for i in ids], "entity_id string, canonical_id string"
    )


def test_cooccurrence_pmi_hand_values(spark):
    """Closed-form PMI: A,B together in 2 of 3 convs with c_A=3,
    c_B=2 → PMI = ln(2·3/(3·2)) = exactly 0; A,C co-occur once →
    pruned at min_convs=2, present at min_convs=1 with
    PMI = ln(1·3/(3·1)) = 0."""
    t = _trip(spark, [
        ("c1", "A", "rdf_type", "T0", "type"),
        ("c1", "B", "rdf_type", "T0", "type"),
        ("c2", "A", "rdf_type", "T0", "type"),
        ("c2", "B", "rdf_type", "T0", "type"),
        ("c3", "A", "rdf_type", "T0", "type"),
        ("c3", "C", "rdf_type", "T0", "type"),
    ])
    cmap = _idmap(spark, ["A", "B", "C"])
    out = {(r["ent_a"], r["ent_b"]): r
           for r in P.cooccurrence_pmi(t, cmap).collect()}
    assert set(out) == {("A", "B")}
    assert out[("A", "B")]["n_convs"] == 2 and out[("A", "B")]["pmi"] == 0.0
    out1 = {(r["ent_a"], r["ent_b"]): r
            for r in P.cooccurrence_pmi(t, cmap, min_convs=1).collect()}
    assert set(out1) == {("A", "B"), ("A", "C")}
    assert out1[("A", "C")]["pmi"] == 0.0


def test_cooccurrence_conv_distinct_and_canonicalized(spark):
    """Repetition inside one conversation never inflates counts, and
    mentions resolve through the canonical map (B aliases to A →
    no self-pair, the co-occurrence collapses)."""
    t = _trip(spark, [
        ("c1", "A", "p_int", "1", "literal"),
        ("c1", "A", "p_int", "2", "literal"),
        ("c1", "A", "connects_to", "B", "ref"),
        ("c2", "A", "rdf_type", "T0", "type"),
        ("c2", "B", "rdf_type", "T0", "type"),
    ])
    # B canonicalizes to A: every pair is (A, A) → excluded by a < b
    cmap = spark.createDataFrame(
        [("A", "A"), ("B", "A")], "entity_id string, canonical_id string"
    )
    assert P.cooccurrence_pmi(t, cmap, min_convs=1).count() == 0
    # identity map: the pair counts each conversation once
    out = {(r["ent_a"], r["ent_b"]): r["n_convs"]
           for r in P.cooccurrence_pmi(t, _idmap(spark, ["A", "B"]), min_convs=1).collect()}
    assert out == {("A", "B"): 2}


def test_cooccurrence_dangling_refs_drop(spark):
    """Objects not in the canonical map (quarantined refs) are not
    mentions — the X ref neither pairs nor counts toward N."""
    t = _trip(spark, [
        ("c1", "A", "connects_to", "X9", "ref"),
        ("c1", "B", "rdf_type", "T0", "type"),
    ])
    out = P.cooccurrence_pmi(t, _idmap(spark, ["A", "B"]), min_convs=1)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    # N=1, c_A=c_B=1, c_ab=1 → PMI = ln(1) = 0
    assert (r["ent_a"], r["ent_b"], r["n_convs"], r["pmi"]) == ("A", "B", 1, 0.0)


def test_lpa_synchronous_star_swap(spark):
    """Synchronous semantics pinned: in a star a-center with leaves
    b,c,d, ALL nodes update from round-0 labels simultaneously — the
    center adopts the min leaf label while the leaves adopt the
    center's old label (an async sweep would let later nodes see new
    labels)."""
    edges = _edges(spark, [("z", "p", x) for x in ["b", "c", "d"]])
    out = {r["node"]: r["community"]
           for r in P.lpa_communities(edges, iters=1).collect()}
    assert out == {"z": "b", "b": "z", "c": "z", "d": "z"}


def test_lpa_plurality_and_tie_break(spark):
    """A node with neighbor labels {x:2, y:2, w:1} takes the MIN of
    the tied plurality labels, not the overall min neighbor."""
    dup = _edges(spark, [
        ("n", "p", "x"), ("n", "q", "x"),
        ("n", "p", "y"), ("n", "q", "y"),
        ("n", "p", "a"),
    ])
    out = {r["node"]: r["community"]
           for r in P.lpa_communities(dup, iters=1).collect()}
    # distinct (a,b) und edges: x,y,a each count 1 → min label 'a'
    assert out["n"] == "a"
    # two communities of equal pull → the min tied label wins
    tie = _edges(spark, [("n", "p", "x"), ("n", "p", "y")])
    out2 = {r["node"]: r["community"]
            for r in P.lpa_communities(tie, iters=1).collect()}
    assert out2["n"] == "x"


def test_lpa_two_cliques_converge_and_isolated_keeps_label(spark):
    """Two triangles bridged by one edge keep two communities after
    convergence-depth rounds; a self-loop-only node keeps itself."""
    tri1 = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")]
    tri2 = [("x", "p", "y"), ("y", "p", "z"), ("z", "p", "x")]
    bridge = [("c", "p", "x")]
    loop = [("q", "p", "q")]
    out = {r["node"]: r["community"]
           for r in P.lpa_communities(
               _edges(spark, tri1 + tri2 + bridge + loop), iters=4
           ).collect()}
    assert out["q"] == "q"
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["x"] == out["y"] == out["z"]
    assert out["x"] != out["a"]


def test_negative_samples_contract(spark):
    """k negatives per positive minus filtered ones; no negative is a
    true edge, the source, or the original dst; deterministic across
    runs."""
    edges = _edges(spark, [
        ("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"), ("c", "p", "d"),
    ])
    out = P.negative_samples(edges, k=3).collect()
    assert 0 < len(out) <= 4 * 3
    truth = {("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"), ("c", "p", "d")}
    for r in out:
        assert (r["src"], r["pred"], r["neg_dst"]) not in truth
        assert r["neg_dst"] != r["src"] and r["neg_dst"] != r["dst"]
        assert 0 <= r["j"] < 3
    again = P.negative_samples(edges, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_neighbor_sample_bounded_fanout_and_salt(spark):
    """A hub with 10 out-neighbors contributes at most fan1 sampled
    hop-1 nodes; per (root, n1) at most fan2 second hops; the root
    never appears as its own 2-hop; re-salting changes the draw."""
    hub = [("h", "p", f"x{i}") for i in range(10)]
    second = [(f"x{i}", "p", f"y{j}") for i in range(10) for j in range(5)]
    back = [("x0", "p", "h")]
    edges = _edges(spark, hub + second + back)
    out = P.neighbor_sample(edges, fan1=3, fan2=2).collect()
    hrows = [r for r in out if r["root"] == "h"]
    assert len({r["n1"] for r in hrows}) <= 3
    from collections import Counter
    per_n1 = Counter(r["n1"] for r in hrows)
    assert all(v <= 2 for v in per_n1.values())
    assert all(r["n2"] != "h" for r in hrows)
    alt = P.neighbor_sample(edges, fan1=3, fan2=2, salt="other").collect()
    assert {tuple(r) for r in alt} != {tuple(r) for r in out}


def test_kcore_cascade_peels_chain(spark):
    """K4 clique + pendant chain x-y-z at k=2: z (deg 1) peels in
    round 1, which drops y to deg 1 (peels round 2), which drops x
    to its clique degree — the cascade a single-pass degree filter
    misses. The clique survives with degree 3 (+1 for a's chain
    edge... the chain hangs off a, whose in-core degree ends at 3)."""
    k4 = [("a", "p", "b"), ("a", "p", "c"), ("a", "p", "d"),
          ("b", "p", "c"), ("b", "p", "d"), ("c", "p", "d")]
    chain = [("a", "p", "x"), ("x", "p", "y"), ("y", "p", "z")]
    edges = _edges(spark, k4 + chain)
    # one round: z (deg 1) peels; y survives the peel but its
    # post-restriction degree (only x-y left) fails the output's
    # in-core degree>=k filter, so only x of the chain reports
    one = {r["node"] for r in P.kcore(edges, k=2, rounds=1).collect()}
    assert one == {"a", "b", "c", "d", "x"}
    # enough rounds: the whole chain cascades away; clique remains
    out = {r["node"]: r["degree"]
           for r in P.kcore(edges, k=2, rounds=4).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}
    # at k above the clique degree everything peels
    assert P.kcore(edges, k=4, rounds=4).count() == 0


def test_landmark_distances_bfs_levels(spark):
    """Path graph a-b-c-d-e with landmarks = 2 smallest ids: exact
    hop distances up to the round bound, absent beyond it."""
    path = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("d", "p", "e")]
    out = {(r["node"], r["landmark"]): r["dist"]
           for r in P.landmark_distances(
               _edges(spark, path), n_landmarks=2, max_rounds=2
           ).collect()}
    assert out[("a", "a")] == 0 and out[("b", "a")] == 1 and out[("c", "a")] == 2
    assert ("d", "a") not in out            # beyond the round bound
    assert out[("a", "b")] == 1 and out[("d", "b")] == 2
    # undirected: distance symmetric through either endpoint
    assert out[("c", "b")] == 1


def test_linkpred_common_neighbors_and_hub_cap(spark):
    """Square a-b-c-d-a: opposite corners share exactly 2 neighbors,
    AA = 2/ln(2); adjacent corners share none. A hub center above the
    cap contributes no wedges."""
    import math

    square = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("d", "p", "a")]
    out = {(r["node_a"], r["node_b"]): r
           for r in P.linkpred_features(_edges(spark, square)).collect()}
    assert set(out) == {("a", "c"), ("b", "d")}
    r = out[("a", "c")]
    assert r["common_neighbors"] == 2 and not r["is_edge"]
    assert r["aa_score"] == round(2 * round(1e9 / math.log(2)) / 1e9, 6)
    # hub: one center connected to 10 leaves, cap below its degree →
    # none of the 45 leaf pairs appear
    hub = [("h", "p", f"l{i}") for i in range(10)]
    assert P.linkpred_features(
        _edges(spark, hub), max_center_degree=5
    ).count() == 0
    assert P.linkpred_features(
        _edges(spark, hub), max_center_degree=20
    ).count() == 45


def test_degree_distribution_histogram(spark):
    # star: hub degree 3, leaves degree 1 -> two histogram rows
    edges = _edges(spark, [("h", "p", x) for x in ["a", "b", "c"]])
    out = {r["degree"]: (r["n_nodes"], r["pct"])
           for r in P.degree_distribution(edges).collect()}
    assert out == {3: (1, 0.25), 1: (3, 0.75)}
