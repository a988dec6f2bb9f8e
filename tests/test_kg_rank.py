"""Graph ranking/sampling wave (round 7 continuation): personalized
PageRank (plus, as they land, walk-corpus generation, WL refinement
and link-prediction eval). Driver-style oracle parity at SF_TINY
(tail entries until their first driver rows) plus hand-built
invariants: teleport locality (mass reaches only the seed's forward
cone), seed-uniform restart vs the global recurrence, and the
fail-loud empty-seed contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import cimpy_spark.pipeline as P
from tests.conftest import SF_TINY
from tools.compare import compare

NEW_GATES = ["kg_ppr", "kg_walks", "kg_linkpred_eval", "kg_wl_colors"]


def test_kg_rank_oracle_parity(spark):
    assert compare(spark, SF_TINY, NEW_GATES)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in pairs], "src string, pred string, dst string"
    )


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def test_ppr_mass_stays_in_seed_forward_cone(spark):
    # a -> b -> c and the disconnected d -> e: seeding {a} must leave
    # every node outside a's forward cone at EXACTLY rank 0 — the
    # teleport never sprays mass graph-wide (the global-pagerank
    # behavior PPR exists to avoid)
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    out = {
        r["entity_id"]: r["rank_fp"]
        for r in P.ppr(edges, _seeds(spark, ["a"]), iters=3).collect()
    }
    assert out["a"] > 0 and out["b"] > 0 and out["c"] > 0
    assert out["d"] == 0 and out["e"] == 0


def test_ppr_seed_ranks_dominate_far_nodes(spark):
    # path a -> b -> c -> f: with restart, rank decays with distance
    # from the seed, so the seed outranks its 1-hop which outranks
    # the 3-hop tail
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "f")])
    out = {
        r["entity_id"]: r["rank_fp"]
        for r in P.ppr(edges, _seeds(spark, ["a"]), iters=4).collect()
    }
    assert out["a"] > out["b"] > out["c"] > out["f"]


def test_ppr_dangling_mass_returns_to_seeds(spark):
    # a -> b with b dangling: b's mass must flow back to the seed a
    # each round, not vanish — total fixed-point mass stays within
    # floor-loss of scale
    scale = 10**12
    edges = _edges(spark, [("a", "b")])
    rows = P.ppr(edges, _seeds(spark, ["a"]), iters=5, scale=scale).collect()
    total = sum(r["rank_fp"] for r in rows)
    # each of the 5 rounds loses <= a few units to floor division per
    # term; anything below 99.9% of scale means mass actually leaked
    assert total <= scale
    assert total >= int(scale * 0.999)
    out = {r["entity_id"]: r["rank_fp"] for r in rows}
    # the 2-node chain oscillates with period 2 (damped 0.7225^k), so
    # no ordering claim at finite iters — just that both hold mass
    assert out["a"] > 0 and out["b"] > 0


def test_ppr_matches_python_reference_on_hand_graph(spark):
    # diamond with a side sink: a->b, a->c, b->d, c->d, d->a, b->e
    # (e dangling); integer recurrence reimplemented independently
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
             ("d", "a"), ("b", "e")]
    seeds = ["a", "c"]
    scale = 10**9
    iters = 4
    nodes = sorted({x for p in pairs for x in p})
    outn = {}
    for s, d in pairs:
        outn.setdefault(s, []).append(d)
    ns = len([s for s in seeds if s in nodes])
    rank = {
        v: (scale // ns if v in seeds else 0) for v in nodes
    }
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        dang = 0
        for v in nodes:
            if v in outn:
                for d in outn[v]:
                    contrib[d] += rank[v] // len(outn[v])
            else:
                dang += rank[v]
        rank = {
            v: (
                (3 * scale // (20 * ns) if v in seeds else 0)
                + (17 * (contrib[v] + (dang // ns if v in seeds else 0)))
                // 20
            )
            for v in nodes
        }
    got = {
        r["entity_id"]: r["rank_fp"]
        for r in P.ppr(
            _edges(spark, pairs), _seeds(spark, seeds),
            iters=iters, scale=scale,
        ).collect()
    }
    assert got == rank


def test_ppr_empty_effective_seed_fails_loud(spark):
    edges = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="no seed id"):
        P.ppr(edges, _seeds(spark, ["zzz-not-a-node"]), iters=1)


def test_ppr_is_seed_flag_and_seed_restriction(spark):
    # a seed id outside the graph is dropped from ns: seeding
    # {a, ghost} must equal seeding {a} exactly
    edges = _edges(spark, [("a", "b"), ("b", "a")])
    one = P.ppr(edges, _seeds(spark, ["a"]), iters=3)
    both = P.ppr(edges, _seeds(spark, ["a", "ghost"]), iters=3)
    assert one.exceptAll(both).count() == 0
    assert both.exceptAll(one).count() == 0
    flags = {r["entity_id"]: r["is_seed"] for r in one.collect()}
    assert flags == {"a": 1, "b": 0}


_walk_edges = _edges


def test_walks_are_valid_paths(spark):
    # every consecutive (step, step+1) pair of every walk must be an
    # actual edge — the corpus is a set of real traversals
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]
    walks = P.walk_corpus(_walk_edges(spark, pairs), walks_per_node=2,
                          length=3)
    rows = walks.collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    eset = set(pairs)
    assert by_walk
    for wid, steps in by_walk.items():
        assert steps[0] == wid.split("#")[0]
        for s in range(1, max(steps) + 1):
            assert s in steps, f"{wid} skipped step {s}"
            assert (steps[s - 1], steps[s]) in eset


def test_walks_truncate_at_sinks(spark):
    # path a -> b -> c with length=5: the walk runs out of edges at c
    # and stops — steps 0..2 only, no padding rows
    walks = P.walk_corpus(
        _walk_edges(spark, [("a", "b"), ("b", "c")]),
        walks_per_node=1, length=5,
    )
    got = {(r["walk_id"], r["step"]): r["node"] for r in walks.collect()}
    assert got == {
        ("a#0", 0): "a", ("a#0", 1): "b", ("a#0", 2): "c",
        ("b#0", 0): "b", ("b#0", 1): "c",
        ("c#0", 0): "c",
    }


def test_walks_fan_out_and_determinism(spark):
    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")]
    w1 = P.walk_corpus(_walk_edges(spark, pairs), walks_per_node=3,
                       length=2)
    assert w1.select("walk_id").distinct().count() == 3 * 3
    w2 = P.walk_corpus(_walk_edges(spark, pairs), walks_per_node=3,
                       length=2)
    assert w1.exceptAll(w2).count() == 0
    assert w2.exceptAll(w1).count() == 0


def test_walks_step_keyed_rank_gives_diversity(spark):
    # star center with 8 out-neighbors, 8 walks from the center: the
    # md5 rank is keyed on (walk_id, step), so different walks pick
    # different neighbors — a static per-node rank would send all 8
    # through the same neighbor, collapsing the corpus
    pairs = [("hub", f"n{i}") for i in range(8)]
    walks = P.walk_corpus(_walk_edges(spark, pairs), walks_per_node=8,
                          length=1)
    picked = {
        r["node"]
        for r in walks.filter(
            (F.col("step") == 1)
            & F.col("walk_id").startswith("hub#")
        ).collect()
    }
    assert len(picked) >= 2


def test_linkpred_eval_matches_python_reference(spark):
    # triangle + tail: CN scores and ranks recomputed independently
    # in Python from the SAME negative draw (negative_samples is
    # already gated; the eval layer is what's under test here)
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
             ("d", "e"), ("b", "e")]
    edges = _edges(spark, pairs)
    k = 3
    negs = [
        (r["src"], r["pred"], r["dst"], r["neg_dst"])
        for r in P.negative_samples(edges, k=k).collect()
    ]
    und = set()
    for a, b in pairs:
        und.add((a, b))
        und.add((b, a))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)

    def cn(x, y):
        return len(nbrs.get(x, set()) & nbrs.get(y, set()))

    ranks = []
    for s, d in pairs:
        mine = [n for n in negs if n[0] == s and n[2] == d]
        cp = cn(s, d)
        beat = sum(
            1
            for (_, _, _, nd) in mine
            if cn(s, nd) > cp or (cn(s, nd) == cp and nd < d)
        )
        ranks.append(1 + beat)
    exp_n = len(pairs)
    exp_sum = sum(10**6 // r for r in ranks)
    got = P.linkpred_eval(edges, k=k).collect()
    assert len(got) == 1 and got[0]["pred"] == "p"
    assert got[0]["n_pos"] == exp_n
    assert got[0]["sum_rr_micro"] == exp_sum
    assert got[0]["mrr_micro"] == exp_sum // exp_n
    assert got[0]["hits1"] == sum(1 for r in ranks if r <= 1)
    assert got[0]["hits3"] == sum(1 for r in ranks if r <= 3)


def test_linkpred_eval_zero_negatives_ranks_first(spark):
    # a 2-node graph: every corruption draw is filtered (the only
    # other entity is the true dst or the src itself), so the
    # positive has no competitors — rank 1, perfect MRR
    got = P.linkpred_eval(_edges(spark, [("a", "b")]), k=4).collect()
    assert len(got) == 1
    assert got[0]["n_pos"] == 1
    assert got[0]["mrr_micro"] == 10**6
    assert got[0]["hits1"] == 1


def _typed_ents(spark, pairs):
    return spark.createDataFrame(
        list(pairs.items()), "entity_id string, type string"
    )


def test_wl_separates_isomorphic_positions_only(spark):
    # two disjoint triangles with identical typing are structurally
    # indistinguishable — every corresponding position must share a
    # color (n_class 2), and the pendant node on one triangle must
    # break the symmetry exactly where it attaches
    tri1 = [("a1", "b1"), ("b1", "c1"), ("c1", "a1")]
    tri2 = [("a2", "b2"), ("b2", "c2"), ("c2", "a2")]
    types = {x: "T" for t in (tri1, tri2) for e in t for x in e}
    out = P.wl_colors(
        _edges(spark, tri1 + tri2), _typed_ents(spark, types), rounds=3
    ).collect()
    colors = {r["entity_id"]: r["wl_color"] for r in out}
    # positions are symmetric within AND across the triangles: one
    # color class of size 6
    assert len({colors[x] for x in colors}) == 1
    assert all(r["n_class"] == 6 for r in out)


def test_wl_pendant_breaks_symmetry(spark):
    tri1 = [("a1", "b1"), ("b1", "c1"), ("c1", "a1")]
    tri2 = [("a2", "b2"), ("b2", "c2"), ("c2", "a2"), ("a2", "p")]
    types = {x: "T" for t in (tri1, tri2) for e in t for x in e}
    out = P.wl_colors(
        _edges(spark, tri1 + tri2), _typed_ents(spark, types), rounds=3
    ).collect()
    colors = {r["entity_id"]: r["wl_color"] for r in out}
    # the pendant-bearing a2 differs from every tri1 node, and the
    # pendant p is its own class
    assert colors["a2"] not in {colors["a1"], colors["b1"], colors["c1"]}
    assert sum(1 for c in colors.values() if c == colors["p"]) == 1


def test_wl_multiset_counts_matter(spark):
    # u has ONE T-typed out-neighbor, v has TWO: a set-based refine
    # would merge them, the multiset must not
    pairs = [("u", "x1"), ("v", "y1"), ("v", "y2")]
    types = {"u": "S", "v": "S", "x1": "T", "y1": "T", "y2": "T"}
    out = P.wl_colors(
        _edges(spark, pairs), _typed_ents(spark, types), rounds=1
    ).collect()
    colors = {r["entity_id"]: r["wl_color"] for r in out}
    assert colors["u"] != colors["v"]


def test_wl_rounds_refine_the_partition(spark):
    # WL is a refinement: same color at round r+1 implies same color
    # at round r (classes split, never merge)
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
             ("a", "c"), ("e", "a")]
    types = {x: "T" for e in pairs for x in e}
    ents = _typed_ents(spark, types)
    edges = _edges(spark, pairs)
    c1 = {r["entity_id"]: r["wl_color"]
          for r in P.wl_colors(edges, ents, rounds=1).collect()}
    c2 = {r["entity_id"]: r["wl_color"]
          for r in P.wl_colors(edges, ents, rounds=2).collect()}
    for x in c1:
        for y in c1:
            if c2[x] == c2[y]:
                assert c1[x] == c1[y]
