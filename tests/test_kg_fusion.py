"""KG fusion/quality wave (late round 7): majority-vote fact fusion,
schema induction, SCD2 attribute history, feature-Jaccard entity
matching. Each op gets (a) the driver-style oracle parity check at
SF_TINY — the same row-count + order-insensitive value-hash comparison
the driver runs — because these entries sit in the rotation tail until
their first driver rows, and (b) hand-built invariant tests pinning the
semantics the fixture alone can't isolate (tie-breaks, run collapsing,
prefix-filter completeness edge)."""

from __future__ import annotations

from pyspark.sql import functions as F

import cimpy_spark.pipeline as P
from tests.conftest import SF_TINY
from tools.compare import compare

NEW_GATES = [
    "kg_fact_fusion",
    "kg_schema_induction",
    "kg_attr_history",
    "kg_entity_match",
]


def test_kg_fusion_oracle_parity(spark):
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


def test_fact_fusion_majority_and_tiebreak(spark):
    # E1.p: 'b' asserted twice beats 'a' once; E2.q: one-each tie →
    # lexicographically smallest value wins deterministically
    rows = [
        ("E1", "p", "a", "literal", "c1", 0, 0, "user"),
        ("E1", "p", "b", "literal", "c1", 1, 0, "user"),
        ("E1", "p", "b", "literal", "c2", 0, 0, "user"),
        ("E2", "q", "z", "literal", "c1", 0, 1, "user"),
        ("E2", "q", "y", "literal", "c1", 2, 0, "user"),
    ]
    out = P.fact_fusion(
        _triples(spark, rows), _cmap_identity(spark, ["E1", "E2"])
    ).collect()
    by_key = {(r.entity_id, r.attr): r for r in out}
    e1 = by_key[("E1", "p")]
    assert (e1.fused_value, e1.support, e1.n_assertions, e1.n_values) == (
        "b", 2, 3, 2,
    )
    assert e1.has_conflict
    e2 = by_key[("E2", "q")]
    assert (e2.fused_value, e2.support) == ("y", 1)
    assert e2.has_conflict


def test_fact_fusion_merges_aliases_before_voting(spark):
    # same value asserted under two aliases of one canonical entity
    # accumulates support across the alias ids
    rows = [
        ("E1", "p", "v", "literal", "c1", 0, 0, "user"),
        ("E9", "p", "v", "literal", "c1", 1, 0, "user"),
        ("E9", "p", "w", "literal", "c1", 2, 0, "user"),
    ]
    cmap = spark.createDataFrame(
        [("E1", "E1"), ("E9", "E1")], "entity_id string, canonical_id string"
    )
    out = P.fact_fusion(_triples(spark, rows), cmap).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.entity_id, r.fused_value, r.support, r.n_assertions) == (
        "E1", "v", 2, 3,
    )


def test_schema_induction_signatures(spark):
    # 'rel' has 2 T0->T1 rows + 1 dangling → dominant (T0, T1) at 2/3;
    # literal values classify by lexical type
    rows = [
        ("E1", "rel", "E2", "ref", "c1", 0, 0, "user"),
        ("E1", "rel", "E2", "ref", "c1", 1, 0, "user"),
        ("E1", "rel", "X9", "ref", "c1", 2, 0, "user"),
        ("E1", "p", "42", "literal", "c1", 3, 0, "user"),
        ("E1", "p", "true", "literal", "c1", 4, 0, "user"),
    ]
    ents = spark.createDataFrame(
        [("E1", "T0"), ("E2", "T1")], "entity_id string, type string"
    )
    out = {r.pred: r for r in P.schema_induction(
        _triples(spark, rows), ents
    ).collect()}
    rel = out["rel"]
    assert (rel.dom_domain, rel.dom_range, rel.n_dom, rel.n_total) == (
        "T0", "T1", 2, 3,
    )
    assert rel.n_signatures == 2 and abs(rel.conformance - 0.666667) < 1e-9
    p = out["p"]
    # one 'int' + one 'bool' signature, tie at 1 → smallest (domain,
    # range) pair wins: ('T0', 'bool')
    assert (p.dom_range, p.n_signatures) == ("bool", 2)


def test_attr_history_runs(spark):
    # value sequence a, a, b, a over one attr → 3 versions with run
    # lengths 2, 1, 1 and correct first-assertion provenance
    rows = [
        ("E1", "p", "a", "literal", "c1", 0, 0, "user"),
        ("E1", "p", "a", "literal", "c1", 1, 0, "user"),
        ("E1", "p", "b", "literal", "c1", 2, 0, "user"),
        ("E1", "p", "a", "literal", "c2", 0, 0, "user"),
    ]
    out = sorted(
        P.attr_history(
            _triples(spark, rows), _cmap_identity(spark, ["E1"])
        ).collect(),
        key=lambda r: r.version,
    )
    assert [(r.version, r.value, r.n_assertions) for r in out] == [
        (1, "a", 2), (2, "b", 1), (3, "a", 1),
    ]
    assert (out[0].from_conv_id, out[0].from_turn_idx) == ("c1", 0)
    assert (out[2].from_conv_id, out[2].from_turn_idx) == ("c2", 0)
    # consecutive versions always differ in value
    for prev, cur in zip(out, out[1:]):
        assert prev.value != cur.value


def test_attr_history_version_density(spark, sf_dir=SF_TINY):
    # versions are dense 1..max per (entity, attr) and run lengths sum
    # to the assertion count — checked on the real fixture
    import __spark_entry__ as entry_mod

    hist = entry_mod.queries()["kg_attr_history"](spark, sf_dir)
    agg = hist.groupBy("entity_id", "attr").agg(
        F.min("version").alias("mn"),
        F.max("version").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = agg.filter((F.col("mn") != 1) | (F.col("mx") != F.col("n"))).count()
    assert bad == 0


def test_entity_match_prefix_filter_complete(spark):
    # adversarial small case: identical sets, disjoint sets, and a
    # borderline pair exactly AT the rational threshold (J = 2/5 needs
    # den*inter >= num*union: 5*2 >= 2*5 with inter=2, union=5 ✓)
    feats = {
        "A": ["f1", "f2", "f3"],
        "B": ["f1", "f2", "f3"],          # J(A,B)=1
        "C": ["f1", "f2", "x1", "x2"],    # J(A,C)=2/5 — exactly t
        "D": ["z1", "z2"],                # disjoint
    }
    rows = []
    for i, (eid, fs) in enumerate(sorted(feats.items())):
        for j, f in enumerate(fs):
            # one literal assertion per feature token
            rows.append((eid, f, "1", "literal", "c1", i, j, "user"))
    triples = _triples(spark, rows)
    cmap = _cmap_identity(spark, sorted(feats))
    edges = spark.createDataFrame(
        [], "src string, pred string, dst string"
    )
    got = {
        (r.entity_a, r.entity_b): r.jaccard
        for r in P.entity_match(triples, cmap, edges, num=2, den=5).collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert got[("A", "B")] == 1.0
    assert abs(got[("A", "C")] - 0.4) < 1e-9


def test_entity_match_uses_edge_context(spark):
    # two entities with NO shared attributes match purely on shared
    # graph context (same out-edge and in-edge features)
    triples = _triples(
        spark,
        [
            ("A", "p", "1", "literal", "c1", 0, 0, "user"),
            ("B", "q", "2", "literal", "c1", 1, 0, "user"),
        ],
    )
    cmap = _cmap_identity(spark, ["A", "B", "H", "S"])
    edges = spark.createDataFrame(
        [
            ("A", "rel", "H"), ("B", "rel", "H"),
            ("S", "rel", "A"), ("S", "rel", "B"),
        ],
        "src string, pred string, dst string",
    )
    got = {
        (r.entity_a, r.entity_b)
        for r in P.entity_match(triples, cmap, edges, num=1, den=2).collect()
    }
    assert ("A", "B") in got


# --- round-7 continuation: FD discovery + type-modal imputation ---

QUALITY_GATES = ["kg_funcdeps", "kg_attr_impute"]


def test_kg_quality_oracle_parity(spark):
    assert compare(spark, SF_TINY, QUALITY_GATES)


def _nodes(spark, rows):
    return spark.createDataFrame(
        [(e, a, v, "user") for e, a, v in rows],
        "entity_id string, attr string, value string, profile string",
    )


def test_funcdeps_holds_and_violations(spark):
    # color determines code (bijective on this data); code does NOT
    # determine size (code c1 maps to sizes s1 and s2)
    rows = [
        ("e1", "color", "red"), ("e1", "code", "c1"), ("e1", "size", "s1"),
        ("e2", "color", "red"), ("e2", "code", "c1"), ("e2", "size", "s2"),
        ("e3", "color", "blue"), ("e3", "code", "c2"), ("e3", "size", "s1"),
    ]
    got = {
        (r["a1"], r["a2"]): r
        for r in P.funcdeps(_nodes(spark, rows)).collect()
    }
    assert got[("color", "code")]["fd_holds"] == 1
    assert got[("code", "color")]["fd_holds"] == 1
    cs = got[("code", "size")]
    assert cs["fd_holds"] == 0
    assert cs["n_violating_lhs"] == 1          # only c1 is ambiguous
    assert cs["n_lhs_values"] == 2
    assert cs["n_pairs"] == 3
    # FD direction is not symmetric: size -> code is also violated
    # (s1 maps to c1 and c2) — both directions reported independently
    assert got[("size", "code")]["fd_holds"] == 0


def test_funcdeps_skips_entities_missing_either_attr(spark):
    # e3 has only color: it contributes no (color, code) pair, so the
    # FD judgment rests on entities carrying BOTH attrs
    rows = [
        ("e1", "color", "red"), ("e1", "code", "c1"),
        ("e2", "color", "red"), ("e2", "code", "c1"),
        ("e3", "color", "red"),
    ]
    got = {
        (r["a1"], r["a2"]): r
        for r in P.funcdeps(_nodes(spark, rows)).collect()
    }
    assert got[("color", "code")]["n_pairs"] == 2
    assert got[("color", "code")]["fd_holds"] == 1


def _ident_cmap(spark, ids):
    return spark.createDataFrame(
        [(i, i) for i in ids], "entity_id string, canonical_id string"
    )


def _typed(spark, pairs):
    return spark.createDataFrame(
        pairs, "entity_id string, type string"
    )


def test_attr_impute_modal_value_and_threshold(spark):
    # type T: e1, e2 carry attr a = 'x'; e3 (same type) is missing a
    # -> imputed 'x' with support 2 of 2 holders under the strict 1/2
    # majority. attr b is split 1/1 -> NO value clears the strict
    # majority, nothing imputed for e3.b
    rows = [
        ("e1", "a", "x"), ("e2", "a", "x"),
        ("e1", "b", "p"), ("e2", "b", "q"),
    ]
    ents = _typed(spark, [("e1", "T"), ("e2", "T"), ("e3", "T")])
    cmap = _ident_cmap(spark, ["e1", "e2", "e3"])
    got = {
        (r["entity_id"], r["attr"]): r
        for r in P.attr_impute(
            _nodes(spark, rows), ents, cmap, num=1, den=2
        ).collect()
    }
    assert set(got) == {("e3", "a")}
    r = got[("e3", "a")]
    assert r["imputed_value"] == "x"
    assert r["support_n"] == 2 and r["n_typed"] == 2
    # with the threshold off (num=0), the split attr imputes its
    # lexicographically-smallest modal value — the documented tie rule
    got0 = {
        (r["entity_id"], r["attr"]): r["imputed_value"]
        for r in P.attr_impute(
            _nodes(spark, rows), ents, cmap, num=0, den=1
        ).collect()
    }
    assert got0[("e3", "b")] == "p"


def test_attr_impute_respects_type_boundaries_and_presence(spark):
    # e4 is type U: T's modal value never leaks to it; e1 already has
    # attr a so it is never imputed
    rows = [("e1", "a", "x"), ("e2", "a", "x")]
    ents = _typed(
        spark, [("e1", "T"), ("e2", "T"), ("e3", "T"), ("e4", "U")]
    )
    cmap = _ident_cmap(spark, ["e1", "e2", "e3", "e4"])
    got = {
        (r["entity_id"], r["attr"])
        for r in P.attr_impute(
            _nodes(spark, rows), ents, cmap, num=1, den=2
        ).collect()
    }
    assert got == {("e3", "a")}


def test_attr_impute_uses_canonical_identity(spark):
    # e2 is an alias of e1 (cmap maps both to e1): its type row rides
    # to the canonical id, and the canonical id is the imputation
    # subject — the alias itself never appears
    rows = [("e1", "a", "x"), ("e5", "a", "x")]
    ents = _typed(spark, [("e2", "T"), ("e5", "T"), ("e6", "T")])
    cmap = spark.createDataFrame(
        [("e2", "e1"), ("e5", "e5"), ("e6", "e6")],
        "entity_id string, canonical_id string",
    )
    got = {
        r["entity_id"]
        for r in P.attr_impute(
            _nodes(spark, rows), ents, cmap, num=1, den=2
        ).collect()
    }
    assert got == {"e6"}
