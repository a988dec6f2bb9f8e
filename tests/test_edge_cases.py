"""Hand-built semantic corner cases, pipeline vs pure-Python oracle
(reference corners: forward refs cimpy/cimimport.py:79-83, dedupe
:294-300, first-wins type :141 / last-wins setattr :255-273,
dangling :281-288, multi-mention turns :234-241)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cimpy_spark import pipeline as P
from cimpy_spark.operators.link import link_references
from cimpy_spark.oracle import run_oracle

ROWS = [
    # forward reference: E2 referenced before declared
    ("c1", 0, "user", "x «rel E1 feeds E2» y"),
    ("c1", 1, "user", "«decl E1 type:T1 p_int=5 p_bool=true p_enum=kind:Unit.V1»"),
    ("c1", 2, "tool", "«decl E2 type:T2 p_int=7 p_bool=false p_enum=kind:Unit.V0»"),
    # duplicate declaration, different attrs: first (conv,turn) wins
    # the TYPE; the attrs obey last-wins setattr order
    ("c0", 9, "user", "«decl E1 type:T9 p_int=99 p_bool=false p_enum=kind:Unit.V2»"),
    # self-reference
    ("c1", 3, "user", "«rel E2 controls E2»"),
    # repeated identical reference → dedupe
    ("c1", 4, "user", "«rel E1 feeds E2»"),
    ("c2", 0, "user", "«rel E1 feeds E2»"),
    # dangling
    ("c2", 1, "user", "«rel E1 feeds X1»"),
    ("c2", 2, "user", "«rel E2 feeds X1»"),
    # cross-role about-merge on aliased entity
    ("c2", 3, "assistant", "«about E3 q_str=sA q_int=4»"),
    ("c2", 4, "user", "«decl E3 type:T3 p_int=1 p_bool=true p_enum=kind:Unit.V0»"),
    ("c2", 5, "user", "«same E3 E1»"),
    # unknown pattern + no mention
    ("c3", 0, "user", "«unk z9»"),
    ("c3", 1, "user", "no mention here"),
    # TWO declarations in one turn (reference loops all child elements,
    # cimpy/cimimport.py:234-241) + an intra-turn ref between them
    (
        "c4",
        0,
        "user",
        "pair «decl E7 type:T1 p_int=1 p_bool=true p_enum=kind:Unit.V0» and "
        "«decl E8 type:T2 p_int=2 p_bool=false p_enum=kind:Unit.V1» then "
        "«rel E7 feeds E8»",
    ),
    # conflicting attr writes WITHIN one turn: later mention wins
    # (setattr order = mention order)
    ("c4", 1, "user", "«about E7 q_int=10» … «about E7 q_int=20»"),
    # conflicting attr across turns: the LAST turn's write wins
    # (reference's unconditional setattr, cimpy/cimimport.py:255-273)
    ("c4", 2, "user", "«about E8 q_int=30»"),
    ("c4", 3, "user", "«about E8 q_int=40»"),
]


def _df(spark):
    return spark.createDataFrame(
        [(c, t, r, x, None) for c, t, r, x in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )


def test_edge_cases_match_oracle(spark):
    t = _df(spark)
    oracle = run_oracle(
        [{"conv_id": c, "turn_idx": i, "text": x} for c, i, _, x in ROWS]
    )
    g = P.build_graph(t)

    # first declaration wins: E1 is T1 (c0 sorts before c1, so T9 wins!)
    ents = {r["entity_id"]: r["type"] for r in g.entities.collect()}
    assert ents == oracle.entities
    assert ents["E1"] == "T9"  # "c0" < "c1" in stable order

    edges = {(e["src"], e["pred"], e["dst"]) for e in g.edges.collect()}
    assert edges == oracle.edges
    assert ("E2", "controls", "E2") in edges  # self-ref kept
    assert sum(1 for e in edges if e == ("E1", "feeds", "E2")) == 1  # deduped

    q = {r["dst"]: r["n_refs"] for r in g.quarantine.collect()}
    assert q == oracle.quarantine == {"X1": 2}

    cmap = {r["entity_id"]: r["canonical_id"] for r in g.cmap.collect()}
    assert cmap == oracle.cmap
    assert cmap["E3"] == "E1"  # sameAs merge, min-id election

    nodes = {(n["entity_id"], n["attr"], n["value"]) for n in g.nodes.collect()}
    assert nodes == oracle.nodes
    # merged entity: q_str from E3's about lands on canonical E1
    assert ("E1", "q_str", "sA") in nodes
    # last-wins scalar merge (reference setattr order):
    # within one turn, the later mention wins …
    assert ("E7", "q_int", "20") in nodes
    # … across turns, the later turn wins …
    assert ("E8", "q_int", "40") in nodes
    # … and across the merged component (c0 decl p_int=99 → c1 decl
    # p_int=5 → c2 decl of aliased E3 p_int=1), the final write wins
    assert ("E1", "p_int", "1") in nodes
    # while the TYPE stays first-wins (first instantiation, c0's T9)
    assert ("E1", "rdf_type", "T9") in nodes
    # two decls in one turn both instantiate + intra-turn ref resolves
    assert ents["E7"] == "T1" and ents["E8"] == "T2"
    assert ("E7", "feeds", "E8") in edges


def test_salted_link_path_identical(spark):
    t = _df(spark)
    triples = P.build_graph(t).triples
    from cimpy_spark.operators.link import declared_entities

    entities = declared_entities(triples)
    e_b, q_b = link_references(triples, entities, broadcast_dict=True)
    e_s, q_s = link_references(triples, entities, broadcast_dict=False)
    assert e_b.exceptAll(e_s).count() == 0 and e_s.exceptAll(e_b).count() == 0
    assert {tuple(r) for r in q_b.collect()} == {tuple(r) for r in q_s.collect()}
