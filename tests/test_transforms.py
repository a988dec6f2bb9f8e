"""Graph-transform tests (utils.py / CIMScenarios.py analogs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cimpy_spark.operators.transforms import (
    add_edges,
    add_entities,
    contract_edges,
    delete_entities,
    select_entities,
    surrogate_ids,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "entity_id string, attr string, value string")


def test_delete_entities_removes_touching_edges(spark):
    nodes = _nodes(spark, [("a", "rdf_type", "T0"), ("b", "rdf_type", "T1"), ("c", "rdf_type", "T1")])
    edges = _edges(spark, [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")])
    ids = select_entities(nodes, "rdf_type", "T0")
    n2, e2 = delete_entities(nodes, edges, ids)
    assert {r["entity_id"] for r in n2.select("entity_id").distinct().collect()} == {"b", "c"}
    assert [(r["src"], r["pred"], r["dst"]) for r in e2.collect()] == [("b", "p", "c")]


def test_contract_edges_merges_endpoints(spark):
    # switch chain a-sw-b-sw-c plus line c->d and line b->e:
    # contracting 'sw' merges {a,b,c} into 'a'; lines re-anchor there
    edges = _edges(
        spark,
        [
            ("a", "sw", "b"),
            ("b", "sw", "c"),
            ("c", "line", "d"),
            ("b", "line", "e"),
            ("a", "line", "b"),  # becomes a self-loop → dropped
        ],
    )
    out = {(r["src"], r["pred"], r["dst"]) for r in contract_edges(edges, "sw").collect()}
    assert out == {("a", "line", "d"), ("a", "line", "e")}


def test_scenario_builders(spark):
    nodes = _nodes(spark, [("a", "rdf_type", "T0")])
    n2 = add_entities(nodes, [("b", "rdf_type", "T1"), ("a", "rdf_type", "T9")])
    got = {(r["entity_id"], r["value"]) for r in n2.filter(F.col("attr") == "rdf_type").collect()}
    # existing (a, rdf_type) wins; b added
    assert got == {("a", "T0"), ("b", "T1")}

    edges = _edges(spark, [("a", "p", "b")])
    e2 = add_edges(edges, [("a", "p", "b"), ("b", "p", "a")])
    assert e2.count() == 2  # dedupe on append


def test_surrogate_ids_deterministic_and_distinct(spark):
    df = spark.createDataFrame([("x", 1), ("y", 2)], "name string, v int")
    a = surrogate_ids(df, ["name", "v"]).collect()
    b = surrogate_ids(df, ["name", "v"]).collect()
    assert sorted(r["surrogate_id"] for r in a) == sorted(r["surrogate_id"] for r in b)
    assert len({r["surrogate_id"] for r in a}) == 2


def test_bus_branch_composition_invariants(spark):
    """node_breaker_to_bus_branch end-to-end (utils.py:6-88): open
    breakers deleted with their edges, CLOSED breakers' switch edges
    contracted (endpoints merged), ordinary edges rewritten — and the
    reconnection invariant: no surviving edge references a deleted
    entity (utils.py:80-88)."""
    from cimpy_spark.operators.transforms import bus_branch

    nodes = _nodes(
        spark,
        [
            # open breaker bo: must vanish with its edges
            ("bo", "rdf_type", "T1"),
            ("bo", "p_bool", "true"),
            # closed breaker bc: its controls edge is a switch
            ("bc", "rdf_type", "T1"),
            ("bc", "p_bool", "false"),
            # non-breaker entity with a controls edge: ordinary edge
            ("x", "rdf_type", "T2"),
            ("y", "rdf_type", "T2"),
            ("z", "rdf_type", "T2"),
        ],
    )
    edges = _edges(
        spark,
        [
            ("bo", "controls", "x"),   # open breaker: deleted
            ("y", "feeds", "bo"),      # touches open breaker: deleted
            ("bc", "controls", "y"),   # closed switch: contracted (bc~y)
            ("x", "controls", "z"),    # non-breaker controls: survives
            ("y", "feeds", "z"),       # ordinary: rewritten to (bc, feeds, z)
            ("z", "feeds", "bc"),      # ordinary: rewritten to (z, feeds, bc)
        ],
    )
    out = bus_branch(nodes, edges).collect()
    triples = {(r["src"], r["pred"], r["dst"]) for r in out}
    # bc < y lexicographically -> component label is 'bc'
    assert triples == {
        ("x", "controls", "z"),
        ("bc", "feeds", "z"),
        ("z", "feeds", "bc"),
    }
    # reconnection invariant: the deleted open breaker appears nowhere
    assert all("bo" not in (s, d) for s, _, d in triples)
    # the switch edge itself did not survive
    assert ("bc", "controls", "y") not in triples


def test_graph_diff_partitions_changes(spark):
    from pyspark.sql import functions as F

    from cimpy_spark.operators.transforms import graph_diff

    old = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("x", "q", "y")],
        "src string, pred string, dst string",
    )
    new = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("n", "q", "m"), ("n", "q", "m")],
        "src string, pred string, dst string",
    )
    out = {(r["src"], r["pred"], r["dst"]): r["change"]
           for r in graph_diff(old, new).collect()}
    # unchanged edges absent; duplicates in input collapse
    assert out == {("x", "q", "y"): "removed", ("n", "q", "m"): "added"}
    # identical sets diff to nothing; diff is antisymmetric
    assert graph_diff(old, old).count() == 0
    rev = {(r["src"], r["pred"], r["dst"]): r["change"]
           for r in graph_diff(new, old).collect()}
    assert rev == {("x", "q", "y"): "added", ("n", "q", "m"): "removed"}
