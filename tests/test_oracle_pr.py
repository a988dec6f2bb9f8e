"""The north-rule correctness gate: pipeline triples vs the
single-process pure-Python oracle at P/R ≥ 0.95 (two anti-joins),
plus per-turn text equality under stable (conv_id, turn_idx) order —
analog of the reference's golden import test (tests/test_import.py:
17-36)."""

from __future__ import annotations

import pytest

from cimpy_spark import pipeline as P
from cimpy_spark.fixtures.events_transcripts import transcripts_from_events
from cimpy_spark.fixtures.generator import generate_transcripts
from cimpy_spark.oracle import precision_recall, run_oracle
from tests.conftest import SF_TINY


@pytest.fixture(scope="module", params=["events", "generator"])
def fixture_transcripts(request, spark):
    if request.param == "events":
        return transcripts_from_events(spark, SF_TINY).cache()
    return generate_transcripts(
        spark, n_convs=40, turns_per_conv=25, n_entities=150, seed=7
    ).cache()


def _rows(df):
    return [r.asDict() for r in df.select("conv_id", "turn_idx", "text").collect()]


def test_triple_pr_vs_oracle(spark, fixture_transcripts):
    t = fixture_transcripts
    oracle = run_oracle(_rows(t))
    g = P.build_graph(t)

    emitted = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in g.triples.select("subj", "pred", "obj", "obj_kind").distinct().collect()
    }
    p, r = precision_recall(emitted, oracle.triples)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0  # should be exact, not just ≥0.95

    # resolved edges
    edges = {(e["src"], e["pred"], e["dst"]) for e in g.edges.collect()}
    p, r = precision_recall(edges, oracle.edges)
    assert p == 1.0 and r == 1.0

    # canonical map + canonical edges
    cmap = {r["entity_id"]: r["canonical_id"] for r in g.cmap.collect()}
    assert cmap == oracle.cmap

    cedges = {(e["src"], e["pred"], e["dst"]) for e in g.canon_edges.collect()}
    p, r = precision_recall(cedges, oracle.canon_edges)
    assert p == 1.0 and r == 1.0

    # canonical node attrs (first-wins election)
    nodes = {
        (n["entity_id"], n["attr"], n["value"]) for n in g.nodes.collect()
    }
    p, r = precision_recall(nodes, oracle.nodes)
    assert p == 1.0 and r == 1.0

    # quarantine counts
    q = {r["dst"]: r["n_refs"] for r in g.quarantine.collect()}
    assert q == oracle.quarantine


def test_per_turn_text_equality_stable_order(spark, fixture_transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — two independent materializations
    of the fixture agree row-for-row in that order."""
    t = fixture_transcripts
    a = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    b = t.repartition(7).orderBy("conv_id", "turn_idx").select(
        "conv_id", "turn_idx", "text"
    ).collect()
    assert a == b


def test_generator_plants_hot_entities(spark):
    from pyspark.sql import functions as F

    t = generate_transcripts(spark, n_convs=40, turns_per_conv=25, seed=7)
    g = P.build_graph(t)
    deg = g.edges.groupBy("dst").count()
    top = deg.orderBy(F.desc("count")).limit(5).collect()
    hot = {r["dst"] for r in top}
    # the planted hub entities dominate in-degree
    assert hot & {"E0", "E1", "E2", "E3", "E4"}
