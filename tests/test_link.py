"""Stage-2 linking tests (reference semantics:
cimpy/cimimport.py:277-332 — resolve, quarantine, dedupe, reverse)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cimpy_spark.fixtures.events_transcripts import transcripts_from_events
from cimpy_spark.operators.extract import extract_triples
from cimpy_spark.operators.link import (
    declared_entities,
    link_references,
    reverse_edges,
    salted_join,
)
from tests.conftest import SF_TINY


def _triples(spark):
    return extract_triples(transcripts_from_events(spark, SF_TINY)).cache()


def test_dangling_refs_quarantined_not_dropped_silently(spark):
    triples = _triples(spark)
    entities = declared_entities(triples)
    edges, quarantine = link_references(triples, entities)
    # every explicit X<n> target is quarantined; E<j> targets are
    # quarantined exactly when undeclared at this scale
    declared = {r["entity_id"] for r in entities.collect()}
    q = quarantine.collect()
    assert all(r["dst"] not in declared for r in q)
    assert any(r["dst"].startswith("X") for r in q)
    assert sum(r["n_refs"] for r in q) > 0
    # no dangling target survives into edges
    assert edges.filter(F.col("dst").startswith("X")).count() == 0
    assert edges.join(entities.withColumnRenamed("entity_id", "dst"), "dst", "left_anti").count() == 0


def test_edges_deduped(spark):
    triples = _triples(spark)
    entities = declared_entities(triples)
    edges, _ = link_references(triples, entities)
    dup = edges.groupBy("src", "pred", "dst").count().filter("count > 1").count()
    assert dup == 0


def test_reverse_edges_projection(spark):
    triples = _triples(spark)
    entities = declared_entities(triples)
    edges, _ = link_references(triples, entities)
    rev = reverse_edges(edges)
    assert rev.count() == edges.count()
    # round-trip: reversing twice restores the original edge set
    rr = rev.select(
        F.col("dst").alias("src"),
        F.regexp_replace("pred", "^rev_", "").alias("pred"),
        F.col("src").alias("dst"),
    )
    assert rr.exceptAll(edges).count() == 0
    assert edges.exceptAll(rr).count() == 0


def test_salted_join_matches_plain_join(spark):
    """Salted skew-join must be semantically identical to a plain
    inner equi-join (it exists purely for physical skew resistance)."""
    triples = _triples(spark)
    entities = declared_entities(triples)
    refs = triples.filter(
        (F.col("obj_kind") == "ref") & (F.col("pred") != "sameAs")
    ).select(F.col("subj").alias("src"), "pred", F.col("obj").alias("dst"))
    dict_df = entities.select(F.col("entity_id").alias("dst"))

    plain = refs.join(dict_df, "dst").select("src", "pred", "dst")
    salted = salted_join(refs, dict_df, "dst").select("src", "pred", "dst")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
