"""Incremental ingest: half the corpus, then the rest — final
outputs must equal a single full run, and old conversations must not
be re-extracted."""

from __future__ import annotations

from pyspark.sql import functions as F

from cimpy_spark.fixtures.events_transcripts import transcripts_from_events
from cimpy_spark.operators.materialize import ingest_increment, run_pipeline
from tests.conftest import SF_TINY


def test_incremental_equals_full(spark, tmp_path):
    t = transcripts_from_events(spark, SF_TINY).cache()
    convs = [r["conv_id"] for r in t.select("conv_id").distinct().collect()]
    half = set(sorted(convs)[: len(convs) // 2])
    t1 = t.filter(F.col("conv_id").isin(list(half)))

    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")

    # batch 1 (bootstrap), then batch 2 (increment over FULL input —
    # already-seen conversations must be skipped, not re-extracted)
    ingest_increment(spark, t1, inc_dir)
    res_inc = ingest_increment(spark, t, inc_dir)

    res_full = run_pipeline(spark, t, full_dir)

    for stage in ["triples", "entities", "edges", "cmap", "canon_edges", "nodes"]:
        a, b = res_inc[stage], res_full[stage]
        assert a.count() == b.count(), stage
        assert a.exceptAll(b).count() == 0, stage
        assert b.exceptAll(a).count() == 0, stage


def test_incremental_noop_when_no_new_convs(spark, tmp_path):
    t = transcripts_from_events(spark, SF_TINY)
    d = str(tmp_path / "kg")
    ingest_increment(spark, t, d)
    n1 = ingest_increment(spark, t, d)["triples"].count()
    n2 = ingest_increment(spark, t, d)["triples"].count()
    assert n1 == n2
