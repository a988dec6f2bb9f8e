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


def test_crash_between_triples_and_cmap_commits(spark, tmp_path):
    """A crash after the increment's triples commit but before its
    cmap_full commit must NOT let the next run trust the stale
    labeling (it would silently drop the increment's sameAs merges)."""
    from cimpy_spark.operators.extract import extract_triples
    from cimpy_spark.plans.lineage import LineageLedger

    t = transcripts_from_events(spark, SF_TINY).cache()
    convs = sorted(r["conv_id"] for r in t.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    t1 = t.filter(F.col("conv_id").isin(list(half)))

    d = str(tmp_path / "crash")
    ingest_increment(spark, t1, d)

    # simulate the crash: commit the MERGED triples (as the increment
    # would) and stop — cmap_full still reflects only batch 1
    ledger = LineageLedger(d)
    committed = spark.read.parquet(ledger.stage_dir("triples"))
    merged = committed.unionByName(
        extract_triples(t.join(committed.select("conv_id").distinct(), "conv_id", "left_anti"))
    ).localCheckpoint(eager=True)
    ledger.run_stage(spark, "triples", lambda: merged, partition_by=["obj_kind"], force=True)

    # resume: must detect the stale cmap_full and recompute fully
    res = ingest_increment(spark, t, d)
    full = run_pipeline(spark, t, str(tmp_path / "full"))
    for stage in ["cmap", "canon_edges", "nodes"]:
        assert res[stage].exceptAll(full[stage]).count() == 0, stage
        assert full[stage].exceptAll(res[stage]).count() == 0, stage


def test_incremental_noop_when_no_new_convs(spark, tmp_path):
    t = transcripts_from_events(spark, SF_TINY)
    d = str(tmp_path / "kg")
    ingest_increment(spark, t, d)
    n1 = ingest_increment(spark, t, d)["triples"].count()
    n2 = ingest_increment(spark, t, d)["triples"].count()
    assert n1 == n2
