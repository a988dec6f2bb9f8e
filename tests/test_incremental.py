"""Incremental ingest: half the corpus, then the rest — final
outputs must equal a single full run, and old conversations must not
be re-extracted."""

from __future__ import annotations

import pytest
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

    # the keyed header merge is exact: first-wins author/namespace
    # after two increments == one full run (min over all keys)
    hdr_inc = {r["profile"]: (r["author"], r["namespace"]) for r in res_inc["meta"].collect()}
    hdr_full = {r["profile"]: (r["author"], r["namespace"]) for r in res_full["meta"].collect()}
    assert hdr_inc == hdr_full
    assert all(a is not None for pair in hdr_full.values() for a in pair)


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

    # simulate the crash: APPEND the increment's triples (as the
    # increment would) and stop — cmap_full still reflects only batch 1
    from cimpy_spark.operators.extract import TRIPLE_SCHEMA

    ledger = LineageLedger(d)
    committed = ledger.read_append_stage(spark, "triples", TRIPLE_SCHEMA)
    new_triples = extract_triples(
        t.join(committed.select("conv_id").distinct(), "conv_id", "left_anti")
    ).localCheckpoint(eager=True)
    ledger.run_append_stage(
        spark, "triples", lambda: new_triples, partition_by=["obj_kind"]
    )

    # resume: must detect the stale cmap_full and recompute fully —
    # and WARN that the snapshot header is being recovered from the
    # passed transcripts (the stale-meta path, materialize.py)
    with pytest.warns(UserWarning, match="stale/legacy meta"):
        res = ingest_increment(spark, t, d)
    full = run_pipeline(spark, t, str(tmp_path / "full"))
    for stage in ["cmap", "canon_edges", "nodes"]:
        assert res[stage].exceptAll(full[stage]).count() == 0, stage
        assert full[stage].exceptAll(res[stage]).count() == 0, stage


def test_incremental_nodes_exclude_undeclared_aliases(spark, tmp_path):
    """The election membership must be the DECLARED restriction in the
    incremental path too: an about-mention of a never-declared alias
    (merged via sameAs) participates in neither the full run's
    election nor the incremental one."""
    rows1 = [
        ("a1", 0, "user", "«decl E1 type:T1 p_int=5 p_bool=true p_enum=kind:Unit.V1»", None),
        ("a1", 1, "user", "«same E1 E9»", None),  # E9 never declared
        ("a1", 2, "user", "«about E9 q_int=7»", None),  # must NOT elect
    ]
    rows2 = [
        ("b1", 0, "user", "«about E1 q_str=s2»", None),  # touches E1's component
        ("b1", 1, "user", "«decl E2 type:T2 p_int=1 p_bool=false p_enum=kind:Unit.V0»", None),
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string"
    t1 = spark.createDataFrame(rows1, schema)
    t_all = spark.createDataFrame(rows1 + rows2, schema)

    inc_dir, full_dir = str(tmp_path / "i"), str(tmp_path / "f")
    ingest_increment(spark, t1, inc_dir)
    res_inc = ingest_increment(spark, t_all, inc_dir)
    res_full = run_pipeline(spark, t_all, full_dir)

    inc_nodes = {tuple(r) for r in res_inc["nodes"].collect()}
    full_nodes = {tuple(r) for r in res_full["nodes"].collect()}
    assert inc_nodes == full_nodes
    # the undeclared alias's attr is absent everywhere
    assert not any(n[1] == "q_int" and n[2] == "7" for n in inc_nodes)


def test_triples_append_only_no_rewrite(spark, tmp_path):
    """The fact stage must never rewrite committed increments
    (Iceberg-append semantics): batch 2 adds inc_00001 and leaves
    inc_00000's files byte-untouched."""
    import glob
    import os

    t = transcripts_from_events(spark, SF_TINY).cache()
    convs = [r["conv_id"] for r in t.select("conv_id").distinct().collect()]
    half = set(sorted(convs)[: len(convs) // 2])
    d = str(tmp_path / "kg")
    ingest_increment(spark, t.filter(F.col("conv_id").isin(list(half))), d)

    inc0 = f"{d}/triples/inc_00000"
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{inc0}/**", recursive=True)
        if os.path.isfile(p)
    }
    assert before

    ingest_increment(spark, t, d)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{inc0}/**", recursive=True)
        if os.path.isfile(p)
    }
    assert after == before  # no rewrite of old increment files
    assert os.path.isdir(f"{d}/triples/inc_00001")


def test_incremental_noop_when_no_new_convs(spark, tmp_path):
    t = transcripts_from_events(spark, SF_TINY)
    d = str(tmp_path / "kg")
    ingest_increment(spark, t, d)
    n1 = ingest_increment(spark, t, d)["triples"].count()
    n2 = ingest_increment(spark, t, d)["triples"].count()
    assert n1 == n2


def test_partial_increment_dir_is_overwritten_on_retry(spark, tmp_path):
    """A crash mid-append leaves an inc dir without _SUCCESS and no
    ledger record; the retry must overwrite it in place and commit
    normally (idempotent resume for append stages)."""
    import os

    t = transcripts_from_events(spark, SF_TINY).cache()
    convs = sorted(r["conv_id"] for r in t.select("conv_id").distinct().collect())
    half = set(convs[: len(convs) // 2])
    d = str(tmp_path / "kg")
    ingest_increment(spark, t.filter(F.col("conv_id").isin(list(half))), d)

    # simulate a crash during the NEXT increment's write: orphan dir
    # with junk, no _SUCCESS, no ledger record
    orphan = f"{d}/triples/inc_00001"
    os.makedirs(orphan)
    with open(f"{orphan}/part-junk.parquet", "w") as f:
        f.write("not parquet")

    res = ingest_increment(spark, t, d)  # retry over full input
    assert os.path.exists(f"{orphan}/_SUCCESS")  # overwritten in place
    full = run_pipeline(spark, t, str(tmp_path / "full"))
    for stage in ("triples", "canon_edges", "nodes"):
        a, b = res[stage], full[stage]
        assert a.count() == b.count(), stage
        assert a.exceptAll(b).count() == 0, stage
