"""Streaming ingestion tests: the stream path must produce exactly
what the batch path produces (shared operator), and windowed counts
must respect the watermarkable shape."""

from __future__ import annotations

from cimpy_spark.fixtures.events_transcripts import transcripts_from_events
from cimpy_spark.operators.extract import extract_triples
from cimpy_spark.streaming.ingest import (
    run_to_memory_sink,
    stream_extract,
    stream_transcripts,
    windowed_mention_counts,
)
from tests.conftest import SF_TINY


def _staged_dir(spark, tmp_path) -> str:
    d = str(tmp_path / "stream_in")
    transcripts_from_events(spark, SF_TINY).repartition(4).write.parquet(d)
    return d


def test_stream_extract_equals_batch(spark, tmp_path):
    d = _staged_dir(spark, tmp_path)
    stream = stream_extract(stream_transcripts(spark, d))
    assert stream.isStreaming
    run_to_memory_sink(stream, "stream_triples")
    streamed = spark.sql("SELECT * FROM stream_triples")

    batch = extract_triples(spark.read.parquet(d))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_windowed_counts(spark, tmp_path):
    d = _staged_dir(spark, tmp_path)
    stream = windowed_mention_counts(stream_transcripts(spark, d))
    # complete mode: append would hold back windows above the final
    # watermark forever on a bounded input (watermark only advances on
    # a *next* trigger)
    run_to_memory_sink(stream, "stream_windows", mode="complete")
    total = (
        spark.sql("SELECT sum(n_turns) AS s FROM stream_windows").collect()[0]["s"]
    )
    assert total == spark.read.parquet(d).count()


def test_stateful_conversation_state_crosses_batches(spark, tmp_path):
    """applyInPandasWithState: state must accumulate ACROSS
    micro-batches (not restart per batch), and the final state must
    equal the batch aggregate."""
    from pyspark.sql import functions as F

    from cimpy_spark.streaming.ingest import conversation_state

    t = transcripts_from_events(spark, SF_TINY)
    d = str(tmp_path / "state_in")
    # 24 round-robin files / maxFilesPerTrigger=8 -> 3 micro-batches
    t.repartition(24).write.parquet(d)
    run_to_memory_sink(
        conversation_state(stream_transcripts(spark, d)),
        "conv_state_t",
        mode="update",
        checkpoint=str(tmp_path / "ckpt"),
    )
    updates = spark.table("conv_state_t")
    # statefulness: at least one conversation emitted several update
    # rows with strictly growing counts (state carried across batches)
    multi = (
        updates.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_updates"),
            F.countDistinct("n_turns").alias("n_distinct"),
        )
        .filter((F.col("n_updates") > 1) & (F.col("n_distinct") > 1))
        .count()
    )
    assert multi > 0
    # final state per conversation == batch aggregate
    final = updates.groupBy("conv_id").agg(
        F.max("n_turns").alias("n_turns"),
        F.max("n_mentions").alias("n_mentions"),
        F.max("max_turn_idx").alias("max_turn_idx"),
    )
    batch = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit("«[^«»]*»"), 0))).alias(
            "n_mentions"
        ),
        F.max("turn_idx").alias("max_turn_idx"),
    )
    cols = ["conv_id", "n_turns", "n_mentions", "max_turn_idx"]
    a = final.select(*cols)
    b = batch.select(*[F.col(c).cast(dict(zip(cols, ["string", "long", "long", "int"]))[c]).alias(c) for c in cols])
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stream_ingest_equals_batch_pipeline(spark, tmp_path):
    """foreachBatch-driven incremental graph maintenance: draining the
    transcript stream must leave the SAME committed snapshot as one
    batch run over all input. Input files are conversation-atomic
    (partitioned by conv_id), the arrival invariant."""
    from pyspark.sql import functions as F

    from cimpy_spark.operators.materialize import run_pipeline
    from cimpy_spark.plans.lineage import LineageLedger
    from cimpy_spark.streaming.ingest import stream_ingest

    t = transcripts_from_events(spark, SF_TINY).cache()
    d_in = str(tmp_path / "in")
    # 16 conv-atomic files / maxFilesPerTrigger=8 -> 2 micro-batches
    t.repartition(16, "conv_id").write.parquet(d_in)

    d_stream = str(tmp_path / "stream_out")
    stream_ingest(spark, d_in, d_stream)

    d_full = str(tmp_path / "full_out")
    full = run_pipeline(spark, t, d_full)

    ledger = LineageLedger(d_stream)
    for stage in ("entities", "cmap", "canon_edges", "nodes"):
        a = spark.read.parquet(ledger.stage_dir(stage))
        b = full[stage]
        cols = sorted(b.columns)
        assert a.count() == b.count(), stage
        assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0, stage
        assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0, stage


def test_stream_dedup_ingest_equals_one_shot(spark, tmp_path):
    """foreachBatch-driven dedup maintenance over the ORGANIC corpus:
    draining the document stream (multiple micro-batches) must leave
    the SAME dedup result as one-shot dedup_corpus over all input."""
    from pyspark.sql import functions as F

    from cimpy_spark.fixtures.organic import organic_documents
    from cimpy_spark.functions.dedup import dedup_corpus, dedup_ingest
    from cimpy_spark.streaming.ingest import read_corpus, stream_dedup_ingest

    docs = organic_documents(
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
    ).cache()
    d_in = str(tmp_path / "docs_in")
    # 8 files / maxFilesPerTrigger=4 -> 2 micro-batches
    docs.repartition(8).write.parquet(d_in)

    d_corpus = str(tmp_path / "corpus")
    d_state = str(tmp_path / "dedup_state")
    stream_dedup_ingest(spark, d_in, d_corpus, d_state)

    # the committed state answers from a no-op ingest of the corpus
    final = dedup_ingest(spark, read_corpus(spark, d_corpus), d_state)
    batch = dedup_corpus(docs)
    cols = ["doc_id", "canonical_doc_id", "is_kept"]
    a, b = final.select(*cols), batch.select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_corpus_batch_write_is_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the corpus write
    and the stream checkpoint commit replays the batch. The per-batch
    deterministic-path overwrite must converge — writing the same
    micro-batch twice leaves exactly one copy of its rows (a plain
    append would duplicate them, inflating later Jaccard verifies
    into possible false merges)."""
    from cimpy_spark.streaming.ingest import _corpus_batch_write, read_corpus

    d_corpus = str(tmp_path / "corpus")
    b0 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    _corpus_batch_write(b0, d_corpus, 0)
    _corpus_batch_write(b0, d_corpus, 0)  # simulated replay
    b1 = spark.createDataFrame([(2, "epsilon")], "doc_id long, text string")
    _corpus_batch_write(b1, d_corpus, 1)
    got = read_corpus(spark, d_corpus)
    assert got.count() == 3
    assert got.select("doc_id").distinct().count() == 3
