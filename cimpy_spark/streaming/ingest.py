"""Structured Streaming ingestion for the KG pipeline.

The reference is batch-only (profile files on disk); its incremental
axis is "more files later" (cimpy/cimimport.py:93,197 loops over
files). Spark-first, the same axis is a file-source stream: new
transcript partitions land in a directory (or Iceberg snapshots) and
flow through the *identical* extraction operator — ``extract_triples``
is narrow and stream-safe, so batch and streaming share one code path
(no semantic drift between the two).

Downstream linking/canonicalization stay batch-incremental per the
north_rule (resume via committed snapshots, cimpy_spark/plans): CC is
iterative and not expressible as a single always-incremental stream.
The streaming surface here covers ingestion + per-window monitoring
aggregates with watermarked late-data handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cimpy_spark.operators.extract import extract_triples

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript parquet partitions."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_extract(transcripts: DataFrame) -> DataFrame:
    """Streaming triple extraction — same Arrow UDF as batch."""
    return extract_triples(transcripts)


def windowed_mention_counts(
    transcripts: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-window, per-role mention counts with a watermark bounding
    late-data state (monitoring analog of the reference's grouped
    import accounting, cimpy/cimimport.py:41-66)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )


def conversation_state(transcripts: DataFrame) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``
    (beyond the reference, which is batch-only): per-conversation
    running state — turns seen, mentions seen, highest turn index —
    maintained across micro-batches and emitted as an update row per
    batch. Counts inside the state function are vectorized pandas over
    each group batch (no per-row Python).

    State is keyed by conv_id (the stream's natural partitioning);
    at 10^12-turn scale the state store holds one tiny row per live
    conversation, and updates are monotone — so the FINAL state per
    conversation equals the batch aggregate, which is how the oracle
    gates it (`stream_conv_state`)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "conv_id string, n_turns long, n_mentions long, max_turn_idx int"
    state_schema = "n_turns long, n_mentions long, max_turn_idx int"

    def update(key, pdfs, state: GroupState):
        n_turns, n_mentions, max_turn = (
            state.get if state.exists else (0, 0, -1)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_mentions += int(pdf["text"].str.count("«[^«»]*»").sum())
            if len(pdf):
                max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_mentions, max_turn))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n_turns],
                "n_mentions": [n_mentions],
                "max_turn_idx": [max_turn],
            }
        )

    return transcripts.groupBy("conv_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_ingest(spark, input_dir: str, out_dir: str):
    """Streaming KG maintenance end-to-end: each micro-batch of
    transcript files flows through the SAME batch-incremental ingest
    (extract only unseen conversations, append-only triples,
    incremental link/CC/node stages) via ``foreachBatch`` — the Spark
    pattern for transactional/stateful sinks that Structured Streaming
    can't express declaratively.

    Arrival invariant: a conversation must arrive atomically within
    one micro-batch (stage input files partitioned by conv_id; the
    Iceberg-snapshot analog of 'a profile file arrives whole') —
    ingest_increment's seen-conversation skip assumes a conversation
    is never extended after first sight. The bounded drain
    (availableNow) leaves the committed snapshot equal to a single
    batch run over all input (equivalence-tested)."""
    from cimpy_spark.operators.materialize import ingest_increment

    def _sink(batch_df, _batch_id: int):
        ingest_increment(spark, batch_df, out_dir)

    q = (
        stream_transcripts(spark, input_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{out_dir}/_stream_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_memory_sink(
    stream: DataFrame, name: str, mode: str = "append", checkpoint: str | None = None
):
    """Drain a bounded file stream into an in-memory table (test/dev
    helper); returns the query after processing all available data."""
    w = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination()
    return q


def stream_dedup_ingest(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    state_dir: str,
    threshold: float = 0.8,
    max_files_per_trigger: int = 4,
):
    """Streaming corpus-dedup maintenance — the training-data mirror
    of `stream_ingest`: each micro-batch of document files (a) appends
    to the committed corpus table and (b) flows through the SAME
    batch-incremental `dedup_ingest` against it, so new documents are
    signed once, only touched LSH buckets re-pair, and the
    verified-Jaccard cache carries across micro-batches.

    The corpus table under `corpus_dir` stands in for the Iceberg
    documents table batches arrive into (at scale the stream source
    IS that table's snapshots); `dedup_ingest` reads old text back
    only for verify pairs that touch an old document. The bounded
    drain (availableNow) leaves the committed dedup state equal to a
    single one-shot `dedup_corpus` over all input
    (equivalence-tested, same discipline as `stream_ingest`).

    Arrival invariant: a doc_id arrives exactly once across the
    stream (append-only corpus — re-sends are skipped by the seen
    set, never re-verified). The corpus write enforces it under
    foreachBatch's at-least-once replay: each micro-batch lands at a
    DETERMINISTIC per-batch path with mode('overwrite')
    (`_corpus_batch_write`), so a crash between the corpus write and
    the stream checkpoint commit re-overwrites the same dir on replay
    instead of appending duplicate rows — duplicated text would
    inflate later Jaccard verifies (shingle rows count per doc) and
    could push a below-threshold pair into a false merge."""
    from cimpy_spark.functions.dedup import dedup_ingest

    def _sink(batch_df, batch_id: int):
        _corpus_batch_write(batch_df, corpus_dir, batch_id)
        dedup_ingest(
            spark,
            read_corpus(spark, corpus_dir),
            state_dir,
            threshold=threshold,
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", f"{state_dir}/_stream_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _corpus_batch_write(batch_df, corpus_dir: str, batch_id: int) -> None:
    """Idempotent micro-batch append: the batch id names the target
    dir and the write overwrites it, so an at-least-once replay of
    the same batch converges to the same bytes (the Iceberg analog is
    a batch-id-keyed idempotent append commit)."""
    batch_df.write.mode("overwrite").parquet(
        f"{corpus_dir}/batch_{batch_id:09d}"
    )


def read_corpus(spark: SparkSession, corpus_dir: str):
    """Reader over all committed per-batch corpus dirs."""
    return (
        spark.read.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(corpus_dir)
    )
