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


def run_to_memory_sink(stream: DataFrame, name: str, mode: str = "append"):
    """Drain a bounded file stream into an in-memory table (test/dev
    helper); returns the query after processing all available data."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
