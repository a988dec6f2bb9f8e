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
