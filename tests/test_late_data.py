"""Watermark late-data drops (stream_late_data gate, round 7): the
oracle proves the emitted counts EXCLUDE the planted late rows; this
file pins that the exclusion happened through Spark's actual
watermark machinery (numRowsDroppedByWatermark fired for exactly the
planted rows), that the sentinel flush emitted every real window, and
the staging invariants the oracle's closed form depends on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cimpy_spark.fixtures.events_transcripts import (
    late_window_counts_sql,
    transcripts_from_events,
)
from cimpy_spark.functions.text import _md5_bucket
from cimpy_spark.streaming.ingest import (
    LATE_MOD,
    LATE_SALT,
    run_to_memory_sink,
    stage_late_batches,
    stream_transcripts,
    windowed_mention_counts,
)
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("late_data"))
    tr = transcripts_from_events(spark, SF_TINY)
    n_files = stage_late_batches(spark, tr, f"{d}/in")
    q = run_to_memory_sink(
        windowed_mention_counts(
            stream_transcripts(spark, f"{d}/in", max_files_per_trigger=1),
            window="10 minutes",
            watermark="5 minutes",
        ),
        "late_data_test",
        mode="append",
        checkpoint=f"{d}/ckpt",
    )
    rows = spark.table("late_data_test").collect()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    return tr, rows, dropped, n_files


def _planted_late_count(tr):
    from pyspark.sql import Window

    n = tr.count()
    w = Window.orderBy("ts", "conv_id", "turn_idx")
    return (
        tr.select(
            (F.row_number().over(w) - 1).alias("rk"),
            F.concat_ws(
                "#", F.col("conv_id"), F.col("turn_idx").cast("string")
            ).alias("_rid"),
        )
        .select(
            F.expr(f"(rk * 4) div {n}").alias("batch"),
            (_md5_bucket(LATE_SALT, LATE_MOD, "_rid") == 0).alias("late"),
        )
        .filter((F.col("batch") == 0) & F.col("late"))
        .count()
    )


def test_watermark_actually_dropped_the_planted_rows(spark, drained):
    """The exclusion must come from the watermark, not from staging
    losing rows: Spark's drop metric fired for EXACTLY the planted
    late rows, and the emitted total is input minus planted."""
    tr, rows, dropped, _ = drained
    planted = _planted_late_count(tr)
    assert planted > 0
    assert dropped == planted
    assert sum(r["n_turns"] for r in rows) == tr.count() - planted


def test_emitted_windows_match_closed_form_oracle(drained):
    _, rows, _, _ = drained
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_TINY}/events.parquet')"
    )
    du = {
        (str(ws), role, int(n))
        for ws, role, n in con.execute(late_window_counts_sql()).fetchall()
    }
    sp = {
        (str(r["window_start"]), r["role"], int(r["n_turns"])) for r in rows
    }
    assert sp == du


def test_sentinel_window_never_emits_and_spans_hold(spark, drained):
    """The sentinel only advances the watermark — its own window must
    stay in state; and the oracle's no-accidental-lateness argument
    needs each batch to span far more event time than window+delay."""
    tr, rows, _, n_files = drained
    assert not [r for r in rows if r["role"] == "sentinel"]
    assert n_files == 5  # 4 batches + sentinel
    # batch time-spans >> 15 min (window + delay + margin)
    from pyspark.sql import Window

    n = tr.count()
    w = Window.orderBy("ts", "conv_id", "turn_idx")
    spans = (
        tr.select(
            "ts", (F.row_number().over(w) - 1).alias("rk")
        )
        .select("ts", F.expr(f"(rk * 4) div {n}").alias("batch"))
        .groupBy("batch")
        .agg(
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("span_s")
        )
        .collect()
    )
    assert all(r["span_s"] > 15 * 60 for r in spans)
