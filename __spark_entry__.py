"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG triple extraction on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, each with a DuckDB-equivalent oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cimpy_spark.fixtures.events_transcripts import (  # noqa: E402
    transcripts_from_events,
    transcripts_sql,
    triples_oracle_sql,
)
from cimpy_spark.operators.extract import extract_triples, extraction_metrics  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcript → triple extraction at sf0.001."""
    transcripts = transcripts_from_events(spark, "/root/testdata/sf0.001")
    return extract_triples(transcripts)


# --------------------------------------------------------------------------
# KG pipeline queries
# --------------------------------------------------------------------------

def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )


def _q_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_triples(transcripts_from_events(spark, sf_dir))


def _q_extract_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extraction_metrics(transcripts_from_events(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_transcripts": _q_transcripts,
        "kg_extract_triples": _q_extract,
        "kg_extract_metrics": _q_extract_metrics,
    }


def oracle_sql() -> dict[str, str]:
    transcripts = transcripts_sql("events")
    return {
        "kg_transcripts": (
            f"SELECT conv_id, turn_idx, role, text, tool FROM ({transcripts})"
        ),
        "kg_extract_triples": triples_oracle_sql("//", "events"),
        "kg_extract_metrics": f"""
            SELECT CASE
                WHEN event_id % 4 = 0 THEN 'decl'
                WHEN event_id % 4 = 1 THEN 'about'
                WHEN event_id % 4 = 2 THEN 'rel'
                WHEN (event_id // 4) % 5 = 0 THEN 'same'
                ELSE 'unknown_pattern' END AS pattern_kind,
              count(*) AS n
            FROM events GROUP BY 1
        """,
    }
