"""Conversation-level curation operators over the transcripts table.

The engine's input is the BASELINE input_hint shape — ``(conv_id,
turn_idx, role, text, tool, ts)`` multi-turn transcripts — and a
training-data pipeline over transcripts needs conversation-LEVEL
curation before (or alongside) triple extraction: per-conversation
profiling for mixture/selection decisions, chat-shape validation
(role alternation), and whole-conversation deduplication (the same
conversation re-logged under a new conv_id is the transcript
corpus's verbatim-dup mode — doc-level dedup can't see it because
every turn is its own row).

All three are single-shuffle aggregations keyed on ``conv_id`` — the
SAME key the KG pipeline groups on, so at cluster scale they share
its partitioning (an Iceberg table bucketed by conv_id feeds all of
them shuffle-free). Each has an exact DuckDB oracle below (`*_sql`),
run over the identical transcripts derivation
(fixtures/events_transcripts.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cimpy_spark.fixtures.events_transcripts import transcripts_sql

def _toks():
    return F.size(F.split(F.trim(F.col("text")), r"\s+"))


def conv_profile(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile: turn counts by role, tool-call count,
    whitespace-token totals — the per-source "data card" statistics
    that drive transcript mixture/selection (cap long tool loops,
    upweight conversational depth, …).

    One hash aggregate on conv_id; every measure is map-side
    combinable, so at 10^12 turns this is a partial-agg scan + one
    |convs|-row shuffle. Token semantics = text.token_count's
    whitespace rule (split(trim(text), '\\s+') — shared with the
    DuckDB oracle). Output: (conv_id, n_turns, n_user, n_assistant,
    n_tool_calls, total_ws_tokens, avg_turn_tokens)."""
    role_is = lambda r: F.sum(  # noqa: E731
        F.when(F.col("role") == r, 1).otherwise(0)
    ).cast("bigint")
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        role_is("user").alias("n_user"),
        role_is("assistant").alias("n_assistant"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_tool_calls"),
        F.sum(_toks()).cast("bigint").alias("total_ws_tokens"),
        F.round(
            F.sum(_toks()) * F.lit(1.0) / F.count(F.lit(1)), 6
        ).alias("avg_turn_tokens"),
    )


def conv_alternation(transcripts: DataFrame) -> DataFrame:
    """Chat-shape validation: count adjacent same-role turn pairs per
    conversation (a well-formed chat log alternates speakers; repeated
    roles mark concatenation glitches, dropped turns, or agent loops
    — rows a chat-template training pipeline must repair or drop).

    One window (lag over turn_idx within conv_id) + one aggregate on
    the same key — a single shuffle, same partitioning as the
    pipeline. Output: (conv_id, n_repeat_role, clean)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    rep = F.when(F.col("role") == F.lag("role").over(w), 1).otherwise(0)
    return (
        transcripts.select("conv_id", rep.alias("rep"))
        .groupBy("conv_id")
        .agg(F.sum("rep").cast("bigint").alias("n_repeat_role"))
        .select(
            "conv_id",
            "n_repeat_role",
            (F.col("n_repeat_role") == 0).alias("clean"),
        )
    )


def conv_dedup_exact(transcripts: DataFrame) -> DataFrame:
    """Whole-conversation exact dedup: canonicalize each conversation
    to its turn-ordered ``role:text`` transcript, md5 it, and elect
    the lexicographically-smallest conv_id per fingerprint as keeper
    (deterministic in both engines). Output one row per conversation:
    (conv_id, keeper_conv_id, is_dup).

    Shape: one conv_id aggregate (collect_list is bounded by
    conversation length — the bound the whole pipeline already
    assumes) + one window over the md5 fingerprint (uniform key, no
    skew). Two shuffles total; the fingerprint rows are |convs| long,
    ≪ the turn count."""
    lines = F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "role", "text"))),
        lambda s: F.concat_ws(":", s["role"], s["text"]),
    )
    canon = transcripts.groupBy("conv_id").agg(
        F.md5(F.concat_ws("\n", lines)).alias("fp")
    )
    w = Window.partitionBy("fp")
    return canon.select(
        "conv_id", F.min("conv_id").over(w).alias("keeper_conv_id")
    ).select(
        "conv_id",
        "keeper_conv_id",
        (F.col("conv_id") != F.col("keeper_conv_id")).alias("is_dup"),
    )


def plant_conv_duplicates(transcripts: DataFrame, mod: int = 10) -> DataFrame:
    """Union the transcripts with an exact copy of every conversation
    whose numeric id ≡ 3 (mod `mod`), re-keyed ``c… → d…`` — the
    planted-duplicate corpus for the conv_dedup gate (the raw fixture
    has no duplicate conversations: every text embeds its event_id).
    Mirrors fixtures/organic.py's planted-dup discipline; the DuckDB
    oracle derives the identical corpus (`planted_cte_sql`)."""
    dup = transcripts.filter(
        F.substring(F.col("conv_id"), 2, 1000000).cast("int") % mod == 3
    ).withColumn(
        "conv_id",
        F.concat(F.lit("d"), F.substring(F.col("conv_id"), 2, 1000000)),
    )
    return transcripts.unionByName(dup)


# --------------------------------------------------------------------------
# DuckDB oracles (run over the shared transcripts derivation)
# --------------------------------------------------------------------------

_T_CTE = f"transcripts AS ({transcripts_sql()})"

_DUCK_TOKS = "len(string_split_regex(trim(text), '\\s+'))"


def conv_profile_sql() -> str:
    return f"""
    WITH {_T_CTE}
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
           CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
           CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
           CAST(sum({_DUCK_TOKS}) AS BIGINT) AS total_ws_tokens,
           round(sum({_DUCK_TOKS}) * 1.0 / count(*), 6) AS avg_turn_tokens
    FROM transcripts
    GROUP BY conv_id
    """


def conv_alternation_sql() -> str:
    return f"""
    WITH {_T_CTE},
    lagged AS (
      SELECT conv_id,
             CASE WHEN role = lag(role) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
             ) THEN 1 ELSE 0 END AS rep
      FROM transcripts
    )
    SELECT conv_id,
           CAST(sum(rep) AS BIGINT) AS n_repeat_role,
           sum(rep) = 0 AS clean
    FROM lagged
    GROUP BY conv_id
    """


def planted_cte_sql(mod: int = 10) -> str:
    """The planted-duplicate corpus as a CTE body (matches
    plant_conv_duplicates exactly)."""
    return f"""
    planted AS (
      SELECT conv_id, turn_idx, role, text FROM transcripts
      UNION ALL
      SELECT 'd' || substr(conv_id, 2) AS conv_id, turn_idx, role, text
      FROM transcripts
      WHERE CAST(substr(conv_id, 2) AS INT) % {mod} = 3
    )
    """


def conv_dedup_exact_sql(mod: int = 10) -> str:
    return f"""
    WITH {_T_CTE},
    {planted_cte_sql(mod)},
    canon AS (
      SELECT conv_id,
             md5(string_agg(role || ':' || text, chr(10) ORDER BY turn_idx)) AS fp
      FROM planted
      GROUP BY conv_id
    )
    SELECT conv_id,
           keeper_conv_id,
           conv_id <> keeper_conv_id AS is_dup
    FROM (
      SELECT conv_id,
             min(conv_id) OVER (PARTITION BY fp) AS keeper_conv_id
      FROM canon
    )
    """
