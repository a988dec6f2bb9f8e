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


def _turn_key(s):
    """Canonical per-turn string under md5: ``role:text`` with NULLs
    coalesced to '' — one definition for conv_dedup_exact and
    conv_hash_docs, mirrored verbatim by _TURN_KEY_SQL (ADVICE r6:
    the two engines must degrade a NULL text the same way)."""
    return F.concat_ws(
        ":",
        F.coalesce(s["role"], F.lit("")),
        F.coalesce(s["text"], F.lit("")),
    )


# DuckDB mirror of _turn_key: coalesce keeps the turn in string_agg
# instead of NULLing the whole ``||`` chain (which would silently drop
# it from the fingerprint while Spark kept it)
_TURN_KEY_SQL = "coalesce(role, '') || ':' || coalesce(text, '')"


def conv_dedup_exact(transcripts: DataFrame) -> DataFrame:
    """Whole-conversation exact dedup: md5 each turn-ordered (role,
    text) pair FIRST, concat the fixed-width turn hashes, md5 the
    result, and elect the lexicographically-smallest conv_id per
    fingerprint as keeper (deterministic in both engines). Output one
    row per conversation: (conv_id, keeper_conv_id, is_dup).

    Hashing each turn to a fixed-width digest before joining makes
    the canonical form unambiguous: a turn text containing a newline
    (or a crafted ``role:text`` prefix) can no longer collide two
    distinct conversations onto one fingerprint, which the previous
    raw ``concat_ws('\\n', role:text)`` construction allowed (review
    finding; same per-turn hash as conv_neardup's turn units). A
    NULL role/text coalesces to '' IDENTICALLY on both engines
    (ADVICE r6: Spark's concat_ws silently skips NULL children while
    the oracle's ``||`` nulls the whole turn hash out of string_agg —
    the turn would vanish from the oracle fingerprint only).

    Shape: one conv_id aggregate (collect_list is bounded by
    conversation length — the bound the whole pipeline already
    assumes) + one window over the md5 fingerprint (uniform key, no
    skew). Two shuffles total; the fingerprint rows are |convs| long,
    ≪ the turn count."""
    lines = F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "role", "text"))),
        lambda s: F.md5(_turn_key(s)),
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


def conv_pairs(transcripts: DataFrame) -> DataFrame:
    """SFT (prompt, response) pair mining: every assistant turn paired
    with the NEAREST PRECEDING user turn in its conversation — the
    instruction-tuning extraction a transcript corpus exists to feed.
    Assistant turns with no prior user turn (conversation openers,
    system-led segments) are dropped; intervening tool/system turns
    are skipped over, matching how a chat template folds tool traffic
    into the assistant's context.

    One window over (conv_id, turn_idx) — `last(..., ignorenulls)`
    over rows UNBOUNDED PRECEDING..1 PRECEDING — so a single shuffle
    on the pipeline's own key; the filter to assistant rows happens
    after the window but BEFORE any further shuffle, so downstream
    consumers see only the pair rows. Output: (conv_id, turn_idx,
    prompt_turn_idx, prompt, response, prompt_ws_tokens,
    response_ws_tokens)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    user_only = lambda c: F.when(F.col("role") == "user", F.col(c))  # noqa: E731
    ws = lambda c: F.size(F.split(F.trim(F.col(c)), r"\s+")).cast("bigint")  # noqa: E731
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            F.last(user_only("turn_idx"), ignorenulls=True)
            .over(w)
            .alias("prompt_turn_idx"),
            F.last(user_only("text"), ignorenulls=True).over(w).alias("prompt"),
            F.col("text").alias("response"),
        )
        .filter(
            (F.col("role") == "assistant") & F.col("prompt_turn_idx").isNotNull()
        )
        .select(
            "conv_id",
            "turn_idx",
            "prompt_turn_idx",
            "prompt",
            "response",
            ws("prompt").alias("prompt_ws_tokens"),
            ws("response").alias("response_ws_tokens"),
        )
    )


def conv_tool_stats(transcripts: DataFrame) -> DataFrame:
    """Per-tool usage profile over the corpus: call count, distinct
    conversations touched, and mean whitespace-token size of the tool
    turns — the agent-trace analytics that size tool-result truncation
    and flag runaway tools before training.

    Filter (tool IS NOT NULL, pushed to the scan) then one hash
    aggregate keyed on `tool` — tool cardinality is tiny, so the
    shuffle is |tools| rows; `n_convs` uses exact count-distinct,
    which Spark executes as a two-phase partial-distinct expand (fine
    at any scale for a small group-key domain). Output: (tool,
    n_calls, n_convs, avg_call_ws_tokens)."""
    return (
        transcripts.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.round(F.avg(_toks()), 6).alias("avg_call_ws_tokens"),
        )
    )


def conv_tool_transitions(transcripts: DataFrame) -> DataFrame:
    """Tool-sequence bigrams: for each conversation's tool calls in
    turn order, count (prev_tool -> tool) transitions corpus-wide,
    with '<start>' marking each conversation's first call — the
    Markov-chain view of agent behavior (which tools chain, which
    loop) that drives trace sampling and loop-cap curation.

    One window (lag over tool turns within conv_id) + one aggregate
    on the tiny (prev_tool, tool) domain. The window partitions on
    conv_id — the pipeline's key — and the bigram aggregate's
    cardinality is |tools|² at most. Output: (prev_tool, tool, n)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.filter(F.col("tool").isNotNull())
        .select(
            "conv_id",
            F.coalesce(F.lag("tool").over(w), F.lit("<start>")).alias(
                "prev_tool"
            ),
            "tool",
        )
        .groupBy("prev_tool", "tool")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def conv_tool_ngrams(
    transcripts: DataFrame, n: int = 3, min_support: int = 2
) -> DataFrame:
    """Frequent tool-call SEQUENCES (length-`n` n-grams over each
    conversation's tool calls in turn order) — the sequential-pattern
    extension of `conv_tool_transitions`' Markov bigrams: which
    multi-step tool chains recur across the corpus (retry loops,
    search→read→write idioms) is what trace-sampling curation and
    agent-behavior audits select on. Sequences are counted corpus-
    wide (`n_occurrences`, sliding window — overlapping occurrences
    count) and by distinct conversation (`n_convs`); `min_support`
    on occurrences drops the long tail the way every frequent-
    sequence miner does.

    One window partition per conv_id (n−1 lead() columns over the
    tool turns — the same single-window shape as transitions), one
    aggregate on the ≤|tools|^n sequence domain. Output: (seq,
    n_occurrences, n_convs) with seq = 'tool1>tool2>…'."""
    if n < 2:
        raise ValueError("conv_tool_ngrams needs n >= 2")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = transcripts.filter(F.col("tool").isNotNull()).select(
        "conv_id",
        "turn_idx",
        "tool",
        *[F.lead("tool", j).over(w).alias(f"__t{j}") for j in range(1, n)],
    )
    seq = F.concat_ws(
        ">", F.col("tool"), *[F.col(f"__t{j}") for j in range(1, n)]
    )
    complete = calls
    for j in range(1, n):
        complete = complete.filter(F.col(f"__t{j}").isNotNull())
    return (
        complete.select("conv_id", seq.alias("seq"))
        .groupBy("seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
        .filter(F.col("n_occurrences") >= min_support)
    )


def conv_latency(transcripts: DataFrame) -> DataFrame:
    """Per-conversation timing profile from the input_hint `ts`
    column: inter-turn gap statistics plus the assistant-response
    latency (gap into each assistant turn) — the wall-clock shape of
    a conversation, used to drop stalled/replayed logs and to weight
    live traffic against batch backfills.

    Millisecond epochs (`unix_millis` / DuckDB `epoch_ms`) keep the
    arithmetic integral until the final rounded averages, so the two
    engines agree bit-for-bit. One window (lag ts over turn_idx) + one
    aggregate, both keyed on conv_id. Output: (conv_id, n_gaps,
    avg_gap_ms, max_gap_ms, n_assistant_gaps,
    avg_assistant_latency_ms)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # parquet ts arrives as TIMESTAMP_NTZ; epoch via timestamp cast
    # (session tz UTC == DuckDB's NTZ epoch_ms())
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = (ms - F.lag(ms).over(w)).alias("gap_ms")
    return (
        transcripts.select("conv_id", "role", gap)
        .groupBy("conv_id")
        .agg(
            F.count("gap_ms").alias("n_gaps"),
            F.round(F.avg("gap_ms"), 6).alias("avg_gap_ms"),
            F.max("gap_ms").alias("max_gap_ms"),
            F.count(
                F.when(F.col("role") == "assistant", F.col("gap_ms"))
            ).alias("n_assistant_gaps"),
            F.round(
                F.avg(F.when(F.col("role") == "assistant", F.col("gap_ms"))),
                6,
            ).alias("avg_assistant_latency_ms"),
        )
    )


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
             md5(string_agg(md5({_TURN_KEY_SQL}), chr(10) ORDER BY turn_idx)) AS fp
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


def conv_pairs_sql() -> str:
    duck_ws = lambda c: f"CAST(len(string_split_regex(trim({c}), '\\s+')) AS BIGINT)"  # noqa: E731
    return f"""
    WITH {_T_CTE},
    ctx AS (
      SELECT conv_id, turn_idx, role,
             last_value(CASE WHEN role = 'user' THEN turn_idx END IGNORE NULLS)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prompt_turn_idx,
             last_value(CASE WHEN role = 'user' THEN text END IGNORE NULLS)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prompt,
             text AS response
      FROM transcripts
    )
    SELECT conv_id, turn_idx, prompt_turn_idx, prompt, response,
           {duck_ws('prompt')} AS prompt_ws_tokens,
           {duck_ws('response')} AS response_ws_tokens
    FROM ctx
    WHERE role = 'assistant' AND prompt_turn_idx IS NOT NULL
    """


def conv_tool_stats_sql() -> str:
    return f"""
    WITH {_T_CTE}
    SELECT tool,
           CAST(count(*) AS BIGINT) AS n_calls,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           round(avg({_DUCK_TOKS}), 6) AS avg_call_ws_tokens
    FROM transcripts
    WHERE tool IS NOT NULL
    GROUP BY tool
    """


def conv_tool_transitions_sql() -> str:
    return f"""
    WITH {_T_CTE},
    calls AS (
      SELECT conv_id,
             COALESCE(lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                      '<start>') AS prev_tool,
             tool
      FROM transcripts
      WHERE tool IS NOT NULL
    )
    SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n
    FROM calls
    GROUP BY prev_tool, tool
    """


def conv_tool_ngrams_sql(n: int = 3, min_support: int = 2) -> str:
    """Mirror of conv_tool_ngrams: n−1 lead() columns per conv over
    the non-null tool turns, complete windows only, support filter."""
    leads = ",\n             ".join(
        f"lead(tool, {j}) OVER (PARTITION BY conv_id ORDER BY turn_idx)"
        f" AS t{j}"
        for j in range(1, n)
    )
    not_null = " AND ".join(f"t{j} IS NOT NULL" for j in range(1, n))
    concat = " || '>' || ".join(["tool"] + [f"t{j}" for j in range(1, n)])
    return f"""
    WITH {_T_CTE},
    calls AS (
      SELECT conv_id, tool,
             {leads}
      FROM transcripts
      WHERE tool IS NOT NULL
    )
    SELECT {concat} AS seq,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
    FROM calls
    WHERE {not_null}
    GROUP BY 1
    HAVING count(*) >= {min_support}
    """


def conv_latency_sql() -> str:
    return f"""
    WITH {_T_CTE},
    gaps AS (
      SELECT conv_id, role,
             epoch_ms(ts) - lag(epoch_ms(ts))
               OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_ms
      FROM transcripts
    )
    SELECT conv_id,
           CAST(count(gap_ms) AS BIGINT) AS n_gaps,
           round(avg(gap_ms), 6) AS avg_gap_ms,
           max(gap_ms) AS max_gap_ms,
           CAST(count(CASE WHEN role = 'assistant' THEN gap_ms END) AS BIGINT)
             AS n_assistant_gaps,
           round(avg(CASE WHEN role = 'assistant' THEN gap_ms END), 6)
             AS avg_assistant_latency_ms
    FROM gaps
    GROUP BY conv_id
    """


# --------------------------------------------------------------------------
# Whole-conversation NEAR-dedup (turn-hash shingling)
# --------------------------------------------------------------------------

_PREFIX_CODE = {"c": 0, "d": 1, "e": 2}


def conv_hash_docs(transcripts: DataFrame) -> DataFrame:
    """Project each conversation to a (doc_id, text) "document" whose
    words are the conversation's per-turn md5(role:text) hashes in
    turn order. Shingling those words makes near-dup detection operate
    on TURN SEQUENCES: a re-logged conversation that lost or gained a
    few turns still shares almost all its turn-hash 3-grams, while
    per-turn text dedup can never see conversation-level overlap.

    At 10^12 turns this is the scale move: each conversation collapses
    to |turns| fixed-width tokens BEFORE the dedup machinery runs, so
    the LSH/verify stages shuffle conversation-count rows, not raw
    text. doc_id = 3*k + prefix_code (c→0, d→1, e→2) keeps the id
    numeric, reversible, and ordered so min-id election prefers the
    original 'c' conversation."""
    code = (
        F.when(F.substring("conv_id", 1, 1) == "c", 0)
        .when(F.substring("conv_id", 1, 1) == "d", 1)
        .otherwise(2)
    )
    k = F.substring(F.col("conv_id"), 2, 1000000).cast("bigint")
    hashes = F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "role", "text"))),
        lambda s: F.md5(_turn_key(s)),
    )
    return (
        transcripts.groupBy("conv_id")
        .agg(F.concat_ws(" ", hashes).alias("text"))
        .select((3 * k + code).alias("doc_id"), "text")
    )


def _conv_id_back(col: str) -> F.Column:
    c = F.col(col)
    prefix = (
        F.when(c % 3 == 0, "c").when(c % 3 == 1, "d").otherwise("e")
    )
    return F.concat(prefix, (c / 3).cast("bigint").cast("string"))


def conv_neardup(transcripts: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Whole-conversation near-duplicate dedup: turn-hash documents
    (`conv_hash_docs`) through the SAME MinHash-LSH → Jaccard-verify →
    connected-components → min-id election pipeline as document dedup
    (functions/dedup.py:dedup_corpus) — one reusable engine, two
    granularities. A conversation re-logged minus its last turn is a
    textbook catch (J=(n-3)/(n-2) on turn-hash 3-grams); a 40%-head
    truncation falls well below 0.8 and is correctly kept.

    Output: (conv_id, canonical_conv_id, is_dup) — ids mapped back
    from the numeric doc space (original 'c' conversations win the
    min-id election over planted 'd'/'e' re-logs by construction)."""
    from cimpy_spark.functions.dedup import dedup_corpus

    out = dedup_corpus(conv_hash_docs(transcripts), threshold=threshold)
    return out.select(
        _conv_id_back("doc_id").alias("conv_id"),
        _conv_id_back("canonical_doc_id").alias("canonical_conv_id"),
        (~F.col("is_kept")).alias("is_dup"),
    )


def plant_conv_near_duplicates(
    transcripts: DataFrame, mod: int = 10
) -> DataFrame:
    """Planted NEAR-duplicate corpus for the conv_neardup gate:

    - conversations with id ≡ 3 (mod `mod`) re-logged as ``d<k>``
      MINUS their final turn (the retry/resume truncation mode —
      turn-hash Jaccard ≈ (n-3)/(n-2), well above 0.8);
    - conversations with id ≡ 7 (mod `mod`) re-logged as ``e<k>``
      keeping only the first 40% of turns (turn-hash Jaccard ≈ 0.4 —
      a hard negative the verify stage must REJECT).

    The DuckDB oracle derives the identical corpus
    (`planted_near_cte_sql`)."""
    w = Window.partitionBy("conv_id")
    k = F.substring(F.col("conv_id"), 2, 1000000).cast("int")
    t = transcripts.withColumn("_n", F.count(F.lit(1)).over(w))
    rekey = lambda p: F.concat(  # noqa: E731
        F.lit(p), F.substring(F.col("conv_id"), 2, 1000000)
    )
    trunc_last = (
        t.filter((k % mod == 3) & (F.col("turn_idx") < F.col("_n") - 1))
        .withColumn("conv_id", rekey("d"))
        .drop("_n")
    )
    head40 = (
        t.filter((k % mod == 7) & (F.col("turn_idx") * 5 < F.col("_n") * 2))
        .withColumn("conv_id", rekey("e"))
        .drop("_n")
    )
    return transcripts.unionByName(trunc_last).unionByName(head40)


def planted_near_cte_sql(mod: int = 10) -> str:
    return f"""
    sized AS (
      SELECT conv_id, turn_idx, role, text,
             count(*) OVER (PARTITION BY conv_id) AS _n
      FROM transcripts
    ),
    plnear AS (
      SELECT conv_id, turn_idx, role, text FROM transcripts
      UNION ALL
      SELECT 'd' || substr(conv_id, 2), turn_idx, role, text
      FROM sized
      WHERE CAST(substr(conv_id, 2) AS INT) % {mod} = 3
        AND turn_idx < _n - 1
      UNION ALL
      SELECT 'e' || substr(conv_id, 2), turn_idx, role, text
      FROM sized
      WHERE CAST(substr(conv_id, 2) AS INT) % {mod} = 7
        AND turn_idx * 5 < _n * 2
    )
    """


def conv_neardup_sql(threshold: float = 0.8, mod: int = 10) -> str:
    """DuckDB mirror of conv_neardup over the planted-near corpus:
    turn-hash convdocs → the shared jac_ctes_v2 chain (the xxhash64
    family conv_neardup inherits from dedup_corpus since the round-7
    default graduation; nums_max=4000 bounds shingle positions at 4k
    TURNS per conversation — the word cap of the doc-level chain does
    not apply because words here are per-turn hashes) → transitive
    closure → min-id election."""
    from cimpy_spark.functions.doc_oracles import jac_ctes_v2

    back = (
        lambda c: f"(CASE {c} % 3 WHEN 0 THEN 'c' WHEN 1 THEN 'd' "
        f"ELSE 'e' END) || CAST({c} // 3 AS STRING)"
    )
    sql = f"""
    WITH RECURSIVE {_T_CTE},
    {planted_near_cte_sql(mod)},
    convdocs AS (
      SELECT (CASE substr(conv_id, 1, 1) WHEN 'c' THEN 0
              WHEN 'd' THEN 1 ELSE 2 END)
             + 3 * CAST(substr(conv_id, 2) AS BIGINT) AS doc_id,
             string_agg(md5({_TURN_KEY_SQL}), ' ' ORDER BY turn_idx)
               AS text
      FROM plnear GROUP BY conv_id
    ),
    {jac_ctes_v2("convdocs", nums_max=4000)},
    dup AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {threshold}),
    sym AS (SELECT doc_a AS a, doc_b AS b FROM dup
            UNION SELECT doc_b, doc_a FROM dup),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM convdocs
      UNION
      SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
    ),
    cmapd AS (SELECT a AS doc_id, min(b) AS canonical_doc_id
              FROM reach GROUP BY a)
    SELECT {back('doc_id')} AS conv_id,
           {back('canonical_doc_id')} AS canonical_conv_id,
           doc_id <> canonical_doc_id AS is_dup
    FROM cmapd
    """
    # DuckDB inlines plain CTEs per consumer — the shingle/signature
    # chain re-evaluates per reference (measured 9.2 s of an 18.3 s
    # oracle battery); MATERIALIZE the non-recursive levels.
    import re

    # v2-chain members included; the recursive sxstripe (the XXH64
    # string port's stripe loop) and its direct tail consumers stay
    # un-materialized — only plain CTEs take the hint
    for name in ("convdocs", "w", "sh", "seeds", "shd", "shx",
                 "mixa", "mixb", "sig", "bands0", "bk1", "bk2",
                 "bands", "okbands", "cand", "sizes", "inter", "jac",
                 "dup", "sym", "cmapd", "sxout"):
        # anchored: "w"/"sh"/"sym" must not match inside longer names
        sql = re.sub(
            rf"(?<![A-Za-z0-9_]){name} AS \(",
            f"{name} AS MATERIALIZED (",
            sql,
        )
    return sql


def conv_truncate(transcripts: DataFrame, budget: int = 64) -> DataFrame:
    """Context-window truncation — the SFT-prep step that keeps the
    NEWEST suffix of each conversation fitting a token budget (chat
    training always preserves the latest turns; history is what gets
    cut): per conversation, the reverse cumulative whitespace-token
    sum from the last turn backwards, a turn kept iff its cumulative
    total still fits. Greedy whole-turn semantics (the first turn
    that would overflow is dropped along with everything before it);
    all-integer, so the boundary can't move between engines. Output:
    (conv_id, turn_idx, role, n_tok, cum_from_end, kept).

    Scale shape: ONE per-conversation window (ordered by turn_idx
    DESC, running sum) — the pipeline's own partitioning key, turn
    counts bounded by conversation length; zero joins."""
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tok").over(w)
    return (
        transcripts.select(
            "conv_id", "turn_idx", "role", toks.cast("int").alias("n_tok")
        )
        .withColumn("cum_from_end", cum.cast("int"))
        .withColumn("kept", F.col("cum_from_end") <= budget)
    )


def conv_truncate_sql(budget: int = 64) -> str:
    """DuckDB mirror of conv_truncate."""
    return f"""
    WITH {_T_CTE},
    t AS (
      SELECT conv_id, turn_idx, role,
             CAST({_DUCK_TOKS} AS INT) AS n_tok
      FROM transcripts
    )
    SELECT conv_id, turn_idx, role, n_tok,
           CAST(sum(n_tok) OVER (
             PARTITION BY conv_id ORDER BY turn_idx DESC
             ROWS UNBOUNDED PRECEDING
           ) AS INT) AS cum_from_end,
           sum(n_tok) OVER (
             PARTITION BY conv_id ORDER BY turn_idx DESC
             ROWS UNBOUNDED PRECEDING
           ) <= {budget} AS kept
    FROM t
    """
