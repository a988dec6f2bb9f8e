"""Semantics of the conversation-level curation operators
(cimpy_spark/functions/conversations.py). Cross-engine value parity
is the driver gate (conv_profile / conv_alternation /
conv_dedup_exact vs their DuckDB oracles); these tests pin the
SEMANTICS on handcrafted conversations and the plan shapes."""

from __future__ import annotations

from cimpy_spark.functions.conversations import (
    conv_alternation,
    conv_dedup_exact,
    conv_profile,
    plant_conv_duplicates,
)

ROWS = [
    # c1: clean alternation, one tool call
    ("c1", 0, "user", "hello there", None),
    ("c1", 1, "assistant", "hi", None),
    ("c1", 2, "tool", "result 42", "tool_3"),
    # c2: exact copy of c1 under another id (out-of-order rows — the
    # canonicalization must sort by turn_idx)
    ("c2", 2, "tool", "result 42", "tool_9"),
    ("c2", 0, "user", "hello there", None),
    ("c2", 1, "assistant", "hi", None),
    # c3: same turn TEXTS as c1 but roles differ -> NOT a duplicate
    ("c3", 0, "assistant", "hello there", None),
    ("c3", 1, "user", "hi", None),
    ("c3", 2, "tool", "result 42", None),
    # c4: two adjacent same-role pairs
    ("c4", 0, "user", "a", None),
    ("c4", 1, "user", "b", None),
    ("c4", 2, "user", "c d e", None),
    ("c4", 3, "assistant", "ok", None),
]

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


def _t(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_conv_profile_values(spark):
    rows = {r["conv_id"]: r for r in conv_profile(_t(spark)).collect()}
    c1 = rows["c1"]
    assert (c1["n_turns"], c1["n_user"], c1["n_assistant"]) == (3, 1, 1)
    assert c1["n_tool_calls"] == 1
    assert c1["total_ws_tokens"] == 2 + 1 + 2
    assert c1["avg_turn_tokens"] == round(5 / 3, 6)
    c4 = rows["c4"]
    assert (c4["n_turns"], c4["n_user"], c4["n_tool_calls"]) == (4, 3, 0)
    assert c4["total_ws_tokens"] == 6


def test_conv_alternation_counts(spark):
    rows = {r["conv_id"]: r for r in conv_alternation(_t(spark)).collect()}
    assert rows["c1"]["n_repeat_role"] == 0 and rows["c1"]["clean"]
    assert rows["c4"]["n_repeat_role"] == 2 and not rows["c4"]["clean"]


def test_conv_dedup_exact_semantics(spark):
    rows = {r["conv_id"]: r for r in conv_dedup_exact(_t(spark)).collect()}
    # c2 is a byte-identical conversation (after turn ordering; tool
    # column is NOT part of identity) -> dup of the lexicographically
    # smaller c1
    assert rows["c1"]["keeper_conv_id"] == "c1" and not rows["c1"]["is_dup"]
    assert rows["c2"]["keeper_conv_id"] == "c1" and rows["c2"]["is_dup"]
    # same texts under different roles is NOT a duplicate
    assert rows["c3"]["keeper_conv_id"] == "c3" and not rows["c3"]["is_dup"]
    assert rows["c4"]["keeper_conv_id"] == "c4"


def test_plant_conv_duplicates_detected(spark):
    from cimpy_spark.fixtures.events_transcripts import (
        transcripts_from_events,
    )

    from tests.conftest import SF_TINY

    t = transcripts_from_events(spark, SF_TINY)
    planted = plant_conv_duplicates(t)
    out = conv_dedup_exact(planted).collect()
    dups = {r["conv_id"]: r["keeper_conv_id"] for r in out if r["is_dup"]}
    # every planted d<k> conversation resolves to its c<k> source
    assert dups, "fixture planted no duplicates"
    assert all(k.startswith("d") and v == "c" + k[1:] for k, v in dups.items())
    # and nothing else was merged
    n_planted = planted.select("conv_id").distinct().count() - t.select(
        "conv_id"
    ).distinct().count()
    assert len(dups) == n_planted


def test_conv_plan_shapes(spark):
    """conv_profile is ONE exchange (hash on conv_id, partial aggs
    map-side); conv_dedup adds only the |convs|-row fp window."""
    t = _t(spark)
    plan = conv_profile(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    plan2 = conv_dedup_exact(t)._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") == 2


def test_conv_pairs_semantics(spark):
    from cimpy_spark.functions.conversations import conv_pairs

    rows = [
        # opener assistant turn (no prior user) -> dropped
        ("p1", 0, "assistant", "unsolicited", None),
        ("p1", 1, "user", "question one", None),
        ("p1", 2, "tool", "lookup result", "tool_1"),
        ("p1", 3, "assistant", "answer one", None),
        # a second assistant turn re-pairs with the SAME nearest user
        ("p1", 4, "assistant", "answer two longer", None),
        ("p1", 5, "user", "question two", None),
        ("p1", 6, "assistant", "answer three", None),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    out = {r["turn_idx"]: r for r in conv_pairs(t).collect()}
    assert set(out) == {3, 4, 6}, "opener dropped, three pairs mined"
    assert out[3]["prompt"] == "question one" and out[3]["prompt_turn_idx"] == 1
    # tool turn at idx 2 skipped over, not used as prompt
    assert out[4]["prompt"] == "question one"
    assert out[6]["prompt"] == "question two" and out[6]["prompt_turn_idx"] == 5
    assert out[4]["response_ws_tokens"] == 3
    assert out[6]["prompt_ws_tokens"] == 2


def test_conv_tool_stats_and_transitions(spark):
    from cimpy_spark.functions.conversations import (
        conv_tool_stats,
        conv_tool_transitions,
    )

    rows = [
        ("t1", 0, "tool", "a b", "search"),
        ("t1", 1, "tool", "c", "fetch"),
        ("t1", 2, "tool", "d e f", "search"),
        ("t2", 0, "tool", "g", "search"),
        ("t2", 1, "user", "h", None),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    stats = {r["tool"]: r for r in conv_tool_stats(t).collect()}
    assert stats["search"]["n_calls"] == 3
    assert stats["search"]["n_convs"] == 2
    assert stats["search"]["avg_call_ws_tokens"] == 2.0  # (2+3+1)/3
    assert stats["fetch"]["n_calls"] == 1 and stats["fetch"]["n_convs"] == 1
    trans = {
        (r["prev_tool"], r["tool"]): r["n"]
        for r in conv_tool_transitions(t).collect()
    }
    # each conversation's first call transitions from <start>
    assert trans[("<start>", "search")] == 2
    assert trans[("search", "fetch")] == 1
    assert trans[("fetch", "search")] == 1
    assert sum(trans.values()) == 4


def test_conv_latency_semantics(spark):
    import datetime as dt

    from cimpy_spark.functions.conversations import conv_latency

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: base + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        ("L1", 0, "user", "q", None, s(0)),
        ("L1", 1, "assistant", "a", None, s(2.5)),
        ("L1", 2, "user", "q2", None, s(10)),
        ("L1", 3, "assistant", "a2", None, s(11)),
        ("L2", 0, "system", "solo", None, s(0)),  # single turn: no gaps
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )
    out = {r["conv_id"]: r for r in conv_latency(t).collect()}
    l1 = out["L1"]
    assert l1["n_gaps"] == 3
    assert l1["max_gap_ms"] == 7500
    assert l1["avg_gap_ms"] == round((2500 + 7500 + 1000) / 3, 6)
    assert l1["n_assistant_gaps"] == 2
    assert l1["avg_assistant_latency_ms"] == round((2500 + 1000) / 2, 6)
    l2 = out["L2"]
    assert l2["n_gaps"] == 0 and l2["avg_gap_ms"] is None
    assert l2["max_gap_ms"] is None and l2["n_assistant_gaps"] == 0


def test_conv_pairs_single_shuffle_plan(spark):
    """The pair mining is ONE exchange: the context window hashes on
    conv_id; the assistant filter and token counts stay in the same
    stage (no second shuffle)."""
    from cimpy_spark.functions.conversations import conv_pairs

    t = _t(spark)
    plan = conv_pairs(t)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_conv_neardup_planted(spark):
    from cimpy_spark.fixtures.events_transcripts import (
        transcripts_from_events,
    )
    from cimpy_spark.functions.conversations import (
        conv_neardup,
        plant_conv_near_duplicates,
    )

    from tests.conftest import SF_TINY

    t = transcripts_from_events(spark, SF_TINY)
    out = conv_neardup(plant_conv_near_duplicates(t)).collect()
    by_id = {r["conv_id"]: r for r in out}
    d_rows = [r for r in out if r["conv_id"].startswith("d")]
    e_rows = [r for r in out if r["conv_id"].startswith("e")]
    assert d_rows, "fixture planted no truncation near-dups"
    assert e_rows, "fixture planted no hard negatives"
    # every last-turn-truncated re-log merges into its 'c' original
    # (J=(n-3)/(n-2) on turn-hash 3-grams >= 0.8 at fixture lengths)
    for r in d_rows:
        assert r["is_dup"] and r["canonical_conv_id"] == "c" + r["conv_id"][1:]
    # every 40%-head re-log stays its own canonical (J ~ 0.4 < 0.8)
    for r in e_rows:
        assert not r["is_dup"] and r["canonical_conv_id"] == r["conv_id"]
    # originals never merge into their re-logs (min-id election prefers
    # the 'c' doc ids by construction)
    for r in out:
        if r["conv_id"].startswith("c"):
            assert by_id[r["conv_id"]]["canonical_conv_id"].startswith("c")


def test_conv_hash_docs_id_roundtrip(spark):
    from cimpy_spark.functions.conversations import (
        _conv_id_back,
        conv_hash_docs,
    )

    rows = [
        ("c7", 0, "user", "x", None),
        ("d7", 0, "user", "x", None),
        ("e12", 1, "tool", "y", "t"),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    docs = conv_hash_docs(t)
    got = {
        r["back"]
        for r in docs.select(_conv_id_back("doc_id").alias("back")).collect()
    }
    assert got == {"c7", "d7", "e12"}
    ids = {r["doc_id"] for r in docs.collect()}
    assert ids == {21, 22, 38}  # 3k + code


def test_conv_truncate_keeps_newest_suffix(spark):
    from cimpy_spark.functions.conversations import conv_truncate

    tr = spark.createDataFrame(
        [
            ("c1", 0, "user", "one two three four five six"),        # 6
            ("c1", 1, "assistant", "seven eight nine ten"),          # 4
            ("c1", 2, "user", "eleven twelve"),                      # 2
            ("c2", 0, "user", "a " * 63 + "b"),                      # 64 exactly
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in conv_truncate(tr, budget=6).collect()}
    # newest-first cumulative: turn2=2, turn1=6, turn0=12
    assert out[("c1", 2)]["cum_from_end"] == 2 and out[("c1", 2)]["kept"]
    assert out[("c1", 1)]["cum_from_end"] == 6 and out[("c1", 1)]["kept"]
    assert out[("c1", 0)]["cum_from_end"] == 12 and not out[("c1", 0)]["kept"]
    # exact-budget single turn kept at the boundary (<=)
    out64 = {r["turn_idx"]: r for r in conv_truncate(tr, budget=64)
             .filter("conv_id = 'c2'").collect()}
    assert out64[0]["n_tok"] == 64 and out64[0]["kept"]
