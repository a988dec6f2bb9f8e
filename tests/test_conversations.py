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
