"""Schema-as-data cast stage (reference type system as a broadcast
table: cimpy/cgmes_v2_4_15/*.py class defaults + cimimport.py:243-273
cast/skip machinery)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cimpy_spark import pipeline as P
from cimpy_spark.operators.schema import (
    SCHEMA_COLS,
    fixture_schema,
    schema_cast,
    schema_quarantine_counts,
)

ROWS = [
    ("c1", 0, "user", "«decl E1 type:T0 p_int=5 p_bool=true p_enum=kind:Unit.V1»", None),
    # V2 is outside the schema's enum domain -> bad literal
    ("c1", 1, "user", "«decl E2 type:T0 p_int=7 p_bool=false p_enum=kind:Unit.V2»", None),
    # q_str undeclared for T3 -> unknown attr
    ("c1", 2, "user", "«decl E3 type:T3 p_int=1 p_bool=true p_enum=kind:Unit.V0»", None),
    ("c1", 3, "user", "«about E3 q_str=sX»", None),
]


def _cast(spark, schema_df=None):
    t = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    nodes = P.build_graph(t).nodes
    return schema_cast(nodes, schema_df or fixture_schema(spark))


def test_statuses_and_defaults(spark):
    got = {
        (r["entity_id"], r["attr"], r["status"]): r["value"]
        for r in _cast(spark).collect()
    }
    # observed cast-ok values pass through
    assert got[("E1", "p_int", "observed")] == "5"
    assert got[("E1", "p_enum", "observed")] == "V1"
    # enum outside domain -> bad_literal, and the class default
    # survives (no successful assignment ever happened)
    assert got[("E2", "p_enum", "bad_literal")] == "V2"
    assert got[("E2", "p_enum", "default")] == "V0"
    # attr not in the schema for this type -> unknown_attr (skip+count)
    assert got[("E3", "q_str", "unknown_attr")] == "sX"
    # declared-but-never-planted attr materializes its default
    assert got[("E1", "p_rated", "default")] == "1.5"
    # the numeric cast is real (reference setattr-with-cast)
    nums = {
        (r["entity_id"], r["attr"]): r["num_value"]
        for r in _cast(spark).collect()
        if r["num_value"] is not None
    }
    assert nums[("E1", "p_int")] == 5.0
    assert nums[("E1", "p_rated")] == 1.5


def test_quarantine_counts(spark):
    q = {
        (r["attr"], r["status"]): r["n"]
        for r in schema_quarantine_counts(_cast(spark)).collect()
    }
    assert q == {("p_enum", "bad_literal"): 1, ("q_str", "unknown_attr"): 1}


def test_new_attr_is_a_data_change_not_a_code_change(spark):
    """Extending the schema table changes cast behavior with zero code
    edits — the point of schema-as-data (SURVEY §1.3)."""
    extra = _cast(spark).sparkSession.createDataFrame(
        [("T3", "q_str", "string", "0..1", None, None, ["assistant"])],
        SCHEMA_COLS,
    )
    extended = fixture_schema(_cast(spark).sparkSession).unionByName(extra)
    got = {
        (r["entity_id"], r["attr"], r["status"])
        for r in _cast(spark, extended).collect()
    }
    assert ("E3", "q_str", "observed") in got
    assert ("E3", "q_str", "unknown_attr") not in got
