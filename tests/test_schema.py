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


def test_profile_routing_follows_schema_not_provenance(spark):
    """Export routing comes from the schema (reference resolves each
    attribute's serialization profile from the class model,
    cimexport.py:258-287), not from where the value was observed."""
    from cimpy_spark.operators.schema import route_to_profiles

    t = _cast(spark).sparkSession.createDataFrame(
        # q_int observed on a 'tool' turn, but schema routes it to
        # 'assistant'; zz_custom unknown -> keeps observed provenance
        [
            ("c1", 0, "user", "«decl E1 type:T0 p_int=5 p_bool=true p_enum=kind:Unit.V1»", None),
            ("c1", 1, "tool", "«about E1 q_int=9 zz_custom=x»", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    nodes = P.build_graph(t).nodes
    routed = {
        (r["attr"]): r["export_profile"]
        for r in route_to_profiles(nodes, fixture_schema(spark)).collect()
    }
    assert routed["q_int"] == "assistant"  # schema wins over 'tool'
    assert routed["p_int"] == "user"
    assert routed["zz_custom"] == "tool"  # unknown attr keeps provenance
    assert routed["rdf_type"] == "user"  # declaration profile


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


def test_default_suppression_drops_only_default_values(spark):
    """Export-side suppression (cimexport.py:101-107): rows equal to
    the schema default vanish; everything else survives."""
    from cimpy_spark.operators.schema import suppress_defaults

    rows = [
        # p_int=0 and p_bool=false ARE the schema defaults -> dropped
        ("c1", 0, "user", "«decl E1 type:T0 p_int=0 p_bool=false p_enum=kind:Unit.V1»", None),
        ("c1", 1, "user", "«decl E2 type:T0 p_int=7 p_bool=true p_enum=kind:Unit.V0»", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    nodes = P.build_graph(t).nodes
    kept = {(r["entity_id"], r["attr"], r["value"])
            for r in suppress_defaults(nodes, fixture_schema(spark)).collect()}
    assert ("E1", "p_int", "0") not in kept
    assert ("E1", "p_bool", "false") not in kept
    assert ("E1", "p_enum", "V1") in kept       # non-default survives
    assert ("E2", "p_int", "7") in kept
    assert ("E2", "p_enum", "V0") not in kept   # V0 IS the default
    assert ("E1", "rdf_type", "T0") in kept     # type rows pass through
