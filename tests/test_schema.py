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


def test_bad_double_quarantines_and_default_survives(spark):
    """A garbage double literal must be 'bad_literal' (not silently
    'observed' with NULL num_value), and the schema default must still
    materialize — consistent with the int path and the reference's
    typed cast (cimpy/cimimport.py:255-273)."""
    t = spark.createDataFrame(
        [("c1", 0, "user", "«decl E1 type:T0 p_int=5 p_bool=true p_enum=kind:Unit.V0»", None),
         ("c1", 1, "user", "«about E1 p_rated=abc»", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    nodes = P.build_graph(t).nodes
    got = {
        (r["attr"], r["status"]): (r["value"], r["num_value"])
        for r in schema_cast(nodes, fixture_schema(spark)).collect()
    }
    assert got[("p_rated", "bad_literal")] == ("abc", None)
    assert got[("p_rated", "default")] == ("1.5", 1.5)
    assert ("p_rated", "observed") not in got


def test_quarantine_counts(spark):
    q = {
        (r["attr"], r["status"]): r["n"]
        for r in schema_quarantine_counts(_cast(spark)).collect()
    }
    assert q == {("p_enum", "bad_literal"): 1, ("q_str", "unknown_attr"): 1}


def _routing_nodes(spark):
    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "«decl E1 type:T0 p_int=5 p_bool=true p_enum=kind:Unit.V1»", None),
            ("c1", 1, "tool", "«about E1 q_int=9 zz_custom=x»", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    return P.build_graph(t).nodes


def test_profile_routing_observed_wins_when_legal(spark):
    """The two-step election (cimexport.py:180-287): an observed
    profile that is active AND in the possible list is honored;
    attributes whose elected profile differs from the class's carry
    is_about (the rdf:about split)."""
    from cimpy_spark.operators.schema import route_to_profiles

    routed = {
        r["attr"]: (r["export_profile"], r["is_about"])
        for r in route_to_profiles(
            _routing_nodes(spark), fixture_schema(spark)
        ).collect()
    }
    # q_int possible [assistant, tool], observed tool (legal) → tool,
    # split into the tool file as rdf:about (class lives in user)
    assert routed["q_int"] == ("tool", True)
    assert routed["p_int"] == ("user", False)
    assert routed["zz_custom"] == ("tool", True)  # unknown keeps provenance
    assert routed["rdf_type"] == ("user", False)  # the class declaration


def test_profile_routing_deactivation_reroutes(spark):
    """Deactivating a profile re-elects by priority: with 'tool'
    inactive, q_int (observed on tool) reroutes to 'assistant' (its
    min-priority active possible profile) and the unknown zz_custom
    (observed provenance inactive) is skipped for export."""
    from cimpy_spark.operators.schema import route_to_profiles

    routed = {
        r["attr"]: (r["export_profile"], r["is_about"])
        for r in route_to_profiles(
            _routing_nodes(spark),
            fixture_schema(spark),
            ["user", "assistant", "system"],
        ).collect()
    }
    assert routed["q_int"] == ("assistant", True)
    assert "zz_custom" not in routed
    assert routed["p_int"] == ("user", False)


def test_profile_routing_class_skip_and_about_split(spark):
    """T2's class can only serialize to 'system': with system inactive
    the entity is skipped entirely (reference `continue`,
    cimexport.py:216-219); with system active the class lands there
    and its user-profile attributes split out as rdf:about rows."""
    from cimpy_spark.operators.schema import (
        ACTIVE_EXPORT_PROFILES,
        route_to_profiles,
    )

    t = _cast(spark).sparkSession.createDataFrame(
        [("c1", 0, "user", "«decl E9 type:T2 p_int=5 p_bool=true p_enum=kind:Unit.V1»", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    nodes = P.build_graph(t).nodes
    schema = fixture_schema(spark)
    assert route_to_profiles(nodes, schema, ACTIVE_EXPORT_PROFILES).count() == 0
    routed = {
        r["attr"]: (r["export_profile"], r["is_about"])
        for r in route_to_profiles(nodes, schema).collect()
    }
    assert routed["rdf_type"] == ("system", False)
    assert routed["p_int"] == ("user", True)  # about-block in the user file


def test_multivalued_attrs_append_with_dedupe(spark):
    """q_str is declared 0..*: ALL distinct observed values survive in
    the many-valued view (sorted, deduped), while the elected-scalar
    nodes view keeps last-wins — multiplicity dispatch at view time
    (reference dispatch cimimport.py:290-311)."""
    from cimpy_spark.operators.schema import fixture_schema, multivalued_attrs

    t = _cast(spark).sparkSession.createDataFrame(
        [
            ("c1", 0, "user", "«decl E1 type:T0 p_int=1 p_bool=true p_enum=kind:Unit.V0»", None),
            ("c1", 1, "assistant", "«about E1 q_str=sA»", None),
            ("c1", 2, "assistant", "«about E1 q_str=sC» «about E1 q_str=sA»", None),
            ("c1", 3, "assistant", "«about E1 q_str=sB q_int=7»", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    g = P.build_graph(t)
    rows = {
        (r["entity_id"], r["attr"]): (r["attr_values"], r["n_values"])
        for r in multivalued_attrs(g.triples, g.cmap, fixture_schema(spark)).collect()
    }
    # deduped, sorted, all three values — only the 0..* attr appears
    assert rows == {("E1", "q_str"): ("sA,sB,sC", 3)}
    # the scalar view still elects last-wins for the same attr
    scalar = {
        r["attr"]: r["value"]
        for r in g.nodes.filter(F.col("entity_id") == "E1").collect()
    }
    assert scalar["q_str"] == "sB"


def test_multiplicity_violation_counted(spark):
    """A 0..1 reference ('controls') resolving to two distinct targets
    is a counted violation (reference dispatch cimimport.py:290-311);
    0..* references ('connects_to') with the same fan-out are not."""
    from cimpy_spark.operators.schema import multiplicity_violations

    t = _cast(spark).sparkSession.createDataFrame(
        [
            ("c1", 0, "user", "«decl E1 type:T0 p_int=1 p_bool=true p_enum=kind:Unit.V0»", None),
            ("c1", 1, "user", "«decl E2 type:T1 p_int=1 p_bool=true p_enum=kind:Unit.V0»", None),
            ("c1", 2, "user", "«decl E3 type:T2 p_int=1 p_bool=true p_enum=kind:Unit.V0»", None),
            ("c1", 3, "user", "«rel E1 controls E2» «rel E1 controls E3»", None),
            ("c1", 4, "user", "«rel E1 connects_to E2» «rel E1 connects_to E3»", None),
            ("c1", 5, "user", "«rel E2 controls E3»", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    g = P.build_graph(t)
    rows = [
        (r["entity_id"], r["type"], r["attr"], r["multiplicity"], r["n_targets"])
        for r in multiplicity_violations(
            g.canon_edges, g.nodes, fixture_schema(spark)
        ).collect()
    ]
    assert rows == [("E1", "T0", "controls", "0..1", 2)]


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
