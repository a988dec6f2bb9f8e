"""Schema-as-data: a versioned broadcast schema table drives typed
casts, defaults, and unknown-attribute quarantine.

The reference encodes its type system in 600+ generated classes — one
Python class per CIM type with per-attribute dtypes and defaults
(cimpy/cgmes_v2_4_15/ACLineSegment.py:21-48, Base.py:25-46), cast
machinery in the import loop (cimpy/cimimport.py:255-273), enum-URL
domains (cimpy/cimimport.py:334-345), and unknown-element skip+count
(cimpy/cimimport.py:243-249). SURVEY §1.3's re-design replaces the
class zoo with ONE broadcast table::

    (type, attr, dtype, multiplicity, default_value, enum_domain,
     profiles)

so adding an attribute is a data change, not a code change. The cast
stage is a broadcast join + pure column expressions — whole-stage
codegen, no Python.

Semantics (each mirrored in the DuckDB oracle):

- (type, attr) found & value casts        → status 'observed'
- (type, attr) found & cast fails         → 'bad_literal' (quarantine;
  e.g. an enum value outside the domain ≙ an enum URL missing from
  the reference's URL dict)
- (type, attr) not in schema              → 'unknown_attr' (skip +
  count, never an error — cimpy/cimimport.py:243-249)
- schema attr with a default, never observed-with-valid-value
  → 'default' row materialized (class-default semantics: the default
  survives until a successful assignment)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_COLS = (
    "type string, attr string, dtype string, multiplicity string, "
    "default_value string, enum_domain array<string>, profiles array<string>"
)

# Export-priority order of the fixture's profiles — the analog of the
# reference's Profile enum values (EQ=0 < SSH=1 < TP=2 < SV=3,
# cimpy/cgmes_v2_4_15/Base.py:25-38): lower number = elected first.
PROFILE_PRIORITY: dict[str, int] = {
    "user": 0,
    "assistant": 1,
    "tool": 2,
    "system": 3,
}

# The fixture grammar's schema, versioned in-code the way a deployment
# would version it in a catalog table. q_str is deliberately NOT
# declared for T3/T4 (exercises unknown-attr), V2 is deliberately
# outside the Unit enum domain (exercises bad-literal), and p_rated is
# declared but never planted (exercises defaults). `profiles` is the
# POSSIBLE-profile list per class/attribute (multi-valued so the
# min-priority election is non-trivial); the '__class__' row carries
# the class's own possible profiles (the reference's
# possibleProfileList[klass]['class']). Reference predicates are
# declared dtype 'ref' with their multiplicity ('controls' is 0..1 so
# a second distinct target is a counted violation; the rest are 0..*
# append-with-dedupe, cimpy/cimimport.py:290-311).
_FIXTURE_ROWS = []
for _t in ["T0", "T1", "T2", "T3", "T4"]:
    _FIXTURE_ROWS += [
        # T2's class can only serialize to 'system' (exercises the
        # class-skip when 'system' is deactivated and the rdf:about
        # split when it is active); other classes live in 'user'.
        (_t, "__class__", "class", None, None, None,
         ["system"] if _t == "T2" else ["user", "system"]),
        (_t, "p_int", "int", "1..1", "0", None, ["user", "tool"]),
        (_t, "p_bool", "boolean", "1..1", "false", None, ["user"]),
        (_t, "p_enum", "enum", "1..1", "V0", ["V0", "V1"], ["user"]),
        (_t, "q_int", "int", "0..1", None, None, ["assistant", "tool"]),
        (_t, "p_rated", "double", "0..1", "1.5", None, ["user"]),
        (_t, "connects_to", "ref", "0..*", None, None, ["user"]),
        (_t, "feeds", "ref", "0..*", None, None, ["user"]),
        (_t, "controls", "ref", "0..1", None, None, ["user"]),
    ]
    if _t in ("T0", "T1", "T2"):
        # q_str is declared MANY-valued (0..*): the elected-scalar
        # `nodes` view keeps last-wins for it, but the 0..* read path
        # is `multivalued_attrs` (append-with-dedupe, all values)
        _FIXTURE_ROWS.append(
            (_t, "q_str", "string", "0..*", None, None, ["assistant"])
        )


def fixture_schema(spark: SparkSession) -> DataFrame:
    """The fixture's schema table (in production: read from a
    catalog / Iceberg table and broadcast — identical plumbing)."""
    return spark.createDataFrame(_FIXTURE_ROWS, SCHEMA_COLS)


def _entity_types(nodes: DataFrame) -> DataFrame:
    """(entity_id, type) from the elected rdf_type rows — the shared
    type-attachment input for every schema-driven stage."""
    return nodes.filter(F.col("attr") == "rdf_type").select(
        "entity_id", F.col("value").alias("type")
    )


def _cast_ok(dtype, enum_domain, value):
    """Portable cast-validity predicate per dtype (TRY_CAST analog)."""
    return (
        F.when(dtype == "int", F.expr("try_cast(value AS int)").isNotNull())
        .when(dtype == "double", F.expr("try_cast(value AS double)").isNotNull())
        .when(dtype == "boolean", value.isin("true", "false"))
        .when(dtype == "enum", F.array_contains(enum_domain, value))
        .otherwise(F.lit(True))  # string accepts any literal
    )


def schema_cast(nodes: DataFrame, schema_df: DataFrame) -> DataFrame:
    """Apply the schema table to elected node attributes.

    `nodes`: long-format canonical attributes (entity_id, attr, value,
    profile) including the rdf_type rows. `schema_df`: the broadcast
    schema table. Output long-format status rows::

        (entity_id, type, attr, value, dtype, status)

    with status ∈ observed | bad_literal | unknown_attr | default and
    `num_value` carrying the actual numeric cast for int/double attrs
    (the reference's setattr-with-cast, cimpy/cimimport.py:255-273).

    Plan shape: one broadcast join against the schema (tiny by
    construction — schemas are O(types × attrs), not O(data)), one
    broadcast anti-join for defaults; everything else is narrow.
    """
    types = _entity_types(nodes)
    attrs = (
        nodes.filter(F.col("attr") != "rdf_type")
        .select("entity_id", "attr", "value")
        .join(types, "entity_id")
    )
    joined = attrs.join(F.broadcast(schema_df), ["type", "attr"], "left")
    ok = _cast_ok(F.col("dtype"), F.col("enum_domain"), F.col("value"))
    observed = joined.select(
        "entity_id",
        "type",
        "attr",
        "value",
        "dtype",
        F.when(F.col("dtype").isNull(), F.lit("unknown_attr"))
        .when(~ok, F.lit("bad_literal"))
        .otherwise(F.lit("observed"))
        .alias("status"),
    )

    # defaults: schema attrs with a default, no valid observed value
    # for that (entity, attr)
    ent_schema = types.join(
        F.broadcast(schema_df.filter(F.col("default_value").isNotNull())),
        "type",
    )
    valid_keys = observed.filter(F.col("status") == "observed").select(
        "entity_id", "attr"
    )
    defaults = ent_schema.join(valid_keys, ["entity_id", "attr"], "left_anti").select(
        "entity_id",
        "type",
        "attr",
        F.col("default_value").alias("value"),
        "dtype",
        F.lit("default").alias("status"),
    )

    out = observed.unionByName(defaults)
    return out.select(
        "entity_id",
        "type",
        "attr",
        "value",
        "dtype",
        "status",
        F.when(
            F.col("dtype").isin("int", "double") & F.col("status").isin("observed", "default"),
            F.expr("try_cast(value AS double)"),
        ).alias("num_value"),
    )


def suppress_defaults(nodes: DataFrame, schema_df: DataFrame) -> DataFrame:
    """EXPORT-side default suppression: drop attribute rows whose value
    equals the schema default for their (type, attr) — the reference
    never serializes default-valued attributes
    (cimpy/cimexport.py:101-107 drops '', None, 0.0, 0, 'list').
    rdf_type rows, attrs without a schema default, and NULL values
    pass through. Numeric dtypes compare by VALUE (0.0 == '0' — the
    reference drops numerically-default attrs regardless of the
    literal's spelling); others compare as strings. One corpus join to
    attach entity types + one broadcast schema join + a filter."""
    joined = nodes.join(_entity_types(nodes), "entity_id").join(
        F.broadcast(schema_df.select("type", "attr", "dtype", "default_value")),
        ["type", "attr"],
        "left",
    )
    numeric = F.col("dtype").isin("int", "double")
    eq = F.coalesce(
        F.when(
            numeric,
            F.expr("try_cast(value AS double)")
            == F.expr("try_cast(default_value AS double)"),
        ).otherwise(F.col("value") == F.col("default_value")),
        F.lit(False),
    )
    return joined.filter(
        F.col("default_value").isNull() | ~eq
    ).select("entity_id", "attr", "value", "profile")


# The active-profile set used by the driver-gated `kg_profile_routing`
# query: 'system' deliberately DEactivated so the election is
# non-trivial — T2's class (possible ['system'] only) is skipped
# entirely and attrs observed on system turns re-elect by priority.
ACTIVE_EXPORT_PROFILES = ["user", "assistant", "tool"]


def _elect_expr(observed, possible, active: list[str]):
    """Two-step serialization-profile election (the reference's
    attribute/class resolution, cimpy/cimexport.py:180-287):

    1. the OBSERVED profile wins iff it is active AND in the possible
       list (an imported origin is honored when legal);
    2. otherwise the min-PRIORITY active profile from the possible
       list (possibleProfileList.sort() + first-active,
       priorities cimpy/cgmes_v2_4_15/Base.py:25-38);
    3. NULL when no possible profile is active → the row is skipped
       for export (the reference's `continue`).

    Pure column expressions over the broadcast schema row — the
    priority map is a literal, the election a filter+sort over a
    ≤4-element array."""
    prio = F.create_map(
        *[F.lit(x) for kv in PROFILE_PRIORITY.items() for x in kv]
    )
    active_arr = F.array(*[F.lit(p) for p in active])
    legal = F.filter(
        possible, lambda p: F.array_contains(active_arr, p)
    )
    # F.get (0-indexed) returns NULL on an empty array — element_at
    # raises under ANSI mode (Spark 4 default)
    elected_min = F.get(
        F.array_sort(
            F.transform(legal, lambda p: F.struct(prio[p].alias("k"), p.alias("p")))
        ),
        0,
    )["p"]
    observed_ok = F.array_contains(active_arr, observed) & F.array_contains(
        possible, observed
    )
    return F.when(possible.isNull(), F.lit(None)).otherwise(
        F.when(observed_ok, observed).otherwise(elected_min)
    )


def route_to_profiles(
    nodes: DataFrame,
    schema_df: DataFrame,
    active_profiles: list[str] | None = None,
) -> DataFrame:
    """Export-side profile routing with min-priority election over the
    ACTIVE profile set and the rdf:about split (the reference's export
    partitioning, cimpy/cimexport.py:180-287):

    - each CLASS elects its serialization profile from its
      '__class__' possible list (observed declaration profile first,
      then min-priority active); a class with no active possible
      profile is skipped entirely — its attributes do not export;
    - each ATTRIBUTE elects its own profile the same way; an
      attribute with no active possible profile is skipped;
    - attributes the schema doesn't know keep their observed
      provenance (counted as unknown by the cast stage, exported
      in place);
    - ``is_about`` = the attribute's elected profile differs from its
      class's — the row serializes as an rdf:about block in the OTHER
      profile's file (reference about_dict, cimexport.py:283-287);
      rdf_type rows are the class declaration itself (never about).

    Output: (entity_id, attr, value, export_profile, is_about) — the
    (export_profile, is_about) pair is the partition key of a
    profile-routed export sink. One corpus join to attach entity
    types + two broadcast schema joins (class row, attr row).
    """
    active = (
        sorted(PROFILE_PRIORITY) if active_profiles is None else list(active_profiles)
    )
    class_rows = schema_df.filter(F.col("attr") == "__class__").select(
        "type", F.col("profiles").alias("class_possible")
    )
    attr_rows = schema_df.filter(F.col("attr") != "__class__").select(
        "type", "attr", F.col("profiles").alias("attr_possible")
    )
    # class election needs the OBSERVED declaration profile = the
    # profile of the entity's elected rdf_type row
    class_obs = nodes.filter(F.col("attr") == "rdf_type").select(
        "entity_id", F.col("value").alias("type"), F.col("profile").alias("class_observed")
    )
    class_elected = class_obs.join(F.broadcast(class_rows), "type", "left").select(
        "entity_id",
        "type",
        _elect_expr(
            F.col("class_observed"), F.col("class_possible"), active
        ).alias("class_profile"),
    )
    # classes with no active possible profile are skipped entirely
    kept = class_elected.filter(F.col("class_profile").isNotNull())

    routed = (
        nodes.join(kept, "entity_id")
        .join(F.broadcast(attr_rows), ["type", "attr"], "left")
        .select(
            "entity_id",
            "attr",
            "value",
            F.when(
                F.col("attr") == "rdf_type", F.col("class_profile")
            ).otherwise(
                F.coalesce(
                    _elect_expr(F.col("profile"), F.col("attr_possible"), active),
                    # unknown attr: keep observed provenance iff active
                    F.when(
                        F.col("attr_possible").isNull()
                        & F.col("profile").isin(active),
                        F.col("profile"),
                    ),
                )
            ).alias("export_profile"),
            "class_profile",
        )
        .filter(F.col("export_profile").isNotNull())
        .select(
            "entity_id",
            "attr",
            "value",
            "export_profile",
            (F.col("export_profile") != F.col("class_profile")).alias("is_about"),
        )
    )
    return routed


def multiplicity_violations(
    canon_edges: DataFrame, nodes: DataFrame, schema_df: DataFrame
) -> DataFrame:
    """Enforce the schema's declared reference multiplicity.

    The reference dispatches per attribute on multiplicity: 0..1
    overwrites, 0..* appends-with-dedupe (cimpy/cimimport.py:290-311).
    Edges here already get set semantics (append-with-dedupe); this
    check makes the 0..1 contract REAL: a canonical entity holding
    more than one distinct resolved target for a 0..1 / 1..1 reference
    is a counted violation (A1-style accounting, never an error —
    cimpy/cimimport.py:41-66).

    Output: (entity_id, type, attr, multiplicity, n_targets) for each
    violating (entity, reference). Plan: one grouped distinct-count
    over edges (shuffles on the src key the graph is already
    partitioned by), one corpus join to attach types, one broadcast
    schema join — the filter to declared-single refs happens on the
    broadcast side, so only violating groups survive to the join."""
    single_refs = schema_df.filter(
        (F.col("dtype") == "ref") & F.col("multiplicity").isin("0..1", "1..1")
    ).select("type", F.col("attr"), "multiplicity")
    fanout = (
        canon_edges.groupBy(F.col("src").alias("entity_id"), F.col("pred").alias("attr"))
        .agg(F.countDistinct("dst").alias("n_targets"))
        .filter(F.col("n_targets") > 1)
    )
    return (
        fanout.join(_entity_types(nodes), "entity_id")
        .join(F.broadcast(single_refs), ["type", "attr"])
        .select("entity_id", "type", "attr", "multiplicity", "n_targets")
    )


def multivalued_attrs(
    triples: DataFrame, cmap: DataFrame, schema_df: DataFrame
) -> DataFrame:
    """The 0..* read path for literal/enum attributes — the
    reference's list-typed attributes appended with dedupe
    (cimpy/cimimport.py:290-311 dispatches per multiplicity: 0..1
    overwrites, 0..* appends). The canonical store here is the
    long-format triple set, so multiplicity dispatch happens at VIEW
    time: `canonical_nodes` is the elected-scalar (0..1) view, THIS
    is the many-valued one — per (canonical entity, 0..*-declared
    attr), ALL distinct observed values as a sorted ','-joined string
    (scalar columns only, comparator-hashable like `adjacency`).

    Plan: triples → cmap join (the same canonical rewrite every view
    does) → broadcast semi-join against the schema's 0..* attr list →
    one hash aggregation. Output: (entity_id, type, attr,
    attr_values, n_values)."""
    multi = schema_df.filter(
        (F.col("dtype") != "ref") & (F.col("multiplicity") == "0..*")
    ).select("type", "attr")
    vals = (
        triples.filter(F.col("obj_kind").isin("literal", "enum"))
        .join(cmap.withColumnRenamed("entity_id", "subj"), "subj")
        .select(
            F.col("canonical_id").alias("entity_id"),
            F.col("pred").alias("attr"),
            F.col("obj").alias("value"),
        )
    )
    typed = vals.join(_entity_types_from(cmap, triples), "entity_id")
    return (
        typed.join(F.broadcast(multi), ["type", "attr"])
        .groupBy("entity_id", "type", "attr")
        .agg(
            F.array_join(F.sort_array(F.collect_set("value")), ",").alias(
                "attr_values"
            ),
            F.countDistinct("value").alias("n_values"),
        )
    )


def _entity_types_from(cmap: DataFrame, triples: DataFrame) -> DataFrame:
    """(canonical entity_id, type) derived from the declaration
    triples — first-wins type per canonical entity (the reference
    instantiates once per rdf:ID, cimimport.py:141)."""
    key = F.struct("conv_id", "turn_idx", "mention_idx")
    return (
        triples.filter(F.col("obj_kind") == "type")
        .join(cmap.withColumnRenamed("entity_id", "subj"), "subj")
        .groupBy(F.col("canonical_id").alias("entity_id"))
        .agg(F.min_by("obj", key).alias("type"))
    )


def schema_quarantine_counts(cast_df: DataFrame) -> DataFrame:
    """A1-style grouped accounting of what the cast stage skipped
    (cimpy/cimimport.py:41-66,243-249): (attr, status, n)."""
    return (
        cast_df.filter(F.col("status").isin("bad_literal", "unknown_attr"))
        .groupBy("attr", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def schema_table_sql() -> str:
    """The SAME schema rows as a DuckDB VALUES CTE body — the oracle
    builds its expectation from the identical table."""
    rows = []
    for t, attr, dtype, mult, dflt, domain, profiles in _FIXTURE_ROWS:
        mult_sql = "NULL" if mult is None else f"'{mult}'"
        dflt_sql = "NULL" if dflt is None else f"'{dflt}'"
        dom_sql = (
            "NULL"
            if domain is None
            else "[" + ", ".join(f"'{v}'" for v in domain) + "]"
        )
        prof_sql = "[" + ", ".join(f"'{p}'" for p in profiles) + "]"
        rows.append(
            f"('{t}', '{attr}', '{dtype}', {mult_sql}, {dflt_sql}, "
            f"{dom_sql}, {prof_sql})"
        )
    return (
        "schema_t(type, attr, dtype, multiplicity, default_value, "
        "enum_domain, profiles) AS (VALUES "
        + ", ".join(rows)
        + ")"
    )


def _priority_sql() -> str:
    rows = ", ".join(f"('{p}', {k})" for p, k in PROFILE_PRIORITY.items())
    return f"prio(profile, pri) AS (VALUES {rows})"


def _active_sql(active: list[str]) -> str:
    rows = ", ".join(f"('{p}')" for p in active)
    return f"active(profile) AS (VALUES {rows})"


# shared (type-per-entity) CTE for the oracle builders below
_ETYPES_SQL = """
    , etypes AS (
      SELECT entity_id, value AS type FROM nodes WHERE attr = 'rdf_type'
    )
"""


def default_suppression_oracle_sql(pipeline_ctes: str) -> str:
    """DuckDB oracle for `kg_default_suppression`."""
    return (
        pipeline_ctes
        + ", "
        + schema_table_sql()
        + _ETYPES_SQL + """
    SELECT n.entity_id, n.attr, n.value, n.profile
    FROM nodes n
    JOIN etypes t USING (entity_id)
    LEFT JOIN schema_t s ON s.type = t.type AND s.attr = n.attr
    WHERE s.default_value IS NULL OR NOT COALESCE(
      CASE WHEN s.dtype IN ('int', 'double')
           THEN TRY_CAST(n.value AS DOUBLE) = TRY_CAST(s.default_value AS DOUBLE)
           ELSE n.value = s.default_value END, FALSE)
    """
    )


def profile_routing_oracle_sql(
    pipeline_ctes: str, active_profiles: list[str] | None = None
) -> str:
    """DuckDB oracle for `kg_profile_routing` — the same two-step
    election over the identical schema/priority/active VALUES tables."""
    active = (
        sorted(PROFILE_PRIORITY) if active_profiles is None else list(active_profiles)
    )
    return (
        pipeline_ctes
        + ", "
        + schema_table_sql()
        + ", "
        + _priority_sql()
        + ", "
        + _active_sql(active)
        + """
    , class_obs AS (
      SELECT entity_id, value AS type, profile AS class_observed
      FROM nodes WHERE attr = 'rdf_type'
    ),
    class_cand AS (
      SELECT co.entity_id, co.type, co.class_observed, u.p AS cand, pr.pri
      FROM class_obs co
      JOIN schema_t cs ON cs.type = co.type AND cs.attr = '__class__',
      UNNEST(cs.profiles) AS u(p)
      JOIN prio pr ON pr.profile = u.p
      JOIN active a ON a.profile = u.p
    ),
    class_elect AS (
      SELECT entity_id, any_value(type) AS type,
             CASE WHEN max(CASE WHEN cand = class_observed THEN 1 ELSE 0 END) = 1
                  THEN any_value(class_observed)
                  ELSE arg_min(cand, pri) END AS class_profile
      FROM class_cand GROUP BY entity_id
    ),
    attr_cand AS (
      SELECT s.type, s.attr, u.p AS cand, pr.pri
      FROM schema_t s, UNNEST(s.profiles) AS u(p)
      JOIN prio pr ON pr.profile = u.p
      JOIN active a ON a.profile = u.p
      WHERE s.attr <> '__class__'
    ),
    attr_elect AS (
      SELECT type, attr, arg_min(cand, pri) AS min_cand, list(cand) AS cands
      FROM attr_cand GROUP BY type, attr
    ),
    attr_known AS (
      SELECT DISTINCT type, attr FROM schema_t WHERE attr <> '__class__'
    ),
    routed AS (
      SELECT n.entity_id, n.attr, n.value, ce.class_profile,
             CASE WHEN n.attr = 'rdf_type' THEN ce.class_profile
                  WHEN ak.attr IS NOT NULL THEN
                    CASE WHEN COALESCE(list_contains(ae.cands, n.profile), FALSE)
                         THEN n.profile ELSE ae.min_cand END
                  WHEN n.profile IN (SELECT profile FROM active) THEN n.profile
                  ELSE NULL END AS export_profile
      FROM nodes n
      JOIN class_elect ce USING (entity_id)
      LEFT JOIN attr_known ak ON ak.type = ce.type AND ak.attr = n.attr
      LEFT JOIN attr_elect ae ON ae.type = ce.type AND ae.attr = n.attr
      WHERE ce.class_profile IS NOT NULL
    )
    SELECT entity_id, attr, value, export_profile,
           export_profile <> class_profile AS is_about
    FROM routed WHERE export_profile IS NOT NULL
    """
    )


def multivalued_oracle_sql(pipeline_ctes: str) -> str:
    """DuckDB oracle for `kg_multivalued_attrs` — all distinct values
    per (canonical entity, 0..*-declared literal/enum attr)."""
    return (
        pipeline_ctes
        + ", "
        + schema_table_sql()
        + _ETYPES_SQL + """
    , mv AS (
      SELECT DISTINCT c.canonical_id AS entity_id, tr.pred AS attr,
             tr.obj AS value
      FROM triples tr
      JOIN cmap c ON tr.subj = c.entity_id
      WHERE tr.obj_kind IN ('literal', 'enum')
    )
    SELECT v.entity_id, t.type, v.attr,
           string_agg(v.value, ',' ORDER BY v.value) AS attr_values,
           count(*) AS n_values
    FROM mv v
    JOIN etypes t USING (entity_id)
    JOIN schema_t s ON s.type = t.type AND s.attr = v.attr
         AND s.dtype <> 'ref' AND s.multiplicity = '0..*'
    GROUP BY v.entity_id, t.type, v.attr
    """
    )


def multiplicity_oracle_sql(pipeline_ctes: str) -> str:
    """DuckDB oracle for `kg_multiplicity_check`: 0..1 references with
    more than one distinct resolved target per canonical entity."""
    return (
        pipeline_ctes
        + ", "
        + schema_table_sql()
        + _ETYPES_SQL + """
    SELECT t.entity_id, t.type, e.pred AS attr, s.multiplicity,
           count(DISTINCT e.dst) AS n_targets
    FROM canon_edges e
    JOIN etypes t ON t.entity_id = e.src
    JOIN schema_t s ON s.type = t.type AND s.attr = e.pred
         AND s.dtype = 'ref' AND s.multiplicity IN ('0..1', '1..1')
    GROUP BY t.entity_id, t.type, e.pred, s.multiplicity
    HAVING count(DISTINCT e.dst) > 1
    """
    )


def schema_cast_oracle_sql(pipeline_ctes: str) -> str:
    """DuckDB oracle for `kg_schema_cast` over the shared pipeline
    CTEs (nodes = elected canonical attributes)."""
    return (
        pipeline_ctes
        + ", "
        + schema_table_sql()
        + """
    , etypes AS (
      SELECT entity_id, value AS type FROM nodes WHERE attr = 'rdf_type'
    ),
    eattrs AS (
      SELECT n.entity_id, t.type, n.attr, n.value
      FROM nodes n JOIN etypes t USING (entity_id)
      WHERE n.attr <> 'rdf_type'
    ),
    obs AS (
      SELECT a.entity_id, a.type, a.attr, a.value, s.dtype,
             CASE
               WHEN s.dtype IS NULL THEN 'unknown_attr'
               WHEN s.dtype = 'int' AND TRY_CAST(a.value AS INT) IS NULL THEN 'bad_literal'
               WHEN s.dtype = 'double' AND TRY_CAST(a.value AS DOUBLE) IS NULL THEN 'bad_literal'
               WHEN s.dtype = 'boolean' AND a.value NOT IN ('true', 'false') THEN 'bad_literal'
               WHEN s.dtype = 'enum' AND NOT list_contains(s.enum_domain, a.value) THEN 'bad_literal'
               ELSE 'observed'
             END AS status
      FROM eattrs a
      LEFT JOIN schema_t s ON s.type = a.type AND s.attr = a.attr
    ),
    dflt AS (
      SELECT t.entity_id, t.type, s.attr, s.default_value AS value,
             s.dtype, 'default' AS status
      FROM etypes t
      JOIN schema_t s ON s.type = t.type AND s.default_value IS NOT NULL
      WHERE NOT EXISTS (
        SELECT 1 FROM obs o
        WHERE o.entity_id = t.entity_id AND o.attr = s.attr
          AND o.status = 'observed'
      )
    ),
    unioned AS (SELECT * FROM obs UNION ALL SELECT * FROM dflt)
    SELECT entity_id, type, attr, value, dtype, status,
           CASE WHEN dtype IN ('int', 'double') AND status IN ('observed', 'default')
                THEN TRY_CAST(value AS DOUBLE) END AS num_value
    FROM unioned
    """
    )


# --------------------------------------------------------------------------
# Class hierarchy / type closure
# --------------------------------------------------------------------------

# The fixture grammar's subClassOf forest — the analog of the
# reference's generated class INHERITANCE (every cimgen class extends
# another, e.g. Breaker → ProtectedSwitch → Switch → ConductingEquipment,
# cimpy/cgmes_v2_4_15/Breaker.py:4-9); SURVEY §1.3 maps that zoo to
# broadcast tables, and this is the inheritance slice. Depth 3 on the
# T2 chain so the closure is non-trivially transitive; T4 roots under
# Thing OUTSIDE the T0 family so range_conformance's 'violation'
# branch is live on the fixture (T4 targets of a T0-dominant pred).
_HIERARCHY_ROWS: list[tuple[str, str]] = [
    ("T0", "Thing"),
    ("T1", "T0"),
    ("T2", "T1"),
    ("T3", "T1"),
    ("T4", "Thing"),
]


def fixture_class_hierarchy(spark: SparkSession) -> DataFrame:
    """The fixture's (child, parent) subClassOf table (in production:
    the ontology slice of the catalog, broadcast like the schema)."""
    return spark.createDataFrame(_HIERARCHY_ROWS, "child string, parent string")


def hierarchy_table_sql() -> str:
    """The SAME hierarchy rows as a DuckDB VALUES CTE body."""
    rows = ", ".join(f"('{c}', '{p}')" for c, p in _HIERARCHY_ROWS)
    return f"sub(child, parent) AS (VALUES {rows})"


def type_closure(
    entities: DataFrame, hierarchy: DataFrame, max_doublings: int = 10
) -> DataFrame:
    """RDFS-style rdf:type closure: every (entity, ancestor class)
    pair implied by subClassOf transitivity, with the hop distance.
    Output: (entity_id, type, is_a, depth) — depth 0 is the declared
    class itself (rdfs:subClassOf is reflexive on the instance view),
    depth k an ancestor k edges up. A KG consumer queries "all
    Switches" and gets Breakers for free — the query-side inheritance
    the reference gets from Python's `isinstance`.

    Scale shape: the ontology is catalog-sized (hundreds to thousands
    of classes — NOT data-sized), so the closure is computed on that
    tiny table by iterative DOUBLING (closure ∘ closure, O(log depth)
    rounds rather than depth rounds) and then broadcast-joined to the
    entity dictionary — the instance table is touched exactly once,
    with no iteration over data-scale rows. DAGs are supported
    (multiple parents dedupe to min depth). Cycles DO converge under
    the min-depth dedupe (a cycle's min-depth closure is finite), so
    they are detected explicitly: any class that becomes its own
    ancestor fails loud; `max_doublings` only guards ontologies
    deeper than 2^max_doublings."""
    closure = subclass_closure(hierarchy, max_doublings)
    self_rows = entities.select(
        "entity_id", "type", F.col("type").alias("is_a"),
        F.lit(0).alias("depth"),
    )
    inherited = entities.join(
        F.broadcast(closure), entities["type"] == closure["child"]
    ).select("entity_id", "type", "is_a", "depth")
    return self_rows.unionByName(inherited).select(
        "entity_id", "type", "is_a", F.col("depth").cast("int").alias("depth")
    )


def subclass_closure(
    hierarchy: DataFrame, max_doublings: int = 10
) -> DataFrame:
    """Transitive (child, is_a, depth≥1) closure of a subClassOf
    table by iterative doubling — see `type_closure` for the scale
    argument and cycle contract."""
    closure = hierarchy.select(
        "child", F.col("parent").alias("is_a"), F.lit(1).alias("depth")
    )
    for _ in range(max_doublings):
        hop = (
            closure.alias("x")
            .join(
                closure.alias("y"), F.col("x.is_a") == F.col("y.child")
            )
            .select(
                F.col("x.child").alias("child"),
                F.col("y.is_a").alias("is_a"),
                (F.col("x.depth") + F.col("y.depth")).alias("depth"),
            )
        )
        new = (
            closure.unionByName(hop)
            .groupBy("child", "is_a")
            .agg(F.min("depth").alias("depth"))
        )
        n_old, n_new = closure.count(), new.count()
        closure = new
        if n_new == n_old:
            break
    else:
        raise RuntimeError(
            f"type_closure did not converge in {max_doublings} doublings"
            " — ontology deeper than 2^max_doublings?"
        )
    if closure.filter(F.col("child") == F.col("is_a")).limit(1).count():
        raise RuntimeError("cyclic subClassOf hierarchy")
    return closure


def range_conformance(
    triples: DataFrame,
    entities: DataFrame,
    hierarchy: DataFrame,
    max_doublings: int = 10,
) -> DataFrame:
    """Ontology-aware range QA — the composition of schema induction
    and the subclass closure: for every (pred, target type) observed
    among RESOLVED references, classify the target against the
    pred's DOMINANT induced range — 'exact' (the dominant class
    itself), 'subclass' (a descendant: valid under RDFS range
    semantics — the check the reference gets implicitly from typed
    Python attributes accepting subclass instances), or 'violation'.
    Output: (pred, dom_range, dst_type, kind, n_edges) — the
    per-predicate QA report a noisy-extraction KG needs before
    trusting its edges.

    Scale shape: one resolved-refs pass joined once against the
    (broadcast) type dictionary, ONE (pred, dst_type) aggregation —
    at most |preds|×|types| rows — then dominant election and
    closure lookup happen on that tiny table (broadcast left join);
    instance data is scanned once and never re-shuffled."""
    dst_t = entities.select(
        F.col("entity_id").alias("dst"), F.col("type").alias("dst_type")
    )
    sig = (
        triples.filter(
            (F.col("obj_kind") == "ref") & (F.col("pred") != "sameAs")
        )
        .select("pred", F.col("obj").alias("dst"))
        .join(dst_t, "dst")
        .groupBy("pred", "dst_type")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    key = F.struct((-F.col("n_edges")).alias("nn"), F.col("dst_type"))
    dom = sig.groupBy("pred").agg(
        F.min_by("dst_type", key).alias("dom_range")
    )
    closure = subclass_closure(hierarchy, max_doublings).select(
        F.col("child").alias("dst_type"),
        F.col("is_a").alias("dom_range"),
        F.lit(True).alias("is_desc"),
    )
    return (
        sig.join(F.broadcast(dom), "pred")
        .join(F.broadcast(closure), ["dst_type", "dom_range"], "left")
        .select(
            "pred",
            "dom_range",
            "dst_type",
            F.when(F.col("dst_type") == F.col("dom_range"), F.lit("exact"))
            .when(F.col("is_desc"), F.lit("subclass"))
            .otherwise(F.lit("violation"))
            .alias("kind"),
            "n_edges",
        )
    )


HIERARCHY_CLOSURE_SQL = """
    anc AS (
      SELECT child, parent AS is_a, 1 AS depth FROM sub
      UNION
      SELECT a.child, s.parent, a.depth + 1
      FROM anc a JOIN sub s ON a.is_a = s.child
    ),
    closure AS (
      SELECT child, is_a, min(depth) AS depth FROM anc GROUP BY 1, 2
    )
"""


def range_conformance_oracle_sql(pipeline_ctes: str) -> str:
    """DuckDB oracle for `kg_range_conformance`: same hierarchy rows
    closed by path-extension recursion, dominant range via window
    rank, conformance kinds via the same CASE order."""
    return (
        pipeline_ctes
        + ", "
        + hierarchy_table_sql()
        + ","
        + HIERARCHY_CLOSURE_SQL
        + """
    , sig AS (
      SELECT tr.pred, en.type AS dst_type, count(*) AS n_edges
      FROM triples tr JOIN entities en ON tr.obj = en.entity_id
      WHERE tr.obj_kind = 'ref' AND tr.pred <> 'sameAs'
      GROUP BY 1, 2
    ),
    dom AS (
      SELECT pred, dst_type AS dom_range FROM (
        SELECT pred, dst_type, row_number() OVER (
          PARTITION BY pred ORDER BY n_edges DESC, dst_type
        ) AS rn FROM sig
      ) WHERE rn = 1
    )
    SELECT s.pred, d.dom_range, s.dst_type,
           CASE WHEN s.dst_type = d.dom_range THEN 'exact'
                WHEN c.child IS NOT NULL THEN 'subclass'
                ELSE 'violation' END AS kind,
           s.n_edges
    FROM sig s
    JOIN dom d ON s.pred = d.pred
    LEFT JOIN closure c
      ON c.child = s.dst_type AND c.is_a = d.dom_range
    """
    )


def type_closure_oracle_sql(pipeline_ctes: str) -> str:
    """DuckDB oracle for `kg_type_closure`: the SAME hierarchy rows
    closed by a recursive CTE (path-extension recursion — a different
    algorithm than the engine's doubling), min depth per (child,
    ancestor), joined to the entity dictionary + reflexive rows."""
    return (
        pipeline_ctes
        + ", "
        + hierarchy_table_sql()
        + """
    , anc AS (
      SELECT child, parent AS is_a, 1 AS depth FROM sub
      UNION
      SELECT a.child, s.parent, a.depth + 1
      FROM anc a JOIN sub s ON a.is_a = s.child
    ),
    closure AS (
      SELECT child, is_a, min(depth) AS depth FROM anc GROUP BY 1, 2
    )
    SELECT entity_id, type, type AS is_a, 0 AS depth FROM entities
    UNION ALL
    SELECT e.entity_id, e.type, c.is_a, c.depth
    FROM entities e JOIN closure c ON e.type = c.child
    """
    )
