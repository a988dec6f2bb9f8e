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

# The fixture grammar's schema, versioned in-code the way a deployment
# would version it in a catalog table. q_str is deliberately NOT
# declared for T3/T4 (exercises unknown-attr), V2 is deliberately
# outside the Unit enum domain (exercises bad-literal), and p_rated is
# declared but never planted (exercises defaults).
_FIXTURE_ROWS = []
for _t in ["T0", "T1", "T2", "T3", "T4"]:
    _FIXTURE_ROWS += [
        (_t, "p_int", "int", "1..1", "0", None, ["user"]),
        (_t, "p_bool", "boolean", "1..1", "false", None, ["user"]),
        (_t, "p_enum", "enum", "1..1", "V0", ["V0", "V1"], ["user"]),
        (_t, "q_int", "int", "0..1", None, None, ["assistant"]),
        (_t, "p_rated", "double", "0..1", "1.5", None, ["user"]),
    ]
    if _t in ("T0", "T1", "T2"):
        _FIXTURE_ROWS.append(
            (_t, "q_str", "string", "0..1", None, None, ["assistant"])
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
        .when(dtype == "boolean", value.isin("true", "false"))
        .when(dtype == "enum", F.array_contains(enum_domain, value))
        .otherwise(F.lit(True))  # string / double accept any literal
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


def route_to_profiles(nodes: DataFrame, schema_df: DataFrame) -> DataFrame:
    """Export-side profile routing: each attribute row is assigned the
    profile the SCHEMA designates for it (the reference resolves each
    attribute's serialization profile from the class model at export,
    cimpy/cimexport.py:258-287 — NOT from where the value was
    observed); attributes the schema doesn't know keep their observed
    provenance, and rdf_type rows stay with their declaration's
    profile. Output: (entity_id, attr, value, export_profile) — the
    partition key for a profile-routed export sink.

    One corpus join to attach entity types + one broadcast schema
    join."""
    routed = (
        nodes.join(_entity_types(nodes), "entity_id")
        .join(
            F.broadcast(
                schema_df.select(
                    "type", "attr", F.col("profiles")[0].alias("__route")
                )
            ),
            ["type", "attr"],
            "left",
        )
        .select(
            "entity_id",
            "attr",
            "value",
            F.coalesce("__route", "profile").alias("export_profile"),
        )
    )
    return routed


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
        dflt_sql = "NULL" if dflt is None else f"'{dflt}'"
        dom_sql = (
            "NULL"
            if domain is None
            else "[" + ", ".join(f"'{v}'" for v in domain) + "]"
        )
        rows.append(
            f"('{t}', '{attr}', '{dtype}', {dflt_sql}, {dom_sql}, '{profiles[0]}')"
        )
    return (
        "schema_t(type, attr, dtype, default_value, enum_domain, route) AS (VALUES "
        + ", ".join(rows)
        + ")"
    )


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


def profile_routing_oracle_sql(pipeline_ctes: str) -> str:
    """DuckDB oracle for `kg_profile_routing`."""
    return (
        pipeline_ctes
        + ", "
        + schema_table_sql()
        + _ETYPES_SQL + """
    SELECT n.entity_id, n.attr, n.value,
           COALESCE(s.route, n.profile) AS export_profile
    FROM nodes n
    JOIN etypes t USING (entity_id)
    LEFT JOIN schema_t s ON s.type = t.type AND s.attr = n.attr
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
