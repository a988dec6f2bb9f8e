"""Deterministic transcript fixture derived from the driver's `events`
table, and its exact SQL oracle.

The KG pipeline's input shape (per BASELINE.json `input_hint`) is a
table of multi-turn transcripts ``(conv_id, turn_idx, role, text,
tool, ts)``. This module synthesizes that table **deterministically**
from the driver-provided ``events`` parquet using only arithmetic on
``event_id``/``user_id`` — the same formula is expressible in Spark
SQL and DuckDB SQL, so an independent oracle can (a) reproduce the
transcripts byte-for-byte and (b) derive the *expected* triples
directly from the event columns without parsing text. Any bug in the
Arrow-UDF regex extraction therefore shows up as a value-hash
mismatch.

The planted mention grammar mirrors the reference's RDF phenomena
(FIXTURES.md §1):

- ``«decl E<k> type:T<t> p_int=.. p_bool=.. p_enum=kind:Unit.V<n>»``
  ≙ ``rdf:ID`` declaration with typed literals + enum URL
  (reference: cimpy/cimimport.py:118,254-273,334-345)
- ``«about E<k> q_str=.. q_int=..»`` ≙ ``rdf:about`` cross-profile
  update (cimpy/cimimport.py:215-231)
- ``«rel E<i> <pred> E<j>»`` ≙ ``rdf:resource="#id"`` reference,
  including dangling targets ``X<n>`` (cimpy/cimimport.py:277-300)
- ``«same E<i> E<j>»`` ≙ transitive same-entity link driving
  canonicalization (generalizes cimpy's cross-profile object merge)
- ``«unk z<n>»`` ≙ unknown class/attr, skipped with counted warning
  (cimpy/cimimport.py:127-135)

Entity-id space is ``E0..E210`` (mod 211, prime): at every test scale
all entities referenced via ``E<j>`` are also declared, so the only
dangling references are the explicit ``X<n>`` ones — keeps the oracle
closed-form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_ENT = 211  # prime entity-id space


def _text_sql(idiv: str) -> str:
    """The planted `text` column as a SQL expression over `event_id`.

    `idiv` is the integer-division operator: `div` (Spark), `//` (DuckDB).
    """
    d = f"(event_id {idiv} 4)"
    ent = f"CAST(event_id % {N_ENT} AS STRING)"
    typ = f"CAST((event_id % {N_ENT}) % 5 AS STRING)"
    tgt = f"CAST(((event_id % {N_ENT}) * 7 + 3) % {N_ENT} AS STRING)"
    # alias target = previous id within a block of 8 (block leader
    # aliases itself): components are chains of ≤8 entities, so the
    # canonical merge is non-trivial (multi-hop) but bounded at every
    # scale — mirrors real cross-profile merge clusters, not one
    # giant component.
    alias_tgt = (
        f"CAST((event_id % {N_ENT}) - "
        f"(CASE WHEN (event_id % {N_ENT}) % 8 = 0 THEN 0 ELSE 1 END) AS STRING)"
    )
    pred = (
        f"CASE {d} % 3 WHEN 0 THEN 'connects_to' "
        f"WHEN 1 THEN 'feeds' ELSE 'controls' END"
    )
    return f"""
    'turn ' || CAST(event_id AS STRING) || ' notes: ' ||
    CASE event_id % 4
      WHEN 0 THEN '«decl E' || {ent} || ' type:T' || {typ}
        || ' p_int=' || CAST({d} % 97 AS STRING)
        || ' p_bool=' || (CASE WHEN {d} % 2 = 0 THEN 'true' ELSE 'false' END)
        || ' p_enum=kind:Unit.V' || CAST({d} % 3 AS STRING) || '»'
      WHEN 1 THEN '«about E' || {ent}
        || ' q_str=s' || CAST({d} % 23 AS STRING)
        || ' q_int=' || CAST({d} % 41 AS STRING) || '»'
      WHEN 2 THEN CASE WHEN {d} % 11 = 0
        THEN '«rel E' || {ent} || ' ' || {pred} || ' X' || CAST({d} % 50 AS STRING) || '»'
        ELSE '«rel E' || {ent} || ' ' || {pred} || ' E' || {tgt} || '»'
        END
      ELSE CASE WHEN {d} % 5 = 0
        THEN '«same E' || {ent} || ' E' || {alias_tgt} || '»'
        ELSE '«unk z' || CAST({d} % 13 AS STRING) || '»'
        END
    END
    """


def transcripts_select_sql(idiv: str, events_rel: str = "events") -> str:
    """Full transcripts projection over an `events` relation.

    Works verbatim in Spark SQL (idiv='div') and DuckDB (idiv='//').
    `tool` mirrors the input_hint's tool column (non-null on tool turns).
    """
    return f"""
    SELECT
      'c' || CAST(user_id AS STRING) AS conv_id,
      CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
      CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
           WHEN 2 THEN 'tool' ELSE 'system' END AS role,
      {_text_sql(idiv)} AS text,
      CASE WHEN event_id % 4 = 2 THEN 'tool_' || CAST(event_id % 7 AS STRING)
           ELSE NULL END AS tool,
      ts
    FROM {events_rel}
    """


def transcripts_sql(events_rel: str = "events") -> str:
    """DuckDB-dialect transcripts SQL (oracle side)."""
    return transcripts_select_sql("//", events_rel)


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side transcripts derivation.

    Narrow (no shuffle except the per-conversation row_number window,
    which partitions by the same key the downstream pipeline groups
    by). At cluster scale the input would be an Iceberg table already
    carrying (conv_id, turn_idx); this derivation stands in for it.
    """
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("__cimpy_events")
    return spark.sql(transcripts_select_sql("div", "__cimpy_events"))


# --------------------------------------------------------------------------
# Direct (no-regex) triple derivation — the oracle for extraction.
# --------------------------------------------------------------------------

def triples_oracle_sql(idiv: str = "//", events_rel: str = "events") -> str:
    """Expected (subj, pred, obj, obj_kind, conv_id, turn_idx, role)
    triples computed straight from event columns (never touching
    `text`). UNION ALL of one branch per planted mention kind.

    This is the independent derivation used to grade the Arrow-UDF
    regex extraction (analog of the reference's pickled import golden,
    tests/test_import.py:17-36).
    """
    base = f"""
    WITH t AS (
      SELECT event_id AS e,
             event_id {idiv} 4 AS d,
             event_id % {N_ENT} AS ent,
             event_id % 4 AS m,
             'c' || CAST(user_id AS STRING) AS conv_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
             CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                  WHEN 2 THEN 'tool' ELSE 'system' END AS role
      FROM {events_rel}
    )
    """
    decl = f"""
    SELECT 'E' || CAST(ent AS STRING) AS subj, 'rdf_type' AS pred,
           'T' || CAST(ent % 5 AS STRING) AS obj, 'type' AS obj_kind,
           conv_id, turn_idx, role
    FROM t WHERE m = 0
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'p_int',
           CAST(d % 97 AS STRING), 'literal', conv_id, turn_idx, role
    FROM t WHERE m = 0
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'p_bool',
           CASE WHEN d % 2 = 0 THEN 'true' ELSE 'false' END, 'literal',
           conv_id, turn_idx, role
    FROM t WHERE m = 0
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'p_enum',
           'V' || CAST(d % 3 AS STRING), 'enum', conv_id, turn_idx, role
    FROM t WHERE m = 0
    """
    about = f"""
    SELECT 'E' || CAST(ent AS STRING), 'q_str',
           's' || CAST(d % 23 AS STRING), 'literal', conv_id, turn_idx, role
    FROM t WHERE m = 1
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'q_int',
           CAST(d % 41 AS STRING), 'literal', conv_id, turn_idx, role
    FROM t WHERE m = 1
    """
    rel = f"""
    SELECT 'E' || CAST(ent AS STRING),
           CASE d % 3 WHEN 0 THEN 'connects_to' WHEN 1 THEN 'feeds' ELSE 'controls' END,
           CASE WHEN d % 11 = 0 THEN 'X' || CAST(d % 50 AS STRING)
                ELSE 'E' || CAST((ent * 7 + 3) % {N_ENT} AS STRING) END,
           'ref', conv_id, turn_idx, role
    FROM t WHERE m = 2
    """
    same = f"""
    SELECT 'E' || CAST(ent AS STRING), 'sameAs',
           'E' || CAST(ent - (CASE WHEN ent % 8 = 0 THEN 0 ELSE 1 END) AS STRING),
           'ref', conv_id, turn_idx, role
    FROM t WHERE m = 3 AND d % 5 = 0
    """
    return (
        base
        + decl
        + " UNION ALL "
        + about
        + " UNION ALL "
        + rel
        + " UNION ALL "
        + same
    )
