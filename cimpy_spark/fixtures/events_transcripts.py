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

Each turn plants **0–3 mentions** (``n = (event_id % 7) % 4``; slot k
uses the derived key ``se = event_id*3 + k``), mirroring the
reference's loop over every child element of a subject
(cimpy/cimimport.py:234-241) — a turn may declare one entity AND
reference another, and some turns carry no mention at all. Mention
order within a turn is provenance (``mention_idx``), the analog of
element order within a file.

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

Entity-id space is ``E0..E210`` (mod 211, prime). References to
``E<j>`` targets that happen never to be declared at a given scale
dangle into quarantine exactly like the explicit ``X<n>`` ones — both
the engine and the oracle resolve refs against the declared set, so
the comparison stays closed-form either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_ENT = 211  # prime entity-id space

# mentions per turn: (event_id % 7) % 4 -> 0,1,2,3,0,1,2 over e%7=0..6
N_MENTIONS = "((event_id % 7) % 4)"


def _mention_sql(se: str, idiv: str) -> str:
    """One planted mention body (with «» delimiters) as a SQL
    expression over the integer slot key expression `se`.

    `idiv` is the integer-division operator: `div` (Spark), `//` (DuckDB).
    """
    d = f"(({se}) {idiv} 4)"
    ent = f"CAST(({se}) % {N_ENT} AS STRING)"
    typ = f"CAST((({se}) % {N_ENT}) % 5 AS STRING)"
    tgt = f"CAST(((({se}) % {N_ENT}) * 7 + 3) % {N_ENT} AS STRING)"
    # alias target = previous id within a block of 8 (block leader
    # aliases itself): components are chains of ≤8 entities, so the
    # canonical merge is non-trivial (multi-hop) but bounded at every
    # scale — mirrors real cross-profile merge clusters, not one
    # giant component.
    alias_tgt = (
        f"CAST((({se}) % {N_ENT}) - "
        f"(CASE WHEN (({se}) % {N_ENT}) % 8 = 0 THEN 0 ELSE 1 END) AS STRING)"
    )
    pred = (
        f"CASE {d} % 3 WHEN 0 THEN 'connects_to' "
        f"WHEN 1 THEN 'feeds' ELSE 'controls' END"
    )
    return f"""
    CASE ({se}) % 4
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


def _text_sql(idiv: str) -> str:
    """The planted `text` column: a header fragment (author +
    namespace — the analog of the reference's per-file model header,
    cimpy/cimimport.py:164-178) followed by 0-3 mentions joined with
    filler prose, as a SQL expression over `event_id`."""
    slots = [
        f"CASE WHEN {N_MENTIONS} >= {k + 1} THEN "
        f"'{' and then ' if k else ' '}' || ({_mention_sql(f'event_id * 3 + {k}', idiv)}) "
        f"ELSE '' END"
        for k in range(3)
    ]
    return (
        "'turn ' || CAST(event_id AS STRING)"
        " || ' by a' || CAST(event_id % 7 AS STRING)"
        " || ' ns:ns' || CAST(event_id % 5 AS STRING)"
        " || ' notes:' || "
        + " || ".join(slots)
    )


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


def late_window_counts_sql(
    n_batches: int = 4, late_mod: int = 37, salt: str = "late"
) -> str:
    """Closed-form oracle for the `stream_late_data` gate: per-window,
    per-role turn counts over the transcripts EXCLUDING the planted
    late arrivals (batch-0 rows whose md5 bucket is 0 — the rows
    `streaming.ingest.stage_late_batches` replays ≥ 2 batches after
    their window's watermark passed, which Spark therefore drops).
    Every surviving row's window is emitted by the sentinel-advanced
    final watermark, so the oracle needs no per-batch watermark
    simulation — the staging's ≥2-batch lateness construction makes
    the result independent of WHICH of Spark's two watermark values
    (eviction vs the one-batch-staler late-row filter) applies.
    `time_bucket` and Spark's tumbling `window()` share epoch
    alignment for 10-minute buckets (both origins are multiples of
    600 s apart)."""
    return f"""
    WITH t AS ({transcripts_sql()}),
    r AS (
      SELECT role, ts, conv_id, turn_idx,
             row_number() OVER (ORDER BY ts, conv_id, turn_idx) - 1 AS rk,
             count(*) OVER () AS n
      FROM t
    ),
    flagged AS (
      SELECT role, ts, (rk * {n_batches}) // n AS batch,
             CAST(('0x' || substring(md5('{salt}#' || conv_id || '#' ||
               CAST(turn_idx AS STRING)), 1, 8))::BIGINT % {late_mod}
               AS BIGINT) AS b
      FROM r
    )
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           role, count(*) AS n_turns
    FROM flagged WHERE NOT (batch = 0 AND b = 0)
    GROUP BY 1, 2
    """


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-side transcripts derivation.

    Restructured round 8 (optimization guide §2.3/§8 — shuffle keys,
    not payloads): the naive ``spark.sql(transcripts_select_sql(...))``
    plan let Catalyst push the (huge) text projection BELOW the
    row_number window's exchange, so the generated text — ~10× the
    width of the key columns — was computed at scan parallelism and
    shuffled in full. Here the window runs over just ``(event_id,
    user_id, ts)`` (~24 B/row crosses the network), the narrow result
    is materialized as a plan barrier (checkpoint_df — Catalyst cannot
    push a projection below a materialized boundary), and the text is
    generated AFTER the shuffle, in the already-partitioned layout.
    The explicit ``repartition(n, user_id)`` pins the exchange the
    window reuses (same key ⇒ one exchange, guide §2.4) at the
    session's shuffle width so text generation keeps full parallelism
    even when AQE would coalesce the tiny narrow shuffle to one
    partition. Output is row-identical to the oracle SQL
    (tests/test_extract.py::test_transcripts_match_sql_derivation).

    At cluster scale the input would be an Iceberg table already
    carrying (conv_id, turn_idx); this derivation stands in for it.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cimpy_spark.plans.checkpoints import checkpoint_df

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    narrow = (
        events.select("event_id", "user_id", "ts")
        .repartition(n_parts, "user_id")
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    )
    barrier = checkpoint_df(narrow, eager=False)
    # the projection snippets below must stay expression-identical to
    # transcripts_select_sql (the shared Spark/DuckDB derivation) —
    # equivalence is pinned row-for-row by the parity test above
    return barrier.selectExpr(
        "'c' || CAST(user_id AS STRING) AS conv_id",
        "turn_idx",
        "CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' "
        "WHEN 2 THEN 'tool' ELSE 'system' END AS role",
        f"{_text_sql('div')} AS text",
        "CASE WHEN event_id % 4 = 2 THEN 'tool_' || CAST(event_id % 7 AS STRING) "
        "ELSE NULL END AS tool",
        "ts",
    )


# --------------------------------------------------------------------------
# Direct (no-regex) triple derivation — the oracle for extraction.
# --------------------------------------------------------------------------

def slots_cte_sql(idiv: str = "//", events_rel: str = "events") -> str:
    """Shared `t` (per-turn) and `s` (per-mention-slot) CTE bodies.

    `s` carries the slot key arithmetic: mention_idx, d, ent, m for
    every ACTIVE slot of every event. Works in both dialects (inline
    VALUES join for the slot numbers).
    """
    return f"""
    t AS (
      SELECT event_id AS e,
             {N_MENTIONS} AS n_mentions,
             'c' || CAST(user_id AS STRING) AS conv_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
             CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                  WHEN 2 THEN 'tool' ELSE 'system' END AS role
      FROM {events_rel}
    ),
    s AS (
      SELECT t.e, t.conv_id, t.turn_idx, t.role,
             CAST(k.k AS INT) AS mention_idx,
             (t.e * 3 + k.k) {idiv} 4 AS d,
             (t.e * 3 + k.k) % {N_ENT} AS ent,
             (t.e * 3 + k.k) % 4 AS m
      FROM t JOIN (VALUES (0), (1), (2)) AS k(k) ON k.k < t.n_mentions
    )
    """


def triples_oracle_sql(idiv: str = "//", events_rel: str = "events") -> str:
    """Expected (subj, pred, obj, obj_kind, conv_id, turn_idx,
    mention_idx, role) triples computed straight from event columns
    (never touching `text`). UNION ALL of one branch per planted
    mention kind over the active slots.

    This is the independent derivation used to grade the Arrow-UDF
    regex extraction (analog of the reference's pickled import golden,
    tests/test_import.py:17-36).
    """
    base = "WITH " + slots_cte_sql(idiv, events_rel)
    prov = "conv_id, turn_idx, mention_idx, role"
    decl = f"""
    SELECT 'E' || CAST(ent AS STRING) AS subj, 'rdf_type' AS pred,
           'T' || CAST(ent % 5 AS STRING) AS obj, 'type' AS obj_kind,
           {prov}
    FROM s WHERE m = 0
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'p_int',
           CAST(d % 97 AS STRING), 'literal', {prov}
    FROM s WHERE m = 0
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'p_bool',
           CASE WHEN d % 2 = 0 THEN 'true' ELSE 'false' END, 'literal',
           {prov}
    FROM s WHERE m = 0
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'p_enum',
           'V' || CAST(d % 3 AS STRING), 'enum', {prov}
    FROM s WHERE m = 0
    """
    about = f"""
    SELECT 'E' || CAST(ent AS STRING), 'q_str',
           's' || CAST(d % 23 AS STRING), 'literal', {prov}
    FROM s WHERE m = 1
    UNION ALL
    SELECT 'E' || CAST(ent AS STRING), 'q_int',
           CAST(d % 41 AS STRING), 'literal', {prov}
    FROM s WHERE m = 1
    """
    rel = f"""
    SELECT 'E' || CAST(ent AS STRING),
           CASE d % 3 WHEN 0 THEN 'connects_to' WHEN 1 THEN 'feeds' ELSE 'controls' END,
           CASE WHEN d % 11 = 0 THEN 'X' || CAST(d % 50 AS STRING)
                ELSE 'E' || CAST((ent * 7 + 3) % {N_ENT} AS STRING) END,
           'ref', {prov}
    FROM s WHERE m = 2
    """
    same = f"""
    SELECT 'E' || CAST(ent AS STRING), 'sameAs',
           'E' || CAST(ent - (CASE WHEN ent % 8 = 0 THEN 0 ELSE 1 END) AS STRING),
           'ref', {prov}
    FROM s WHERE m = 3 AND d % 5 = 0
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


def metrics_oracle_sql(idiv: str = "//", events_rel: str = "events") -> str:
    """Per-mention pattern-kind counts, plus 'no_mention' turns —
    the oracle for `extraction_metrics`."""
    return (
        "WITH "
        + slots_cte_sql(idiv, events_rel)
        + """
    SELECT pattern_kind, count(*) AS n FROM (
      SELECT CASE m WHEN 0 THEN 'decl' WHEN 1 THEN 'about' WHEN 2 THEN 'rel'
                    ELSE CASE WHEN d % 5 = 0 THEN 'same' ELSE 'unknown_pattern' END
             END AS pattern_kind
      FROM s
      UNION ALL
      SELECT 'no_mention' FROM t WHERE n_mentions = 0
    ) GROUP BY pattern_kind
    """
    )
