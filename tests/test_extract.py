"""Stage-1 extraction unit tests (mirrors the reference's import
golden strategy, tests/test_import.py:17-36, on the synthetic
transcript fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cimpy_spark.fixtures.events_transcripts import transcripts_from_events
from cimpy_spark.operators.extract import extract_triples, extraction_metrics
from tests.conftest import SF_TINY


def test_transcripts_shape_and_order(spark):
    t = transcripts_from_events(spark, SF_TINY)
    assert t.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # (conv_id, turn_idx) unique and dense from 0 — stable turn ordering
    dup = t.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dup == 0
    mins = t.groupBy("conv_id").agg(F.min("turn_idx").alias("m")).filter("m != 0")
    assert mins.count() == 0


def test_transcripts_match_sql_derivation(spark):
    """The r8 narrow-shuffle derivation (window over keys, text
    generated post-exchange behind a checkpoint barrier) must be
    row-identical to the plain shared-SQL derivation the DuckDB
    oracle uses — the projection snippets are duplicated between the
    two, so this pins them together."""
    from cimpy_spark.fixtures.events_transcripts import transcripts_select_sql

    fast = transcripts_from_events(spark, SF_TINY)
    spark.read.parquet(f"{SF_TINY}/events.parquet").createOrReplaceTempView(
        "__parity_events"
    )
    ref = spark.sql(transcripts_select_sql("div", "__parity_events"))
    assert fast.columns == ref.columns
    assert fast.schema == ref.schema
    assert fast.exceptAll(ref).count() == 0
    assert ref.exceptAll(fast).count() == 0


def test_extract_kinds(spark):
    t = transcripts_from_events(spark, SF_TINY)
    triples = extract_triples(t).cache()
    kinds = {r["obj_kind"] for r in triples.select("obj_kind").distinct().collect()}
    assert kinds == {"type", "literal", "enum", "ref"}
    # every decl MENTION yields exactly 1 type triple (turns may carry
    # several decls — count mentions, not turns)
    n_decl_mentions = t.select(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("«decl "), 0)).alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    n_type = triples.filter(F.col("pred") == "rdf_type").count()
    assert n_type == n_decl_mentions
    # enum suffix rule: only the part after the last '.' is kept
    enums = triples.filter(F.col("obj_kind") == "enum")
    bad = enums.filter(~F.col("obj").rlike("^V[0-9]$")).count()
    assert bad == 0
    triples.unpersist()


def test_multi_mention_turns_extracted_in_order(spark):
    """A turn with several «…» spans yields one mention_idx per span,
    in text order (reference loops every child element,
    cimpy/cimimport.py:234-241)."""
    rows = [
        (
            "c1",
            0,
            "user",
            "x «decl E1 type:T1 p_int=1 p_bool=true p_enum=kind:Unit.V0» mid "
            "«rel E1 feeds E2» end «same E1 E2»",
            None,
        ),
        ("c1", 1, "user", "no mention", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = extract_triples(t).collect()
    by_mention = {}
    for r in got:
        by_mention.setdefault(r["mention_idx"], set()).add((r["pred"], r["obj"]))
    assert set(by_mention) == {0, 1, 2}
    assert ("rdf_type", "T1") in by_mention[0]
    assert by_mention[1] == {("feeds", "E2")}
    assert by_mention[2] == {("sameAs", "E2")}


def test_enum_url_roundtrip(spark):
    """suffix → URL re-expansion is lossless (reference memoizes URLs
    on import, cimpy/cimimport.py:334-345, and re-expands on export,
    cimpy/cimexport.py:87-94)."""
    from cimpy_spark import pipeline as P
    from cimpy_spark.operators.extract import enum_url_dictionary, expand_enum_urls

    t = transcripts_from_events(spark, SF_TINY)
    d = enum_url_dictionary(t)
    rows = d.collect()
    assert {(r["suffix"], r["url"]) for r in rows} == {
        ("V0", "kind:Unit.V0"), ("V1", "kind:Unit.V1"), ("V2", "kind:Unit.V2")
    }
    nodes = P.build_graph(t).nodes
    expanded = expand_enum_urls(nodes, d)
    # every re-expanded URL re-suffixes to the original value
    bad = expanded.filter(
        F.regexp_extract("url", "\\.(\\w+)$", 1) != F.col("value")
    ).count()
    assert bad == 0
    # every enum-valued node row round-trips (p_enum domain = V0..V2)
    n_enum_nodes = nodes.filter(F.col("value").rlike("^V[0-9]$")).count()
    assert expanded.count() == n_enum_nodes


def test_unknown_patterns_counted_not_raised(spark):
    t = transcripts_from_events(spark, SF_TINY)
    m = {r["pattern_kind"]: r["n"] for r in extraction_metrics(t).collect()}
    assert m.get("unknown_pattern", 0) > 0
    # unknown patterns yield no triples
    triples = extract_triples(t)
    assert triples.filter(F.col("pred").startswith("unk")).count() == 0


def test_input_validation_counts_planted_violations(spark):
    from cimpy_spark.operators.extract import validate_transcripts

    rows = [
        ("c1", 0, "user", "ok", None),
        ("c1", 0, "user", "dup key", None),   # duplicate (conv, turn)
        ("c1", 2, "user", "", None),           # empty text + gap (no turn 1)
        (None, 0, "user", "x", None),          # null conv_id
        ("c2", -1, "user", "y", None),         # negative idx + non-dense
        ("c3", None, "user", "z", None),       # NULL turn_idx
        ("c3", 0, "user", "w", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = {r["check"]: r["n_violations"] for r in validate_transcripts(t).collect()}
    assert got["duplicate_turn_key"] == 1
    assert got["null_or_empty_text"] == 1
    assert got["null_conv_id"] == 1
    assert got["negative_turn_idx"] == 1
    assert got["null_turn_idx"] == 1  # breaks ordering; must be counted
    assert got["non_dense_turns"] >= 2  # c1 gap, c2 negative start; c3 dense
