"""Differential test: the Arrow-native extractor and the pandas
reference extractor must be row-identical on every fixture (two
independent implementations of the same grammar)."""

from __future__ import annotations

from cimpy_spark.fixtures.events_transcripts import transcripts_from_events
from cimpy_spark.fixtures.generator import generate_transcripts
from cimpy_spark.operators.extract import extract_triples, extract_triples_pandas
from tests.conftest import SF_TINY


def _assert_identical(a, b):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_arrow_equals_pandas_events_fixture(spark):
    t = transcripts_from_events(spark, SF_TINY).cache()
    _assert_identical(extract_triples(t), extract_triples_pandas(t))


def test_arrow_equals_pandas_generator_fixture(spark):
    t = generate_transcripts(spark, n_convs=30, turns_per_conv=20, seed=11).cache()
    _assert_identical(extract_triples(t), extract_triples_pandas(t))


def test_arrow_empty_and_mentionless_input(spark):
    t = spark.createDataFrame(
        [("c1", 0, "user", "no mention"), ("c1", 1, "user", "«unk z1»")],
        "conv_id string, turn_idx int, role string, text string",
    )
    assert extract_triples(t).count() == 0
    assert extract_triples(t.limit(0)).count() == 0


def test_arrow_equals_pandas_and_oracle_on_adversarial_text(spark):
    """Three-way agreement on pathological mention syntax: nested «,
    stray » before the first «, empty bodies, adjacent mentions. The
    Arrow split-scan, the pandas regex-scan, and the pure-Python
    oracle must produce the same triples (body charset excludes «»,
    so all scanners resolve ambiguity identically)."""
    from cimpy_spark.oracle import run_oracle

    rows = [
        ("c1", 0, "user", "««decl E1 type:T1 p_int=1 p_bool=true p_enum=kind:Unit.V0»"),
        ("c1", 1, "user", "«a»b» «rel E1 feeds E2»"),
        ("c1", 2, "user", "»stray «same E1 E2» trailing«"),
        ("c1", 3, "user", "«decl E2 type:T2 p_int=2 p_bool=false p_enum=kind:Unit.V1»«about E1 q_int=7»"),
        ("c1", 4, "user", "«»«»"),
        ("c1", 5, "user", "»»»«««"),
        ("c1", 6, "user", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    arrow = extract_triples(t)
    pandas_ = extract_triples_pandas(t)
    _assert_identical(arrow, pandas_)
    emitted = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in arrow.collect()
    }
    oracle = run_oracle(
        [{"conv_id": c, "turn_idx": i, "text": x} for c, i, _, x in rows]
    )
    assert emitted == oracle.triples
    # the nested-« decl IS parsed (scan restarts at the inner «)
    assert ("E1", "rdf_type", "T1", "type") in emitted
