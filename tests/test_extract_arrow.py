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
