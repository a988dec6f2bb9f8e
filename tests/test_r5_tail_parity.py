"""Driver-style parity self-gates for the round-5 continuation tail
queries: until the driver issues their r6 CORRECTNESS rows, each new
tail entry is held green by running the SAME comparison the driver
runs (tools/compare — row count + order-insensitive value hash vs the
DuckDB oracle) at sf0.001. Queries with a dedicated parity test
elsewhere (line_dedup, setsim, bpe) are covered there; this file
sweeps the rest so nothing ships oracle-unverified."""

from __future__ import annotations

from tests.conftest import SF_TINY
from tools.compare import compare

DOC_TAIL = [
    "doc_script_profile",
    "doc_mad_outliers",
    "doc_epoch_allocation",
    "doc_source_terms",
    "doc_source_overlap",
    "doc_winnow",
    "doc_quality_percentile",
    "doc_curation_pipeline",
    "doc_normalize",
    "emb_label_centroids",
]

KG_TAIL = [
    "kg_cooccurrence",
    "kg_lpa",
    "kg_negative_samples",
    "kg_neighbor_sample",
    "kg_graph_diff",
    "kg_kcore",
    "kg_landmarks",
    "kg_linkpred",
    "kg_degree_distribution",
]

CONV_TAIL = [
    "conv_truncate",
]


def test_doc_tail_queries_match_oracles(spark):
    assert compare(spark, SF_TINY, DOC_TAIL)


def test_kg_tail_queries_match_oracles(spark):
    assert compare(spark, SF_TINY, KG_TAIL)


def test_conv_tail_queries_match_oracles(spark):
    assert compare(spark, SF_TINY, CONV_TAIL)
