"""Corpus version diff (text.corpus_diff) and hub-skew report
(pipeline.skew_report), round 7: driver-style oracle parity at
SF_TINY plus hand-fixture semantics and the top-k plan shape.

Tail gates `doc_corpus_diff` / `kg_skew_report` are pinned here
until their first driver rows."""

from __future__ import annotations

import cimpy_spark.pipeline as P
from cimpy_spark.functions import text as T
from tests.conftest import SF_TINY
from tools.compare import compare


def test_diff_skew_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["doc_corpus_diff", "kg_skew_report"])


def test_corpus_diff_hand_semantics(spark):
    """added / removed / changed classified per doc; unchanged docs
    (including the NULL-text ≡ empty-text contract) never emitted."""
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (5, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "bX"), (3, ""), (4, "d")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["status"] for r in T.corpus_diff(old, new).collect()}
    assert rows == {2: "changed", 4: "added", 5: "removed"}


def test_corpus_diff_delta_counts_match_fixture(spark):
    """Over the versioned fixture the three statuses partition the
    delta exactly as the residue rules prescribe."""
    import __spark_entry__ as E
    from cimpy_spark.fixtures.organic import versioned_documents

    docs = E._docs(spark, SF_TINY)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    rows = T.corpus_diff(docs, versioned_documents(docs)).collect()
    by = {"added": set(), "removed": set(), "changed": set()}
    for r in rows:
        by[r["status"]].add(r["doc_id"])
    assert by["removed"] == {i for i in ids if i % 13 == 0}
    assert by["changed"] == {i for i in ids if i % 13 != 0 and i % 7 == 1}
    assert by["added"] == {i + 5_000_000 for i in ids if i % 11 == 3}


def test_skew_report_hand_shares(spark):
    """Star a→{b,c,d} plus b→c: degrees 3/2/2/1, total incidences 8,
    exact micro shares, deterministic (degree desc, node asc) cut."""
    edges = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("a", "p", "d"), ("b", "p", "c")],
        "src string, pred string, dst string",
    )
    rows = P.skew_report(edges, k=2).collect()
    got = [(r["node"], r["degree"], r["share_micro"]) for r in rows]
    assert sorted(got) == [("a", 3, 375_000), ("b", 2, 250_000)]


def test_skew_report_topk_is_take_ordered(spark):
    """The top-k must compile to TakeOrderedAndProject (partial
    per-partition top-k), never a global Sort over the degree frame."""
    df = P.skew_report(
        spark.createDataFrame(
            [("a", "p", "b")], "src string, pred string, dst string"
        ),
        k=3,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
