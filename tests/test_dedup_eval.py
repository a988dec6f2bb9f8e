"""Golden-set dedup evaluation (dedup.dedup_eval, round 7):
driver-style oracle parity at SF_TINY for both the doc and the
embedding gates, the threshold-as-measured-behavior contract, and
the absent-member denominator rule.

Tail gates `doc_dedup_eval` / `emb_dedup_eval` are pinned here until
their first driver rows."""

from __future__ import annotations

from cimpy_spark.functions import dedup as D
from tests.conftest import SF_TINY
from tools.compare import compare


def test_dedup_eval_oracle_parity(spark):
    assert compare(spark, SF_TINY, ["doc_dedup_eval", "emb_dedup_eval"])


def test_dedup_eval_threshold_behavior(spark):
    """Per-kind detection must reflect the planted similarity levels:
    verbatim copies 1.0 exactly, above-threshold kinds ≥ 0.9,
    below-threshold trunc60 exactly 0 — the 0.8 Jaccard gate measured
    per kind, not inferred."""
    import __spark_entry__ as E
    from cimpy_spark.fixtures.organic import organic_truth_pairs

    rows = {
        r["kind"]: r
        for r in D.dedup_eval(
            D.dedup_corpus(E._organic_docs(spark, SF_TINY)),
            organic_truth_pairs(E._docs(spark, SF_TINY)),
        ).collect()
    }
    assert set(rows) == {"exact", "trunc90", "trunc60", "append"}
    assert rows["exact"]["detection_rate_micro"] == 1_000_000
    assert rows["trunc60"]["detection_rate_micro"] == 0
    for kind in ("trunc90", "append"):
        assert rows[kind]["detection_rate_micro"] >= 900_000
    for r in rows.values():
        assert 0 <= r["n_detected"] <= r["n_pairs"]


def test_dedup_eval_absent_member_counts_as_miss(spark):
    """A truth pair whose member never reached the clustering stays
    in the denominator as a miss — the eval must not silently shrink
    its golden set."""
    clusters = spark.createDataFrame(
        [(1, 1, True), (2, 1, False)],
        "doc_id long, canonical_doc_id long, is_kept boolean",
    )
    truth = spark.createDataFrame(
        [(1, 2, "present"), (1, 99, "absent")],
        "doc_a long, doc_b long, kind string",
    )
    rows = {r["kind"]: r for r in D.dedup_eval(clusters, truth).collect()}
    assert rows["present"]["n_detected"] == 1
    assert rows["absent"]["n_pairs"] == 1
    assert rows["absent"]["n_detected"] == 0
    assert rows["absent"]["detection_rate_micro"] == 0
