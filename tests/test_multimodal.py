"""Multimodal plumbing tests: binary column round-trip, Arrow batch
shape, stubbed decode determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from cimpy_spark.functions.multimodal import extract_features, to_binary_docs
from tests.conftest import SF_TINY


def test_binary_roundtrip_and_features(spark):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    bin_docs = to_binary_docs(docs)
    assert dict(bin_docs.dtypes)["payload"] == "binary"

    feats = extract_features(bin_docs)
    joined = docs.join(feats, "doc_id")
    # payload is utf-8 text: byte count >= char count, equal for ascii
    bad = joined.filter(F.col("n_bytes") < F.col("n_chars")).count()
    assert bad == 0
    # stub dims are hex-digit valued
    assert (
        feats.filter(
            (F.col("fake_width") < 0) | (F.col("fake_width") > 15)
            | (F.col("fake_height") < 0) | (F.col("fake_height") > 15)
        ).count()
        == 0
    )
    # deterministic: same payload → same features
    again = extract_features(bin_docs)
    assert feats.exceptAll(again).count() == 0
