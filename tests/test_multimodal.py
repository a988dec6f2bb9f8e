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


def test_resize_output_contract(spark):
    from cimpy_spark.functions.multimodal import resize

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(50)
    out = resize(to_binary_docs(docs), width=4, height=6)
    assert dict(out.dtypes)["payload"] == "binary"
    rows = out.collect()
    assert len(rows) == 50
    # every output payload is exactly width*height bytes, and head_hex
    # matches the payload's first 4 bytes
    for r in rows:
        assert len(bytes(r["payload"])) == 24 == r["n_bytes"]
        assert bytes(r["payload"])[:4].hex() == r["head_hex"]
        assert (r["width"], r["height"]) == (4, 6)


def test_frame_sample_expansion(spark):
    from cimpy_spark.functions.multimodal import frame_sample

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(50)
    out = frame_sample(to_binary_docs(docs), frame_chars=16, every_k=2).collect()
    lens = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lens)  # every doc emits ≥1 frame
    for doc_id, frames in by_doc.items():
        n_frames_total = (lens[doc_id] + 15) // 16
        kept = [i for i in range(n_frames_total) if i % 2 == 0]
        assert sorted(r["frame_idx"] for r in frames) == kept
        # only the last frame may be short
        for r in frames:
            if r["frame_idx"] < n_frames_total - 1:
                assert r["n_chars_frame"] == 16
