"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata, processed by Arrow-batched UDFs.

The container has no image/audio codecs, so the decode step is a
deterministic STUB (clearly marked) — but everything Spark-side is
real and tested: the binary column type, the metadata struct, the
`mapInPandas` batch shape, and the feature-extraction dataflow. A
real deployment swaps `_decode_stub` for a PIL/ffmpeg call inside the
same UDF; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, payload_md5 string"
)

_HEX = "0123456789abcdef"


def to_binary_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, meta struct) — the multimodal storage
    shape: opaque bytes + typed metadata. Here payload is the utf-8
    text (stand-in for image bytes)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("source").alias("source"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: derives fake (width, height) deterministically from
    the payload hash. A real deployment replaces this function body
    with e.g. ``PIL.Image.open(BytesIO(payload)).size`` — the UDF
    signature, Arrow batch shape and feature schema are what this
    module actually tests, and none of them change.
    """
    h = hashlib.md5(payload).hexdigest()
    return _HEX.index(h[0]), _HEX.index(h[1])


def extract_features(bin_docs: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads:
    (doc_id, n_bytes, fake_width, fake_height, payload_md5).

    Everything expressible as a column expression stays JVM-side
    (``length``/``md5`` over binary — whole-stage codegen, matters
    when payloads are megabytes); the Arrow-batched Python UDF carries
    ONLY the decode step, with the precomputed columns passed through
    the batch untouched. One scan, no join, narrow."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(lambda b: _decode_stub(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                    "payload_md5": pdf["payload_md5"],
                }
            )

    pre = bin_docs.select(
        "doc_id",
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "payload",
    )
    return pre.mapInPandas(gen, schema=FEATURE_SCHEMA)


def features_oracle_sql() -> str:
    """DuckDB oracle: the stub's arithmetic expressed in SQL (payload
    is the utf-8 text, so octet_length/md5 of text match)."""
    return """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS INT) AS fake_width,
           CAST(strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS INT) AS fake_height,
           md5(text) AS payload_md5
    FROM documents
    """
