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


RESIZE_SCHEMA = (
    "doc_id long, payload binary, width int, height int, n_bytes int, "
    "head_hex string"
)


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic fake output bytes — the md5 digest
    of (payload + b'WxH') tiled to exactly width*height bytes. A real
    deployment replaces this body with e.g. PIL
    ``Image.open(...).resize((w, h)).tobytes()``; the UDF signature,
    output schema (binary payload + dims) and batch shape are what
    this module tests."""
    seed = hashlib.md5(payload + f"{width}x{height}".encode()).digest()
    n = width * height
    return (seed * (n // len(seed) + 1))[:n]


def resize(bin_docs: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize step for binary payloads (decode→resize→re-encode in a
    real deployment): Arrow-batched ``mapInPandas``, one narrow scan,
    payload-in → payload-out with the new dimensions as metadata.
    ``head_hex`` (first 4 output bytes, hex) plus ``n_bytes`` make the
    deterministic stub independently checkable by the DuckDB oracle
    without blob gymnastics."""
    # head_hex is defined as the first 4 output bytes and the oracle
    # always emits 8 hex chars — a payload smaller than 4 bytes would
    # silently diverge from it
    if width * height < 4:
        raise ValueError("resize requires width*height >= 4 (head_hex covers 4 bytes)")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda b: _resize_stub(bytes(b), width, height))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                    "n_bytes": out.map(len).astype("int32"),
                    "head_hex": out.map(lambda b: b[:4].hex()),
                }
            )

    return bin_docs.select("doc_id", "payload").mapInPandas(
        gen, schema=RESIZE_SCHEMA
    )


def resize_oracle_sql(width: int = 8, height: int = 8) -> str:
    """The stub's arithmetic in SQL: output head bytes == digest head
    == first 8 hex chars of md5(text || 'WxH')."""
    return f"""
    SELECT doc_id,
           {width} AS width, {height} AS height,
           {width * height} AS n_bytes,
           substring(md5(text || '{width}x{height}'), 1, 8) AS head_hex
    FROM documents
    """


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, n_chars_frame int"


def frame_sample(
    bin_docs: DataFrame, frame_chars: int = 16, every_k: int = 2
) -> DataFrame:
    """Frame sampling for sequence payloads (video/audio analog): the
    decoded payload is split into fixed-size frames and every k-th
    frame is emitted — a one-row→many-rows Arrow-batched expansion
    (the UDTF surface). Frames are CHARACTER slices of the decoded
    text stand-in so the DuckDB oracle can mirror them with
    ``substring``; a real deployment slices frame-aligned byte ranges
    from the demuxed stream in the same loop. Output one row per kept
    frame: (doc_id, frame_idx, frame_md5, n_chars_frame)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                for i in range(0, (len(text) + frame_chars - 1) // frame_chars):
                    if i % every_k:
                        continue
                    frame = text[i * frame_chars : (i + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                    "n_chars_frame": pd.Series(lens, dtype="int32"),
                }
            )

    return bin_docs.select("doc_id", "payload").mapInPandas(
        gen, schema=FRAME_SCHEMA
    )


def frame_sample_oracle_sql(frame_chars: int = 16, every_k: int = 2) -> str:
    return f"""
    SELECT d.doc_id, CAST(i.i AS INT) AS frame_idx,
           md5(substring(d.text, i.i * {frame_chars} + 1, {frame_chars})) AS frame_md5,
           CAST(length(substring(d.text, i.i * {frame_chars} + 1, {frame_chars})) AS INT)
             AS n_chars_frame
    FROM documents d,
         (SELECT unnest(generate_series(0,
            CAST((SELECT max(length(text)) FROM documents) / {frame_chars} AS INT)))
          AS i) i
    WHERE i.i * {frame_chars} < length(d.text) AND i.i % {every_k} = 0
    """


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
