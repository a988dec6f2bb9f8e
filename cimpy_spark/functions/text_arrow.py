"""Arrow-kernel variants of the two heaviest text-curation operators.

`text.repetition_score` and `text.contamination` are compute-bound on
word-n-gram construction: with pure column expressions they cost
51-63s / 45-63s per 500k docs (BENCH.md round-5 table) — the gram
HOFs dominate, not the plan (both already have the shuffle-minimal
shape). ROADMAP.md named the next lever: an Arrow kernel like the
extraction parser (operators/extract.py:173), not more plan surgery.

These `mapInArrow` kernels reproduce the SQL paths' results
BIT-FOR-BIT (pytest equivalence on fixture + organic + adversarial
corpora, plus hypothesis fuzz; both engines also share the same
DuckDB oracle gates in the driver contract) using pyarrow C++ string
kernels + vectorized NumPy — no per-row Python, no pandas
materialization. Both are narrow (zero exchanges): `mapInArrow` maps
partitions in place, so the 100 TB story is unchanged — scan-local
compute, output rows ≪ input bytes.

Tokenization parity notes (pinned by tests/test_text_arrow.py):
- Spark `trim` strips SPACES only → `pc.utf8_trim(text, " ")`.
- Spark `split(col, "\\s+")` is Java `Pattern.split(limit=-1)`:
  Java's `\\s` is the ASCII class ``[ \\t\\n\\x0b\\f\\r]`` (RE2's
  `\\s` lacks ``\\x0b``, Python's is Unicode — so the class is spelled
  out), and leading/trailing empty fragments are KEPT ("\\ta" →
  ["", "a"], "" → [""]); `pc.split_pattern_regex` matches this.
- Gram strings are `concat_ws(" ", w_i..w_{i+n-1})`; words contain no
  whitespace, so tuple equality == string equality and the kernels
  may compare dictionary codes instead of building gram strings
  (repetition) or join slices element-wise (contamination).
- Spark `round(x, 6)` on DOUBLE is Java
  `BigDecimal.valueOf(x).setScale(6, HALF_UP)` — i.e. HALF_UP on the
  SHORTEST-REPR decimal of x, which Python mirrors as
  `Decimal(repr(x)).quantize(6, ROUND_HALF_UP)` (both languages print
  shortest round-trip decimals).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from functools import lru_cache
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java regex \s, exactly (ASCII five + vertical tab).
_JAVA_WS = "[ \t\n\x0b\f\r]+"

_SIX = Decimal("0.000001")


def _split_words(text: pa.Array) -> pa.Array:
    """list<string> of whitespace-split words, bit-identical to
    Spark's `split(trim(text), "\\s+")` (see module docstring)."""
    return pc.split_pattern_regex(pc.utf8_trim(text, " "), _JAVA_WS)


def _flat_words(batch: pa.RecordBatch):
    """(flat words, parent row index per word) for a (doc_id, text)
    batch. Null text behaves like empty text (the SQL paths emit the
    same zero-gram result either way)."""
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    words = _split_words(text)
    flat = pc.list_flatten(words)
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    return flat, parents


@lru_cache(maxsize=65536)
def _round6_frac(dup: int, cnt: int) -> float:
    """Spark `round(dup * 1.0 / cnt, 6)` (HALF_UP on the double's
    shortest decimal repr). Cached: distinct (dup, cnt) pairs per
    batch are bounded by doc length, not doc count."""
    return float(
        Decimal(repr(dup / cnt)).quantize(_SIX, rounding=ROUND_HALF_UP)
    )


def _dup_fracs(codes: np.ndarray, parents: np.ndarray, n: int, n_rows: int):
    """Per-doc duplicate-n-gram fraction over dictionary-encoded words.

    A doc's n-grams are the consecutive code n-tuples whose endpoints
    share a parent (parents are nondecreasing, so equal endpoints ⇒
    the whole window is in-doc). dup = adjacent-equal pairs after
    sorting the doc's grams — the same quantity the SQL fold counts
    (sort groups equal grams adjacently; the sort ORDER differs from
    the string sort but the group sizes, hence the count, do not).
    Everything is one lexsort + bincounts — no per-doc loop.
    """
    if len(codes) < n:
        return np.zeros(n_rows, dtype=np.float64)
    valid = parents[: 1 - n] == parents[n - 1 :]
    p = parents[: 1 - n][valid]
    keys = [codes[j : len(codes) - (n - 1) + j][valid] for j in range(n)]
    cnt = np.bincount(p, minlength=n_rows)
    if len(p) == 0:
        return np.zeros(n_rows, dtype=np.float64)
    order = np.lexsort(tuple(reversed(keys)) + (p,))
    ps = p[order]
    eq = ps[1:] == ps[:-1]
    for k in keys:
        ks = k[order]
        eq &= ks[1:] == ks[:-1]
    dup = np.bincount(ps[1:][eq], minlength=n_rows)
    out = np.zeros(n_rows, dtype=np.float64)
    nz = np.flatnonzero(cnt)
    out[nz] = [_round6_frac(int(d), int(c)) for d, c in zip(dup[nz], cnt[nz])]
    return out


def repetition_score_arrow(docs: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Arrow-kernel `text.repetition_score` — identical output
    (same columns, same rounded doubles, same `repetitive` flag).

    One dictionary-encode + one lexsort per (batch, n) replaces the
    SQL path's per-row sorted-gram folds; measured ~55s → seconds per
    500k docs (tools/curation_scale_bench.py, BENCH.md). Narrow plan:
    project → MapInArrow, zero exchanges."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n_rows = batch.num_rows
            flat, parents = _flat_words(batch)
            codes = pc.dictionary_encode(flat).indices.to_numpy(
                zero_copy_only=False
            )
            f2 = _dup_fracs(codes, parents, 2, n_rows)
            f3 = _dup_fracs(codes, parents, 3, n_rows)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").cast(pa.int64()),
                    pa.array(f2, type=pa.float64()),
                    pa.array(f3, type=pa.float64()),
                    pa.array(
                        (f2 >= threshold) | (f3 >= threshold),
                        type=pa.bool_(),
                    ),
                ],
                names=[
                    "doc_id",
                    "dup_2gram_frac",
                    "dup_3gram_frac",
                    "repetitive",
                ],
            )

    return docs.select("doc_id", "text").mapInArrow(
        gen,
        schema="doc_id bigint, dup_2gram_frac double, "
        "dup_3gram_frac double, repetitive boolean",
    )


def contamination_arrow(train: DataFrame, bench: DataFrame, n: int = 5) -> DataFrame:
    """Arrow-kernel `text.contamination` — identical output
    (doc_id, n_hit_grams, contaminated) for every training doc.

    The distinct benchmark grams are collected once (the bench side is
    small by definition — it is the eval suite) and shipped to
    executors as a plain Spark broadcast of RAW strings; each task
    probes them with `pc.is_in` (an Arrow C++ hash set — exact string
    equality, so there is no hash-collision re-verify step to begin
    with). Train-side grams are built by element-wise joining shifted
    slices of the flattened word array — C++ kernels, no Python
    strings — and only the HITS (a tiny fraction) reach NumPy for the
    per-doc distinct count. Narrow: scan → MapInArrow, zero exchanges
    on the corpus.

    Scale trade vs the SQL path: this broadcasts raw gram strings
    (~80 B each), the SQL path broadcasts xxhash64s (8 B) and
    re-verifies — at an eval suite of ~10M 13-grams the raw broadcast
    is ~1 GB/executor, so prefer `text.contamination` there and this
    kernel below it; both are driver-gated against the same oracle.
    """
    from cimpy_spark.functions.text import shingle_array

    bench_grams = [
        r["gram"]
        for r in bench.select(
            F.explode(shingle_array(n)).alias("gram")
        )
        .distinct()
        .collect()
    ]
    bc = train.sparkSession.sparkContext.broadcast(bench_grams)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bench_arr = pa.array(bc.value, type=pa.string())
        for batch in batches:
            n_rows = batch.num_rows
            flat, parents = _flat_words(batch)
            hits = np.zeros(n_rows, dtype=np.int64)
            if len(flat) >= n:
                w = len(flat) - (n - 1)
                valid = np.flatnonzero(parents[: 1 - n] == parents[n - 1 :])
                if len(valid):
                    take = pa.array(valid)
                    slices = [
                        pc.take(flat.slice(j, w), take) for j in range(n)
                    ]
                    grams = pc.binary_join_element_wise(*slices, " ")
                    mask = pc.is_in(grams, value_set=bench_arr).to_numpy(
                        zero_copy_only=False
                    )
                    hit_pos = np.flatnonzero(mask)
                    if len(hit_pos):
                        hit_codes = (
                            pc.dictionary_encode(pc.take(grams, pa.array(hit_pos)))
                            .indices.to_numpy(zero_copy_only=False)
                        )
                        hit_parents = parents[valid][hit_pos]
                        # distinct (doc, gram) pairs — shingle_array
                        # is the DISTINCT gram view
                        pairs = np.unique(
                            np.stack([hit_parents, hit_codes]), axis=1
                        )
                        hits = np.bincount(
                            pairs[0], minlength=n_rows
                        ).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id").cast(pa.int64()),
                    pa.array(hits, type=pa.int64()),
                    pa.array(hits > 0, type=pa.bool_()),
                ],
                names=["doc_id", "n_hit_grams", "contaminated"],
            )

    return train.select("doc_id", "text").mapInArrow(
        gen,
        schema="doc_id bigint, n_hit_grams bigint, contaminated boolean",
    )
