"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Everything is built from JVM-side column expressions over a portable
hash (md5 of strings), so results are engine-independent — the same
computation is expressible in DuckDB for the correctness oracle, and
the lexicographic min of ``md5(shingle || '#' || seed)`` is a valid
MinHash permutation family (each seed suffix induces an independent
uniform order on shingles).

Scale notes (100 TB corpus):
- shingling/explode is narrow; the only shuffles are the per-(doc,
  seed) min aggregation (map-side partial min applies) and the band
  self-join.
- the band join's key cardinality ≈ n_docs × n_bands with near-unique
  keys; true near-dup clusters create small groups, giant clusters
  (boilerplate) create skew — AQE skew-join handles it, and the
  candidate-pair explosion is bounded per bucket by `max_bucket`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cimpy_spark.functions.text import shingles

N_HASHES = 12
N_BANDS = 4  # rows-per-band r = 3


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup groups: (text_hash, n_docs, canonical_doc_id) for
    hash groups with >1 member; canonical = min doc_id (deterministic
    election, as in canonicalization)."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, seed, h): per-seed MinHash values over word 3-gram
    shingles."""
    sh = shingles(docs, n=3)
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
        "shingle",
    )
    return seeded.groupBy("doc_id", "seed").agg(
        F.min(F.md5(F.concat_ws("#", "shingle", "seed"))).alias("h")
    )


def lsh_band_keys(
    signatures: DataFrame, n_bands: int = N_BANDS, n_hashes: int = N_HASHES
) -> DataFrame:
    """(doc_id, band, band_key): hash each band's signature rows
    (ordered by seed) into one bucket key. ``n_hashes`` must match the
    signature width actually passed in (banding is seed-arithmetic)."""
    rows_per_band = n_hashes // n_bands
    banded = signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.concat_ws(
                "",
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seed", "h"))),
                        lambda x: x["h"],
                    ),
                    "",
                ),
            )
        ).alias("band_key")
    )


def minhash_candidates(
    docs: DataFrame, n_hashes: int = N_HASHES, n_bands: int = N_BANDS
) -> DataFrame:
    """Near-duplicate candidate pairs (doc_a < doc_b) sharing any LSH
    band bucket."""
    keys = lsh_band_keys(
        minhash_signatures(docs, n_hashes), n_bands=n_bands, n_hashes=n_hashes
    )
    a = keys.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    b = keys.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact word-3-gram Jaccard similarity for candidate pairs —
    the verify stage after LSH: (doc_a, doc_b, jaccard)."""
    sh = shingles(docs, n=3)
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .fillna(0, ["n_inter"])
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") * F.lit(1.0)
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def simhash(docs: DataFrame, n_bits: int = 16) -> DataFrame:
    """16-bit SimHash over distinct word tokens: bit j of a token's
    md5 (parity of hex digit j) votes ±1; the sign of each bit-sum is
    the fingerprint bit. (doc_id, simhash int)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), "\\s+"))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(1), F.lit(n_bits))).alias("j"),
    ).withColumn(
        "vote",
        F.when(
            F.expr("(instr('0123456789abcdef', substring(h, j, 1)) - 1) % 2") == 1,
            F.lit(1),
        ).otherwise(F.lit(-1)),
    )
    bitsum = bits.groupBy("doc_id", "j").agg(F.sum("vote").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("j") - 1)).otherwise(F.lit(0.0))
        )
        .cast("long")
        .alias("simhash")
    )
