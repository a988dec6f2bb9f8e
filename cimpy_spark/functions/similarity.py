"""Similarity search over the `embeddings` table
(vec_id, embedding array<float>, label).

- Brute-force cosine top-k: the correctness baseline. Dot products are
  computed JVM-side with `zip_with` + `aggregate` (ordered left fold,
  double precision) — no Python in the loop.
- Hyperplane-LSH bucketing: the scale path — assign each vector to a
  2^P-bucket signature so candidate generation becomes a bucket
  equi-join instead of a cross join. Hyperplane components are a
  deterministic ±1 pattern (portable to the SQL oracle; a real
  deployment would broadcast gaussian planes — identical plumbing).
- Near-dup pairs: cosine ≥ threshold within LSH buckets.

Scale notes: brute-force is O(Q×N) — fine for Q small (broadcast the
queries side, which Catalyst chooses automatically for a tiny dim
table); the LSH path turns all-pairs into per-bucket joins with
AQE-managed skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _as_double(col):
    return F.col(col).cast("array<double>")


def cosine_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Brute-force cosine top-k neighbors for query vectors
    (vec_id < n_queries), excluding self. Rank on the rounded
    similarity with vec_id tie-break so ordering is engine-stable.
    Output: (query_id, neighbor_id, rank, sim)."""
    base = embeddings.select("vec_id", _as_double("embedding").alias("emb"))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    pairs = F.broadcast(q).crossJoin(
        base.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb"))
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qemb"), F.col("nemb"))
            / (_norm(F.col("qemb")) * _norm(F.col("nemb"))),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): sign pattern of n_planes deterministic
    hyperplanes packed into an int. Hyperplane p component i (1-based)
    is +1 iff (p*131 + i*37) % 7 < 3 — portable to SQL."""
    pos = embeddings.select(
        "vec_id", F.posexplode(_as_double("embedding")).alias("i0", "v")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "v")
    planes = pos.select(
        "vec_id",
        "v",
        "i",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("p"),
    ).withColumn(
        "hcomp",
        F.when((F.col("p") * 131 + F.col("i") * 37) % 7 < 3, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        ),
    )
    signs = planes.groupBy("vec_id", "p").agg(
        F.sum(F.col("v") * F.col("hcomp")).alias("s")
    )
    return signs.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("p"))).otherwise(F.lit(0.0))
        )
        .cast("int")
        .alias("bucket")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: coarse quantizer = per-`label` centroids (the
    stand-in for k-means cells — identical plumbing), queries probe
    the `nprobe` nearest cells and rank exactly within them.

    Scale path vs brute force: candidate set shrinks from N to
    N×nprobe/n_cells; the centroid table is tiny and broadcast. May
    miss neighbors outside probed cells — that recall/cost trade IS
    the IVF contract. Output: (query_id, neighbor_id, rank, sim).
    """
    base = embeddings.select("vec_id", "label", _as_double("embedding").alias("emb"))
    dim_idx = base.select(
        "vec_id", "label", F.posexplode("emb").alias("i", "v")
    )
    centroids = (
        dim_idx.groupBy("label", "i")
        .agg(F.round(F.avg("v"), 9).alias("c"))  # rounded → engine-stable
        .groupBy("label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "c"))), lambda x: x["c"]
            ).alias("cemb")
        )
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    # rank cells per query by centroid cosine, keep nprobe
    qc = F.broadcast(q).crossJoin(F.broadcast(centroids))
    cell_sim = qc.select(
        "query_id",
        "label",
        F.round(
            _dot(F.col("qemb"), F.col("cemb"))
            / (_norm(F.col("qemb")) * _norm(F.col("cemb"))),
            6,
        ).alias("csim"),
    )
    wcell = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("label").asc()
    )
    probed = (
        cell_sim.withColumn("crk", F.row_number().over(wcell))
        .filter(F.col("crk") <= nprobe)
        .select("query_id", "label")
    )
    # exact rank within probed cells
    cand = (
        probed.join(q, "query_id")
        .join(base, "label")
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    sims = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qemb"), F.col("emb"))
            / (_norm(F.col("qemb")) * _norm(F.col("emb"))),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b) with
    sim ≥ threshold, candidates restricted to shared LSH buckets
    (identical vectors always share a bucket, so exact dups are never
    missed). Output: (vec_a, vec_b, sim)."""
    base = embeddings.select("vec_id", _as_double("embedding").alias("emb"))
    buckets = lsh_buckets(embeddings)
    v = base.join(buckets, "vec_id")
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"), "bucket"
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"), "bucket"
    )
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    sims = cand.select(
        "vec_a",
        "vec_b",
        F.round(
            _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))),
            6,
        ).alias("sim"),
    )
    return sims.filter(F.col("sim") >= threshold).select("vec_a", "vec_b", "sim").distinct()
