"""Scale check for the round-7 operators: dsir_weights at 100× the
doc fixture (500k docs, the curation_scale_bench recipe) and semdedup
at 200× the embedding fixture (100k vectors) with k scaled the way
the operator contract prescribes (cells stay O(10²-10³); the
within-cell pairwise Σ|c|² is the op's intrinsic cost).

Prints one JSON line. Usage:
  REP=100 EMB_REP=200 SEMDEDUP_K=256 python tools/scale_r7_ops.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "100"))

# must stay < 101 (the perturbation modulus) or factor patterns repeat
EMB_REP = int(os.environ.get("EMB_REP", "100"))
K = int(os.environ.get("SEMDEDUP_K", "256"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    from pyspark.sql import functions as F

    from cimpy_spark.functions import similarity as S
    from cimpy_spark.functions import text as T
    from cimpy_spark.session import get_spark

    spark = get_spark("scale-r7", cores=CORES)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).mapInPandas(lambda it: it, schema="id long").count()

    out = {"cores": CORES, "load0": round(os.getloadavg()[0], 1)}

    def force(df):
        return df.select(
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007)))
            .alias("h")
        ).collect()

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 2)

    # ---- dsir_weights at 500k docs (curation_scale_bench recipe) ----
    if which in ("dsir", "all"):
        _dsir(spark, F, T, out, force, timed)
    if which in ("semdedup", "all"):
        _semdedup(spark, F, S, out)

    out["load1"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out), flush=True)
    spark.stop()


def _dsir(spark, F, T, out, force, timed) -> None:
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    reps = spark.range(REP).select(F.col("id").cast("int").alias("rep"))
    words = F.split(F.trim("text"), r"\s+")
    mutated = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                (i % 4 == 3) & (F.col("rep") > 0),
                F.concat(w, F.lit("_r"), F.col("rep").cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    corpus = base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        mutated.alias("text"),
        "source",
    )
    dstage = tempfile.mkdtemp(prefix="scale_r7_docs_")
    corpus.repartition(CORES).write.mode("overwrite").parquet(dstage)
    docs = spark.read.parquet(dstage)
    out["n_docs"] = docs.count()
    timed(
        "dsir_weights",
        lambda: force(T.dsir_weights(docs, target_source="src0")),
    )
    shutil.rmtree(dstage, ignore_errors=True)


def _semdedup(spark, F, S, out) -> None:
    # ---- semdedup at EMB_REP× the embedding fixture -----------------
    # replicas are deterministically DIRECTIONALLY perturbed — a
    # per-(rep, coordinate) factor, NOT a scalar multiple or a roll
    # that repeats mod dim (a scalar never changes cosine and a
    # repeating roll plants unintended exact dups; first cut of this
    # bench dropped 69% of the corpus that way) — plus every 11th
    # rep-0 vector keeps an amplitude-modulated copy (cos ≈ 0.98) so
    # the drop path stays live at scale
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    ereps = spark.range(EMB_REP).select(F.col("id").cast("int").alias("rep"))
    # zero-mean per-(rep, coordinate) factor over a prime modulus
    # larger than EMB_REP: patterns never repeat across reps (no
    # accidental exact dups) and two reps' factor patterns are
    # ~uncorrelated, putting cross-rep cosine ≈ 0.8 < threshold
    perturbed = F.transform(
        "embedding",
        lambda x, i: x
        * (
            F.lit(1.0)
            + (
                F.pmod((i + 1) * (F.col("rep") * 31 + 7), F.lit(101))
                - F.lit(50)
            )
            * F.lit(0.016)
        ),
    )
    big = emb.crossJoin(ereps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        perturbed.alias("embedding"),
    )
    dup = big.filter(
        (F.col("vec_id") % 11 == 2) & (F.col("vec_id") < 10_000_000)
    ).select(
        (F.col("vec_id") + 10_000_000 * EMB_REP + 1).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * F.when(i % 2 == 0, F.lit(1.2)).otherwise(F.lit(0.8)),
        ).alias("embedding"),
    )
    estage = tempfile.mkdtemp(prefix="scale_r7_emb_")
    big.unionByName(dup).repartition(CORES).write.mode("overwrite").parquet(
        estage
    )
    vecs = spark.read.parquet(estage)
    out["n_vecs"] = vecs.count()
    out["semdedup_k"] = K

    res = S.semdedup(vecs, k=K, iters=2, threshold=0.95)
    t0 = time.perf_counter()
    agg = res.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(~F.col("is_kept"), 1).otherwise(0)).alias("dropped"),
    ).collect()[0]
    out["semdedup"] = round(time.perf_counter() - t0, 2)
    out["semdedup_rows"] = agg["n"]
    out["semdedup_dropped"] = agg["dropped"]
    shutil.rmtree(estage, ignore_errors=True)


if __name__ == "__main__":
    main()
