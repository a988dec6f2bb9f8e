"""Wall-time of the round-5 curation operators at 100× fixture scale
(500k docs ≈ 28M words, same ×REP replication recipe as
dedup_scale_bench.py): the gates prove correctness at sf0.01; this
shows the plan shapes HOLD when the corpus grows two orders of
magnitude — near-linear input-bound scans, no blowups. Prints one
JSON line. Usage: REP=100 python tools/curation_scale_bench.py"""

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
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from cimpy_spark.functions import text as T
    from cimpy_spark.session import get_spark

    spark = get_spark("curation-scale-bench", cores=CORES)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).mapInPandas(lambda it: it, schema="id long").count()

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
    stage = tempfile.mkdtemp(prefix="curation_scale_")
    # compute-sized partitions (see dedup_scale_bench partitioning note)
    corpus.repartition(CORES).write.mode("overwrite").parquet(stage)
    docs = spark.read.parquet(stage)
    n = docs.count()

    timings = {}

    def force(df):
        # count() prunes ALL columns (a projection's compute may not
        # run at all) — hash every output column to force evaluation
        return df.select(
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007)))
            .alias("h")  # pmod keeps the ANSI sum from overflowing
        ).collect()

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 2)

    timed("pack_sequences", lambda: force(T.pack_sequences(docs, n_shards=CORES)))
    timed("mixture_sample", lambda: force(T.mixture_sample(docs)))
    timed("pii_scrub", lambda: force(T.pii_scrub(docs)))
    timed("repetition_score", lambda: force(T.repetition_score(docs)))
    timed("chunk_documents", lambda: force(T.chunk_documents(docs)))
    timed("vocab_sketch", lambda: force(T.vocab_sketch(docs)))
    timed("heavy_hitters_cms", lambda: force(T.heavy_hitters_cms(docs)))
    timed("hash_split", lambda: force(T.hash_split(docs)))
    # hash-family comparison (VERDICT r5 #3): identical plan shape
    # (zero-shuffle per-row array_min fold); only the per-shingle
    # hash differs — md5 hex string vs xxhash64 long
    timed("fingerprint_md5", lambda: force(T.fingerprint(docs)))
    timed("fingerprint_v2_xxh64", lambda: force(T.fingerprint_v2(docs)))
    timed("gopher_rules", lambda: force(T.gopher_rules(docs, min_mean_len=4.5)))
    timed("dup_spans", lambda: force(T.dup_spans(docs)))
    timed("bm25_score", lambda: force(T.bm25_score(docs)))
    timed("contamination", lambda: force(T.contamination(
        docs, docs.limit(500), n=5
    )))
    # round-5 continuation ops
    from cimpy_spark.fixtures.organic import lined_documents
    from cimpy_spark.functions import bpe as B
    from cimpy_spark.functions import dedup as D

    timed("line_dedup", lambda: force(T.line_dedup(lined_documents(docs))))
    timed("setsim_join", lambda: force(D.setsim_join(docs)))
    timed("bpe_merges_k8", lambda: force(B.bpe_merges(docs, k=8)))
    timed("bpe_token_count", lambda: force(B.bpe_token_count(docs, k=8)))
    timed("script_profile", lambda: force(T.script_profile(docs)))
    timed("mad_outliers", lambda: force(T.mad_outliers(docs)))
    timed("source_terms", lambda: force(T.source_terms(docs)))
    timed("epoch_allocation", lambda: force(T.epoch_allocation(docs)))
    # Arrow-kernel variants of the two heaviest ops (text_arrow.py) —
    # same outputs bit-for-bit (tests/test_text_arrow.py), measured
    # here against their SQL twins on the identical corpus
    from cimpy_spark.functions import text_arrow as TA

    timed(
        "repetition_score_arrow",
        lambda: force(TA.repetition_score_arrow(docs)),
    )
    timed("dup_spans_arrow", lambda: force(TA.dup_spans_arrow(docs)))
    timed("contamination_arrow", lambda: force(TA.contamination_arrow(
        docs, docs.limit(500), n=5
    )))

    print(json.dumps({
        "metric": "curation_ops_at_100x",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "docs": n,
        "rep": REP,
        "cores": CORES,
        "loadavg": round(os.getloadavg()[0], 2),
    }))
    shutil.rmtree(stage, True)
    spark.stop()


if __name__ == "__main__":
    main()
