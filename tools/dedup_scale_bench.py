"""Incremental-dedup crossover evidence: one-shot `dedup_corpus` vs
`dedup_ingest` of a small arriving batch, at a corpus size where
signature work dominates job fixed costs.

The per-round bench (5k docs) shows ingest ≈ one-shot because BOTH
are fixed-cost-dominated there (BENCH.md round-4 note). This tool
replicates the documents table REP× with per-replica word mutations
(every 4th word salted → cross-replica Jaccard ≈ 0.1, so replicas are
distinct documents, not planted dups), bootstraps the ingest state on
all but the last slice, then times:

  A. one-shot dedup_corpus over the FULL corpus (what a naive
     pipeline re-runs per arriving batch), and
  B. dedup_ingest of the last slice against the committed state
     (what the incremental pipeline actually runs).

B's corpus-sized work is one anti-join against the seen set; its
signature fold touches only the batch. Usage:
SF_DIR=... REP=10 BATCH_PCT=10 python tools/dedup_scale_bench.py
Prints one JSON line.
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
REP = int(os.environ.get("REP", "10"))
BATCH_PCT = int(os.environ.get("BATCH_PCT", "10"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from cimpy_spark.functions.dedup import dedup_corpus, dedup_ingest
    from cimpy_spark.session import get_spark

    spark = get_spark("dedup-scale-bench", cores=CORES)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).mapInPandas(lambda it: it, schema="id long").count()

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    reps = spark.range(REP).select(F.col("id").cast("int").alias("rep"))
    # per-replica mutation: salt every 4th word -> cross-replica
    # Jaccard ~ 0.1 (distinct docs, not planted dups); replica 0 is
    # the original
    words = F.split(F.trim("text"), r"\s+")
    # two-arg transform lambda = (element, index)
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
    corpus = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            mutated.alias("text"),
            "rep",
        )
    )
    stage = tempfile.mkdtemp(prefix="dedup_scale_corpus_")
    # write at full parallelism: the signature fold is COMPUTE-bound
    # per byte, and Spark's bytes-based file splitting would pack this
    # small-but-heavy corpus into ~2 partitions (measured: the fold at
    # parallelism 2 took 95s; at 32, ~7s) — a real corpus arrives in
    # thousands of files and never hits this
    corpus.repartition(CORES).write.mode("overwrite").parquet(stage)
    corpus = spark.read.parquet(stage)
    n_total = corpus.count()

    # the arriving batch: a deterministic id-hash slice
    late = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(100)) < BATCH_PCT
    n_batch = corpus.filter(late).count()

    t0 = time.perf_counter()
    dedup_corpus(corpus.select("doc_id", "text")).count()
    one_shot_sec = round(time.perf_counter() - t0, 3)

    state = tempfile.mkdtemp(prefix="dedup_scale_state_")
    dedup_ingest(spark, corpus.filter(~late).select("doc_id", "text"), state)
    # snapshot the committed state so the broadcast and forced-shuffle
    # variants each ingest the SAME batch against the SAME bootstrap
    state_copy = state + "_shuf"
    shutil.copytree(state, state_copy)
    t0 = time.perf_counter()
    dedup_ingest(spark, corpus.select("doc_id", "text"), state).count()
    ingest_sec = round(time.perf_counter() - t0, 3)
    # the size-gate's above-threshold fallback: same ingest, touched
    # joins as plain shuffle joins (broadcast_touched_max=0) — the
    # path a corpus-scale daily batch takes
    t0 = time.perf_counter()
    dedup_ingest(
        spark, corpus.select("doc_id", "text"), state_copy,
        broadcast_touched_max=0,
    ).count()
    ingest_shuffle_sec = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "dedup_ingest_vs_one_shot",
                "value": round(one_shot_sec / ingest_sec, 3),
                "unit": "speedup",
                "docs_total": n_total,
                "docs_batch": n_batch,
                "one_shot_sec": one_shot_sec,
                "ingest_batch_sec": ingest_sec,
                "ingest_batch_shuffle_sec": ingest_shuffle_sec,
                "rep": REP,
                "base_docs": n_base,
                "cores": CORES,
            }
        )
    )
    shutil.rmtree(stage, True)
    shutil.rmtree(state, True)
    shutil.rmtree(state_copy, True)
    spark.stop()


if __name__ == "__main__":
    main()
