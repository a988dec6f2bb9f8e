"""Scaling-efficiency evidence for the CURATION path (VERDICT r5 #4):
the same one-shot `dedup_corpus` job at two parallelism levels on
identical input. The ≥0.8 two-cluster-size criterion (BASELINE.md)
was previously evidenced only on the extraction path; this tool
applies the identical discipline to a shuffle-bearing curation
operator.

Method (mirrors scaling_bench.py):
- input: sf0.1 documents replicated ×REP with per-replica word
  mutations (every 4th word salted → replicas are distinct docs, not
  planted dups — same recipe as tools/curation_scale_bench.py),
  staged once as parquet with a constant partition count, read by
  BOTH levels (identical physical tasks; the vectorized scan is part
  of the measured job, as it would be on a cluster);
- each level runs in its own subprocess (fresh JVM), taskset-pinned
  to exactly that many CPUs so the low level cannot borrow idle
  cores for GC/Arrow housekeeping;
- each pass constructs a FRESH dedup_corpus plan (the operator
  localCheckpoints its signature stages; reusing one DataFrame would
  time cache hits, not the job) and forces every output column via
  a hash-all-columns aggregate;
- one untimed warmup pass, then median of TIMED_RUNS fresh passes.

Usage: REP=100 SCALING_BASE_CORES=4 python tools/scaling_dedup.py
Prints one JSON line with throughput at both levels + efficiency.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "100"))
# DEDUP_FAMILY selects the signature family: "v2"/"xxh64" = the
# (post-r7-graduation) default xxhash64 family, "v1"/"md5" = the
# legacy md5 family, passed EXPLICITLY — dedup_corpus's own
# default moved to xxh64 in r7, so the old bare-call v1 label
# would silently measure xxh64
FAMILY = os.environ.get("DEDUP_FAMILY", "v2")
if FAMILY not in ("v1", "md5", "v2", "xxh64"):
    # fail loud BEFORE the expensive corpus staging — a typo must not
    # silently measure the wrong family
    raise SystemExit(
        f"DEDUP_FAMILY must be v1/md5 or v2/xxh64, got {FAMILY!r}"
    )
N_BASE = int(os.environ.get("SCALING_BASE_CORES", "4"))
N_PARTITIONS = int(os.environ.get("SCALING_PARTITIONS", "64"))
TIMED_RUNS = int(os.environ.get("TIMED_RUNS", "3"))
STAGE_DIR = os.environ.get("STAGE_DIR", "/tmp/scaling_dedup_corpus")


def stage_corpus() -> None:
    """Build the mutated ×REP corpus once; both levels read it."""
    from pyspark.sql import functions as F

    from cimpy_spark.session import get_spark

    spark = get_spark("scaling-dedup-stage", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
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
    )
    corpus.repartition(N_PARTITIONS).write.mode("overwrite").parquet(STAGE_DIR)
    spark.stop()


def run_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    import functools

    from cimpy_spark.functions.dedup import dedup_corpus
    from cimpy_spark.session import get_spark

    fam = "xxh64" if FAMILY in ("v2", "xxh64") else "md5"
    op = functools.partial(dedup_corpus, family=fam)

    spark = get_spark(f"scaling-dedup-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(STAGE_DIR)
    n_docs = docs.count()

    def one_pass() -> float:
        t0 = time.perf_counter()
        out = op(docs)
        out.select(
            F.sum(F.pmod(F.xxhash64(*out.columns), F.lit(1_000_000_007)))
            .alias("h")
        ).collect()
        return time.perf_counter() - t0

    one_pass()  # warmup: worker fork, JIT, page cache
    times = [one_pass() for _ in range(TIMED_RUNS)]
    sec = statistics.median(times)
    spark.stop()
    return {
        "cores": cores,
        "docs": n_docs,
        "sec": round(sec, 3),
        "docs_per_sec": round(n_docs / sec, 1),
        "runs": [round(t, 3) for t in times],
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        print("RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return

    stage_corpus()
    results = {}
    for cores in (N_BASE, 4 * N_BASE):
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, os.path.abspath(__file__), "--level", str(cores)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-3000:], proc.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"level {cores} failed")
        results[cores] = json.loads(line[-1][len("RESULT "):])

    lo, hi = N_BASE, 4 * N_BASE
    eff = round(
        (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / 4, 3
    )
    print(json.dumps({
        "metric": f"dedup_corpus_{FAMILY}_scaling_efficiency_{lo}_to_{hi}",
        "value": eff,
        "unit": "ratio",
        "levels": results,
        "sf_dir": SF_DIR,
        "rep": REP,
        "partitions": N_PARTITIONS,
        "loadavg": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
