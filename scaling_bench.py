"""Scaling-efficiency evidence (BASELINE.json north_rule): the same
triple-extraction job at two parallelism levels on identical input.

A real N→4N-executor comparison needs a cluster; the sandbox stand-in
is local[8] vs local[32] (same machine, same input, same code). Each
level runs in its own subprocess (fresh JVM) to avoid cross-talk.

Method per level:
- input: transcripts derived from sf0.1 events, replicated ×40
  (4M turns), repartitioned to a constant 128 partitions and cached
  (identical physical tasks at both levels; timed runs measure
  extraction, not the parquet scan or the window);
- one untimed warmup pass (Python worker fork + import cost is
  startup, not throughput);
- median of 3 timed extraction passes → turns/sec;
- each level taskset-pinned to exactly that many CPUs so the small
  level cannot borrow idle cores for JVM housekeeping.

Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPLICATION = int(os.environ.get("SCALING_REPLICATION", "40"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# constant across levels: the SAME physical job (identical tasks) runs
# at both parallelism levels — only concurrency differs, as on a real
# N vs 4N cluster. Sized so each task is big enough to amortize the
# Arrow round-trip (~30k rows/task).
N_PARTITIONS = int(os.environ.get("SCALING_PARTITIONS", "128"))


def run_level(cores: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from cimpy_spark.session import get_spark
    from cimpy_spark.fixtures.events_transcripts import transcripts_from_events
    from cimpy_spark.operators.extract import extract_triples

    spark = get_spark(f"scaling-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    base = transcripts_from_events(spark, SF_DIR)
    reps = spark.range(REPLICATION).select(F.col("id").alias("rep"))
    transcripts = (
        base.crossJoin(reps)
        .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
        .drop("rep")
        .repartition(N_PARTITIONS)
        .cache()
    )
    n_turns = transcripts.count()

    triples = extract_triples(transcripts)
    triples.count()  # warmup: fork workers, JIT, fill page cache

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_triples = triples.count()
        times.append(time.perf_counter() - t0)
    sec = statistics.median(times)
    out = {
        "cores": cores,
        "turns": n_turns,
        "triples": n_triples,
        "sec": round(sec, 3),
        "turns_per_sec": round(n_turns / sec, 1),
        "runs": [round(t, 3) for t in times],
    }
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        print("RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return

    results = {}
    for cores in (8, 32):
        # taskset confines the WHOLE process tree (JVM, GC threads,
        # python workers) to exactly `cores` CPUs — local[N] alone
        # would let the low level borrow idle cores for GC/Arrow and
        # inflate the baseline. This emulates a machine of that size.
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, os.path.abspath(__file__), "--level", str(cores)],
            capture_output=True,
            text=True,
            timeout=1200,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-3000:], proc.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"level {cores} failed")
        results[cores] = json.loads(line[-1][len("RESULT "):])

    thr8 = results[8]["turns_per_sec"]
    thr32 = results[32]["turns_per_sec"]
    eff = round((thr32 / thr8) / 4, 3)
    summary = {
        "metric": "extract_scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "levels": results,
        "sf_dir": SF_DIR,
        "replication": REPLICATION,
    }
    print(json.dumps(summary))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — measured throughput & scaling efficiency\n\n"
            "Triple-extraction throughput for the same job on the same input\n"
            f"({results[8]['turns']:,} turns = sf0.1 events-derived transcripts ×{REPLICATION}),\n"
            "at two parallelism levels (sandbox stand-in for N vs 4N executors;\n"
            "fresh JVM per level, warmup pass excluded, median of 3 runs).\n\n"
            "| parallelism | turns | sec (median) | turns/sec |\n"
            "|---|---|---|---|\n"
            f"| local[8] | {results[8]['turns']:,} | {results[8]['sec']} | {thr8:,} |\n"
            f"| local[32] | {results[32]['turns']:,} | {results[32]['sec']} | {thr32:,} |\n\n"
            f"**Scaling efficiency (8→32 cores): (thr32/thr8)/4 = {eff}**"
            f" (target ≥ 0.8)\n\n"
            f"Raw runs: local[8] {results[8]['runs']}, local[32] {results[32]['runs']}.\n\n"
            "Reproduce: `python scaling_bench.py` (env: SPARK_GRAFT_SF_DIR,\n"
            "SCALING_REPLICATION).\n"
        )


if __name__ == "__main__":
    main()
