"""Scaling-efficiency evidence for the GRAPH path: the same
wl_colors job (a representative multi-round join+aggregate graph
operator — two edge⋈color joins, one combinable sig count, one
per-node collect per round, checkpointed) at two pinned parallelism
levels on the identical staged hub-skewed graph. Complements the
extraction-path (0.816 quiet, r7) and curation-path (0.667 xxh64,
r7) scaling evidence with the third workload class the engine
carries.

Method identical to tools/scaling_dedup.py: stage once at a constant
partition count, run each level in its own taskset-pinned fresh JVM,
fresh plan per pass (the operator checkpoints internally), one
warmup then median of TIMED_RUNS.

Usage: NODES=1000000 EDGES=5000000 SCALING_BASE_CORES=4 \
       python tools/scaling_graph.py
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

NODES = int(os.environ.get("NODES", "1000000"))
EDGES = int(os.environ.get("EDGES", "5000000"))
ROUNDS = int(os.environ.get("WL_ROUNDS", "2"))
N_BASE = int(os.environ.get("SCALING_BASE_CORES", "4"))
N_PARTITIONS = int(os.environ.get("SCALING_PARTITIONS", "64"))
TIMED_RUNS = int(os.environ.get("TIMED_RUNS", "3"))
STAGE = os.environ.get("STAGE_DIR", "/tmp/scaling_graph_edges")
ENT_STAGE = STAGE + "_ents"


def stage_graph() -> None:
    from pyspark.sql import functions as F

    from cimpy_spark.session import get_spark

    spark = get_spark("scaling-graph-stage", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.range(EDGES).select(
        F.concat(F.lit("N"), (F.col("id") % NODES).cast("string")).alias(
            "src"
        ),
        F.concat(
            F.lit("N"),
            F.pmod(F.xxhash64("id"), (F.col("id") % NODES) + 1).cast(
                "string"
            ),
        ).alias("dst"),
        F.lit("rel").alias("pred"),
    )
    e.repartition(N_PARTITIONS).write.mode("overwrite").parquet(STAGE)
    ents = spark.range(NODES).select(
        F.concat(F.lit("N"), F.col("id").cast("string")).alias("entity_id"),
        F.concat(
            F.lit("T"), F.pmod(F.xxhash64("id"), F.lit(5)).cast("string")
        ).alias("type"),
    )
    ents.repartition(N_PARTITIONS).write.mode("overwrite").parquet(
        ENT_STAGE
    )
    spark.stop()


def run_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    from cimpy_spark import pipeline as P
    from cimpy_spark.session import get_spark

    spark = get_spark(f"scaling-graph-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(STAGE)
    ents = spark.read.parquet(ENT_STAGE)
    n_edges = edges.count()

    def one_pass() -> float:
        t0 = time.perf_counter()
        out = P.wl_colors(edges, ents, rounds=ROUNDS)
        out.select(
            F.sum(F.pmod(F.xxhash64(*out.columns), F.lit(1_000_000_007)))
            .alias("h")
        ).collect()
        return time.perf_counter() - t0

    one_pass()
    times = [one_pass() for _ in range(TIMED_RUNS)]
    sec = statistics.median(times)
    spark.stop()
    return {
        "cores": cores,
        "edges": n_edges,
        "sec": round(sec, 3),
        "edges_per_sec": round(n_edges / sec, 1),
        "runs": [round(t, 3) for t in times],
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        print("RESULT " + json.dumps(run_level(int(sys.argv[2]))))
        return

    stage_graph()
    results = {}
    for cores in (N_BASE, 4 * N_BASE):
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, os.path.abspath(__file__),
             "--level", str(cores)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [
            l for l in proc.stdout.splitlines() if l.startswith("RESULT ")
        ]
        if not line:
            print(proc.stdout[-3000:], proc.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"level {cores} failed")
        results[cores] = json.loads(line[-1][len("RESULT "):])

    lo, hi = N_BASE, 4 * N_BASE
    eff = round(
        (results[hi]["edges_per_sec"] / results[lo]["edges_per_sec"]) / 4, 3
    )
    print(json.dumps({
        "metric": f"wl_colors_scaling_efficiency_{lo}_to_{hi}",
        "value": eff,
        "unit": "ratio",
        "levels": results,
        "nodes": NODES,
        "rounds": ROUNDS,
        "partitions": N_PARTITIONS,
        "loadavg": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
