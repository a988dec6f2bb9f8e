"""Graph-battery wall-time at ~100× the gated fixture (round 6): the
graph operators are gated for CORRECTNESS on the sf0.01 canonical
graph (27 nodes); this tool shows their plan shapes HOLD on a graph
five orders of magnitude bigger — a deterministic preferential-
attachment-style multigraph (power-law in-degree, the skew shape the
hub caps exist for), built WITHOUT RNG so runs are reproducible.

Graph: N nodes, E edges; edge i connects src = i mod N to
dst = xxhash64(i) mod (i mod N + 1) — later nodes attach toward
low-id nodes with hub skew (node 0 collects ~harmonic share). Built
entirely JVM-side from spark.range (no driver loop, no Python).

Usage: NODES=1000000 EDGES=5000000 python tools/graph_scale_bench.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = int(os.environ.get("NODES", "1000000"))
EDGES = int(os.environ.get("EDGES", "5000000"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from cimpy_spark import pipeline as P
    from cimpy_spark.session import get_spark

    spark = get_spark("graph-scale-bench", cores=CORES)
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.range(EDGES).select(
        F.concat(F.lit("N"), (F.col("id") % NODES).cast("string")).alias("src"),
        F.concat(
            F.lit("N"),
            F.pmod(F.xxhash64("id"), (F.col("id") % NODES) + 1).cast("string"),
        ).alias("dst"),
        F.lit("rel").alias("pred"),
    )
    stage = "/tmp/graph_scale_edges"
    e.repartition(CORES).write.mode("overwrite").parquet(stage)
    edges = spark.read.parquet(stage)
    n_edges = edges.count()

    timings = {}

    def force(df):
        return df.select(
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007)))
            .alias("h")
        ).collect()

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 2)

    timed("degree_distribution", lambda: force(P.degree_distribution(edges)))
    timed("pagerank_5", lambda: force(P.pagerank(edges, iters=5)))
    timed("lpa_2", lambda: force(P.lpa_communities(edges, iters=2)))
    timed("kcore_k3", lambda: force(P.kcore(edges, k=3, rounds=4)))
    timed("triangles", lambda: force(P.triangle_stats(edges)))

    print(json.dumps({
        "metric": "graph_battery_at_scale",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "nodes": NODES,
        "edges": n_edges,
        "cores": CORES,
        "loadavg": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
