"""Round-7-continuation ops at ~4-5 orders of magnitude over their
gate fixtures: ppr, walk_corpus, wl_colors, linkpred_eval on the same
deterministic hub-skewed multigraph as tools/graph_scale_bench.py
(src uniform, dst preferential toward low ids — node 0's undirected
degree ≈ (E/N)·H_N), plus containment_join on a 500k-doc derived
corpus (same generator as tools/curation_scale_bench.py's inputs).
The gates verify CORRECTNESS at sf0.01; this shows the PLANS hold
when the hubs and vocabularies are real.

Usage: NODES=1000000 EDGES=5000000 DOCS=500000 \
       python tools/scale_rank_ops.py
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
DOCS = int(os.environ.get("DOCS", "500000"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from cimpy_spark import pipeline as P
    from cimpy_spark.functions import dedup as D
    from cimpy_spark.session import get_spark

    spark = get_spark("scale-rank-ops", cores=CORES)
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
    stage = "/tmp/scale_rank_edges"
    e.repartition(CORES).write.mode("overwrite").parquet(stage)
    edges = spark.read.parquet(stage)
    n_edges = edges.count()

    # synthetic type dictionary for wl_colors / ppr seeds: 5 types by
    # id hash, seeds = type T0 (~N/5 nodes — the catalog-slice shape)
    ents = spark.range(NODES).select(
        F.concat(F.lit("N"), F.col("id").cast("string")).alias("entity_id"),
        F.concat(
            F.lit("T"), F.pmod(F.xxhash64("id"), F.lit(5)).cast("string")
        ).alias("type"),
    )
    seeds = ents.filter(F.col("type") == "T0").select("entity_id")

    timings = {}

    def force(df):
        return df.select(
            F.sum(
                F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))
            ).alias("h")
        ).collect()

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 2)

    timed("ppr_4", lambda: force(P.ppr(edges, seeds, iters=4)))
    timed(
        "walks_w1_l3",
        lambda: force(P.walk_corpus(edges, walks_per_node=1, length=3)),
    )
    timed("wl_colors_2", lambda: force(P.wl_colors(edges, ents, rounds=2)))
    timed("linkpred_eval_k2", lambda: force(P.linkpred_eval(edges, k=2)))

    # containment on a derived 500k-doc corpus: base docs + planted
    # truncations (the operator's target shape), ~40 words each
    base = spark.range(DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id") + F.lit(j * DOCS)),
                        F.lit(50_000),
                    ).cast("string"),
                )
                for j in range(40)
            ],
        ).alias("text"),
    )
    trunc = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).cast("long").alias("doc_id"),
        # first ~60% of the words: a contained excerpt
        F.array_join(
            F.slice(F.split("text", " "), 1, 24), " "
        ).alias("text"),
    )
    corpus = base.unionByName(trunc)
    cstage = "/tmp/scale_rank_docs"
    corpus.repartition(CORES).write.mode("overwrite").parquet(cstage)
    docs = spark.read.parquet(cstage)
    n_docs = docs.count()

    timed(
        "containment_9_10",
        lambda: force(D.containment_join(docs, num=9, den=10)),
    )

    # quality wave: an 8-attr node table over NODES entities (a1
    # derived from the entity id so one FD genuinely holds), typed
    # 5 ways; impute over a ~1/5 holdout with the threshold off so
    # the output is the full modal-suggestion surface
    nodes_tbl = spark.range(NODES * 8).select(
        F.concat(F.lit("E"), (F.col("id") % NODES).cast("string")).alias(
            "entity_id"
        ),
        F.concat(
            F.lit("a"), (F.col("id") / NODES).cast("int").cast("string")
        ).alias("attr"),
        F.when(
            (F.col("id") / NODES).cast("int") == 1,
            F.pmod(F.xxhash64(F.col("id") % NODES), F.lit(2)).cast(
                "string"
            ),
        )
        .otherwise(
            F.pmod(F.xxhash64("id"), F.lit(100)).cast("string")
        )
        .alias("value"),
        F.lit("user").alias("profile"),
    )
    nstage = "/tmp/scale_rank_nodes"
    nodes_tbl.repartition(CORES).write.mode("overwrite").parquet(nstage)
    nodes_tbl = spark.read.parquet(nstage)
    cmap = ents.select(
        "entity_id", F.col("entity_id").alias("canonical_id")
    )
    timed("funcdeps", lambda: force(P.funcdeps(nodes_tbl)))
    held = nodes_tbl.filter(
        F.pmod(F.xxhash64("entity_id", "attr"), F.lit(5)) != 0
    )
    timed(
        "attr_impute",
        lambda: force(P.attr_impute(held, ents, cmap, num=0, den=1)),
    )

    # PQ at VECS 64-dim synthetic vectors: code table is VECS·m rows,
    # ADC is that table joined to a broadcast LUT + one integer sum
    from cimpy_spark.functions import similarity as SIM

    VECS = int(os.environ.get("VECS", "500000"))
    emb = spark.range(VECS).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(
                        F.xxhash64(F.col("id") + F.lit(i * VECS)),
                        F.lit(2_000),
                    ).cast("double")
                    / F.lit(1_000.0)
                    - F.lit(1.0)
                )
                for i in range(64)
            ]
        ).alias("embedding"),
    )
    estage = "/tmp/scale_rank_emb"
    emb.repartition(CORES).write.mode("overwrite").parquet(estage)
    emb = spark.read.parquet(estage)
    timed(
        "pq_topk",
        lambda: force(
            SIM.pq_topk(emb, m=4, k=16, iters=2, n_queries=8, topk=10)
        ),
    )

    print(
        json.dumps(
            {
                "metric": "rank_ops_at_scale",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "nodes": NODES,
                "edges": n_edges,
                "docs": n_docs,
                "cores": CORES,
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
