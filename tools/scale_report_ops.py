"""Scale check for the round-7 graph-QA/report wave:
community_conductance on the 1M-node/5M-edge hub-skewed graph
(graph_scale_bench's deterministic generator), and token_entropy +
dup_cluster_stats at REP× the sf0.1 document fixture (500k docs at
the default REP=100, the curation_scale_bench mutation recipe so
replicas aren't verbatim copies).

Prints one JSON line. Usage:
  NODES=1000000 EDGES=5000000 REP=100 python tools/scale_report_ops.py
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
NODES = int(os.environ.get("NODES", "1000000"))
EDGES = int(os.environ.get("EDGES", "5000000"))
REP = int(os.environ.get("REP", "100"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    from pyspark.sql import functions as F

    from cimpy_spark import pipeline as P
    from cimpy_spark.functions import dedup as D
    from cimpy_spark.functions import text as T
    from cimpy_spark.session import get_spark

    spark = get_spark("scale-report", cores=CORES)
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

    if which in ("conductance", "all"):
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
        gstage = tempfile.mkdtemp(prefix="scale_report_edges_")
        e.repartition(CORES).write.mode("overwrite").parquet(gstage)
        edges = spark.read.parquet(gstage)
        out["n_edges"] = edges.count()
        timed(
            "conductance_i1",
            lambda: force(P.community_conductance(edges, iters=1)),
        )
        # selective typed-free 2-hop BGP from one constant source over
        # the hub graph — the filter-pushdown + shared-variable join
        # shape; an UNSELECTIVE 2-hop over a power-law graph is the
        # documented wedge blowup (Σ in·out over hubs) the docstring's
        # ordering rule exists for, not a plan defect to measure away
        timed(
            "bgp_2hop_const_src",
            lambda: force(
                P.bgp_match(
                    edges,
                    [("N12345", "rel", "?b"), ("?b", "rel", "?c")],
                )
            ),
        )
        shutil.rmtree(gstage, ignore_errors=True)

    if which in ("docs", "all"):
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
        dstage = tempfile.mkdtemp(prefix="scale_report_docs_")
        corpus.repartition(CORES).write.mode("overwrite").parquet(dstage)
        docs = spark.read.parquet(dstage)
        out["n_docs"] = docs.count()
        timed("token_entropy", lambda: force(T.token_entropy(docs)))
        timed("readability", lambda: force(T.readability(docs)))
        timed(
            "dup_cluster_stats",
            lambda: force(D.dup_cluster_stats(docs)),
        )
        # dedup_eval at scale: organic planting over the scaled base
        # (the +1M..+4M planted offsets cannot collide with the
        # rep*10M id lanes), truth pairs from the same frame
        from cimpy_spark.fixtures.organic import (
            organic_documents,
            organic_truth_pairs,
        )

        org = organic_documents(docs)
        out["n_docs_organic"] = org.count()
        timed(
            "dedup_eval",
            lambda: force(
                D.dedup_eval(D.dedup_corpus(org), organic_truth_pairs(docs))
            ),
        )
        shutil.rmtree(dstage, ignore_errors=True)

    out["load1"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
