"""Scale check for the truth-discovery fixed point: ~10M claims from
100k sources over 500k facts — ~4 orders of magnitude over the gate
fixture (1629 claims / 15 sources at sf0.001). Claims are generated
column-only (spark.range + hash exprs, no Python): each source has a
planted reliability r(s) = 50 + s%51 percent, and asserts the true
value with that probability (xxhash64 draw), else a source-specific
wrong value — so trust genuinely differentiates and round-2
elections genuinely reweight.

What this guards (the defects a 162-row gate cannot see): per-round
lineage growth across the checkpointed loop, the claims double-scan,
and the trust join strategy when the source table is far above any
broadcast threshold.

Prints one JSON line. Usage:
  N_CLAIMS=10000000 N_SOURCES=100000 python tools/scale_trust.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLAIMS = int(os.environ.get("N_CLAIMS", "10000000"))
N_SOURCES = int(os.environ.get("N_SOURCES", "100000"))
N_ENTITIES = int(os.environ.get("N_ENTITIES", "500000"))
N_ATTRS = 4
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    import cimpy_spark.pipeline as P
    from cimpy_spark.session import get_spark

    spark = get_spark("scale-trust", cores=CORES)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).mapInPandas(lambda it: it, schema="id long").count()

    out = {
        "cores": CORES,
        "n_claims": N_CLAIMS,
        "n_sources": N_SOURCES,
        "load0": round(os.getloadavg()[0], 1),
    }

    # id enumerates (fact, k): fact = (entity, attr), k = the k-th
    # assertion of that fact; the asserting source and its
    # truthfulness are hash-derived so the set is fully deterministic
    base = spark.range(N_CLAIMS)
    fact = F.col("id") % F.lit(N_ENTITIES * N_ATTRS)
    ent = (fact % F.lit(N_ENTITIES)).cast("string")
    attr = F.concat(F.lit("a"), (fact / F.lit(N_ENTITIES)).cast("int").cast("string"))
    src_n = F.pmod(F.xxhash64(F.lit("s"), "id"), F.lit(N_SOURCES))
    reliability = F.lit(50) + src_n % F.lit(51)
    draw = F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(100))
    true_val = F.concat(F.lit("v"), F.pmod(fact, F.lit(997)).cast("string"))
    wrong_val = F.concat(F.lit("w"), F.pmod(src_n, F.lit(31)).cast("string"))
    triples = base.select(
        F.concat(F.lit("E"), ent).alias("subj"),
        attr.alias("pred"),
        F.when(draw < reliability, true_val).otherwise(wrong_val).alias("obj"),
        F.lit("literal").alias("obj_kind"),
        F.concat(F.lit("c"), src_n.cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit(0).alias("mention_idx"),
        F.lit("user").alias("role"),
    )
    cmap = (
        spark.range(N_ENTITIES)
        .select(F.concat(F.lit("E"), F.col("id").cast("string")).alias("entity_id"))
        .select("entity_id", F.col("entity_id").alias("canonical_id"))
    )

    def force(df):
        return df.select(
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    for iters in (1, 2):
        t0 = time.perf_counter()
        r = force(P.truth_discovery(triples, cmap, iters=iters))
        out[f"truth_iters{iters}_sec"] = round(time.perf_counter() - t0, 2)
        out[f"truth_iters{iters}_rows"] = r["n"]
        out[f"truth_iters{iters}_hash"] = int(r["h"])

    t0 = time.perf_counter()
    r = force(P.source_trust(triples, cmap, iters=2))
    out["trust_iters2_sec"] = round(time.perf_counter() - t0, 2)
    out["trust_rows"] = r["n"]

    out["load1"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
