"""Spill-correctness evidence (ROADMAP gap: "spilling / memory-
pressure untested at sandbox scale"): run the same `dedup_corpus` job
twice on the same staged corpus — once with generous memory, once in
a memory-starved JVM — and verify (a) the starved run actually
SPILLED (read from the Spark UI REST API: stage-level
memoryBytesSpilled / diskBytesSpilled), and (b) both runs produce the
IDENTICAL result hash. That is the property a 100 TB job needs from
the engine: memory pressure changes the physical execution (external
sort/aggregation spill paths), never the answer.

Each level runs in its own subprocess (driver memory is a JVM-launch
setting). Usage: REP=40 python tools/spill_check.py — prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "40"))
STAGE_DIR = os.environ.get("STAGE_DIR", "/tmp/spill_check_corpus")
UI_PORT = int(os.environ.get("UI_PORT", "4057"))


def stage_corpus() -> None:
    from pyspark.sql import functions as F

    from cimpy_spark.session import get_spark

    spark = get_spark("spill-stage", cores=32)
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
    corpus.repartition(32).write.mode("overwrite").parquet(STAGE_DIR)
    spark.stop()


def run_level(mem: str) -> dict:
    from pyspark.sql import functions as F

    from cimpy_spark.functions.dedup import dedup_corpus
    from cimpy_spark.session import get_spark

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = mem
    spark = get_spark(
        f"spill-{mem}",
        cores=8,
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # shrink execution memory so the starved level exercises
            # the external-spill paths rather than just a smaller heap
            "spark.memory.fraction": "0.2" if mem.endswith("m") else "0.6",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(STAGE_DIR)
    out = dedup_corpus(docs)
    h = out.select(
        F.sum(F.pmod(F.xxhash64(*out.columns), F.lit(1_000_000_007))).alias("h")
    ).collect()[0]["h"]
    n = out.count()

    # read the ACTUAL bound UI url — Spark silently binds port+1 on
    # conflict, and querying the configured port could read another
    # application's metrics (review finding)
    ui = spark.sparkContext.uiWebUrl
    app = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications")
    )[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    spilled_mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    spilled_disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    spark.stop()
    return {
        "driver_mem": mem,
        "rows": n,
        "result_hash": h,
        "memory_bytes_spilled": spilled_mem,
        "disk_bytes_spilled": spilled_disk,
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        print("RESULT " + json.dumps(run_level(sys.argv[2])))
        return

    stage_corpus()
    results = {}
    for mem in ("8g", "900m"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", mem],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-3000:], proc.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"level {mem} failed")
        results[mem] = json.loads(line[-1][len("RESULT "):])

    starved = results["900m"]
    roomy = results["8g"]
    print(json.dumps({
        "metric": "dedup_spill_correctness",
        "value": int(
            starved["result_hash"] == roomy["result_hash"]
            and starved["rows"] == roomy["rows"]
        ),
        "unit": "bool",
        "hash_equal": starved["result_hash"] == roomy["result_hash"],
        "starved_spilled_disk_bytes": starved["disk_bytes_spilled"],
        "starved_spilled_mem_bytes": starved["memory_bytes_spilled"],
        "roomy_spilled_disk_bytes": roomy["disk_bytes_spilled"],
        "levels": results,
        "rep": REP,
    }))


if __name__ == "__main__":
    main()
