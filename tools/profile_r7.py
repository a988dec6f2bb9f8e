"""Round-7 stage decomposition of the two heaviest remaining curation
ops (VERDICT r6 "next round" #6 / ROADMAP r7 queue #3):

- `setsim_join` (24.1 s at 500k docs in r6): where does the time go
  now that the gram builder is linear — front end (shingle hash
  stream), df-order/per-doc sort, prefix candidate join, or exact
  verify? Re-measures the r5 negative result (an Arrow gram-key
  front end was a no-op when the SQL side was tail-dominated).
- `line_dedup` (11 s at 500k docs): checkpointed line stream vs
  boilerplate count vs reassembly.

Same 500k-doc ×REP corpus recipe as curation_scale_bench.py. Prints
one JSON line. Usage: REP=100 python tools/profile_r7.py [setsim|line]
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
REP = int(os.environ.get("REP", "100"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def loadavg() -> float:
    return round(os.getloadavg()[0], 1)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    from pyspark.sql import functions as F

    from cimpy_spark.functions import dedup as D
    from cimpy_spark.functions import text as T
    from cimpy_spark.functions.text import has_shingles, shingle_array
    from cimpy_spark.plans.checkpoints import checkpoint_df
    from cimpy_spark.session import get_spark

    spark = get_spark("profile-r7", cores=CORES)
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
    stage = tempfile.mkdtemp(prefix="profile_r7_")
    corpus.repartition(CORES).write.mode("overwrite").parquet(stage)
    docs = spark.read.parquet(stage)
    n_docs = docs.count()

    out = {"n_docs": n_docs, "rep": REP, "cores": CORES, "load0": loadavg()}

    def force(df):
        return df.select(
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007)))
            .alias("h")
        ).collect()

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 2)
        return r

    if which in ("setsim", "all"):
        # stage 1: shingle-hash front end (explode distinct grams +
        # xxhash64) INCLUDING its checkpoint write, exactly as the op
        # runs it
        def front_sql():
            sh = docs.filter(has_shingles(3)).select(
                "doc_id", F.explode(shingle_array(3)).alias("tok")
            ).select("doc_id", F.xxhash64("tok").alias("tok"))
            return checkpoint_df(sh)

        sh = timed("setsim_front_sql", front_sql)
        out["setsim_front_rows"] = sh.count()

        # stage 2: df aggregate + join back + per-doc (df, tok) sort
        def ordering():
            dfreq = sh.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
            ordered = (
                sh.join(dfreq, "tok")
                .groupBy("doc_id")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("df", "tok"))
                    ).alias("arr")
                )
            )
            force(ordered.select("doc_id", F.size("arr").alias("n")))

        timed("setsim_ordering", ordering)

        # stage 3+4 together = full op minus the front end; also the
        # full op end to end for the headline
        timed("setsim_full", lambda: force(D.setsim_join(docs)))

        # re-measure: Arrow front end producing the SAME shape —
        # per-doc DISTINCT gram keys, distinct IN the kernel (no extra
        # shuffle), then the identical checkpoint
        import numpy as np
        import pyarrow as pa

        from cimpy_spark.functions.text_arrow import _flat_words

        def front_arrow():
            def gen(batches):
                import hashlib

                for batch in batches:
                    doc_ids = batch.column("doc_id").cast(
                        pa.int64()
                    ).to_numpy(zero_copy_only=False)
                    flat, parents = _flat_words(batch)
                    empty = pa.RecordBatch.from_arrays(
                        [
                            pa.array([], type=pa.int64()),
                            pa.array([], type=pa.int64()),
                        ],
                        names=["doc_id", "tok"],
                    )
                    if len(flat) < 3:
                        yield empty
                        continue
                    import pyarrow.compute as pc

                    d = pc.dictionary_encode(flat)
                    codes = d.indices.to_numpy(zero_copy_only=False)
                    wh = np.empty(len(d.dictionary), dtype=np.uint64)
                    for i, w in enumerate(d.dictionary.to_pylist()):
                        wh[i] = int.from_bytes(
                            hashlib.md5(w.encode()).digest()[:8], "little"
                        )
                    valid = parents[:-2] == parents[2:]
                    if not valid.any():
                        yield empty
                        continue
                    p = parents[:-2][valid]
                    h = np.zeros(len(p), dtype=np.uint64)
                    for j in range(3):
                        cj = codes[j : len(codes) - 2 + j][valid]
                        h = h * np.uint64(1_000_003) + wh[cj]
                    # per-doc distinct without a shuffle: unique on
                    # the (doc, key) pair stream
                    pair = np.stack([p.astype(np.uint64), h], axis=1)
                    uniq = np.unique(pair, axis=0)
                    # ascontiguousarray: a column slice has stride 16
                    # and same-size dtype views of non-contiguous
                    # arrays need numpy >= 1.23
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(
                                doc_ids[uniq[:, 0].astype(np.int64)],
                                type=pa.int64(),
                            ),
                            pa.array(
                                np.ascontiguousarray(uniq[:, 1]).view(
                                    np.int64
                                ),
                                type=pa.int64(),
                            ),
                        ],
                        names=["doc_id", "tok"],
                    )

            sh2 = docs.select("doc_id", "text").mapInArrow(
                gen, schema="doc_id bigint, tok bigint"
            )
            return checkpoint_df(sh2)

        sh2 = timed("setsim_front_arrow", front_arrow)
        out["setsim_front_arrow_rows"] = sh2.count()

    if which in ("line", "all"):
        # the ×REP corpus is single-line; the gate's multi-line layout
        # comes from fixtures.organic.lined_documents. Stage it to
        # parquet so the op is timed on a REAL multi-line input with
        # the derivation excluded (the r6 scale-bench 11.1 s number
        # INCLUDED the derivation).
        from cimpy_spark.fixtures.organic import lined_documents

        lstage = tempfile.mkdtemp(prefix="profile_r7_lined_")
        lined_documents(docs).repartition(CORES).write.mode(
            "overwrite"
        ).parquet(lstage)
        docs = spark.read.parquet(lstage)
        timed("line_dedup_full", lambda: force(T.line_dedup(docs)))

        # stage 1: the checkpointed line stream (split + explode +
        # hash + materialize WITH the line strings)
        def line_stream():
            lines = checkpoint_df(
                docs.select(
                    "doc_id",
                    F.posexplode(F.split(F.col("text"), "\n")).alias(
                        "pos", "line"
                    ),
                ).select(
                    "doc_id",
                    "pos",
                    "line",
                    F.xxhash64(F.trim(F.lower(F.col("line")))).alias("k"),
                )
            )
            return lines

        lines = timed("line_stream_ckpt", line_stream)
        out["line_rows"] = lines.count()

        # stage 2: boilerplate key count over the materialized stream
        def boiler():
            b = (
                lines.select("k", "doc_id")
                .distinct()
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("nd"))
                .filter(F.col("nd") >= 2)
                .select("k")
            )
            force(b)

        timed("line_boiler", boiler)

        # stage 3: anti-join + reassembly groupBy (re-derives boiler
        # but stage-2 timing lets us subtract it)
        def reassemble():
            b = (
                lines.select("k", "doc_id")
                .distinct()
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("nd"))
                .filter(F.col("nd") >= 2)
                .select("k")
            )
            kept = lines.join(b, "k", "left_anti")
            clean = kept.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("int").alias("n_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                ).alias("clean_text"),
            )
            force(clean)

        timed("line_reassemble", reassemble)
        shutil.rmtree(lstage, ignore_errors=True)

    out["load1"] = loadavg()
    print(json.dumps(out))
    shutil.rmtree(stage, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
