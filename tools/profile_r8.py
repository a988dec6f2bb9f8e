"""Round-8 optimization profiling harness (guide §1): isolates each
bench stage with noop sinks / sub-step timers so the expensive part is
identified before anything is changed. NOT part of the frozen bench.

Usage: python tools/profile_r8.py <step> [sf_dir]
Steps: canon, stream, stage, dedup, pipeline
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cimpy_spark.session import get_spark
from cimpy_spark.fixtures.events_transcripts import transcripts_from_events


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, spark=None):
    if spark is not None:
        spark.sparkContext.setJobDescription(name)
    t0 = time.perf_counter()
    out = fn()
    print(f"  {name}: {time.perf_counter() - t0:.3f}s", flush=True)
    return out


def _staged(spark, sf_dir, tmp):
    stage_dir = f"{tmp}/stage"
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    transcripts_from_events(spark, sf_dir).write.mode("overwrite").parquet(stage_dir)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return spark.read.parquet(stage_dir)


def main():
    step = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="prof_r8_")
    spark = get_spark("profile-r8")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000).mapInPandas(lambda it: it, schema="id long").count()

    if step in ("canon", "pipeline"):
        from cimpy_spark import pipeline as P
        from cimpy_spark.operators.canonicalize import (
            _collect_if_small,
            _sym_links,
            _union_find_df,
            canonical_map,
        )
        from cimpy_spark.operators.extract import extract_triples
        from cimpy_spark.operators.link import declared_entities, link_references

        transcripts = _staged(spark, sf_dir, tmp)
        triples = extract_triples(transcripts).cache()
        timed("extract+cache (count)", lambda: triples.count(), spark)
        entities = declared_entities(triples).cache()
        timed("entities (count)", lambda: entities.count(), spark)
        timed("entities recount (cached)", lambda: entities.count(), spark)

        if step == "pipeline":
            e, q = link_references(triples, entities)
            e = e.cache()
            timed("link (count)", lambda: e.count(), spark)
            timed("quarantine (count)", lambda: q.count(), spark)

        # canonicalize sub-steps
        links = P.same_links(triples)
        timed("same_links noop", lambda: noop(links), spark)
        sym = _sym_links(links)
        timed("sym_links noop", lambda: noop(sym), spark)
        pairs = timed("limit-probe collect", lambda: _collect_if_small(sym, 1_000_000), spark)
        print(f"  n_pairs={len(pairs)}")
        ep = timed("driver union-find + createDataFrame", lambda: _union_find_df(spark, pairs), spark)
        timed("ep_map noop", lambda: noop(ep), spark)
        cmap = canonical_map(entities, P.same_links(triples)).cache()
        timed("canonical_map full (count)", lambda: cmap.count(), spark)
        if step == "pipeline":
            from cimpy_spark.operators.canonicalize import canonical_edges, canonical_nodes

            timed("canon_edges", lambda: canonical_edges(e, cmap).count(), spark)
            timed("nodes", lambda: canonical_nodes(triples, cmap).count(), spark)

    elif step == "stream":
        from cimpy_spark.streaming.ingest import (
            run_to_memory_sink,
            stream_extract,
            stream_transcripts,
        )

        transcripts = _staged(spark, sf_dir, tmp)
        stage_dir = f"{tmp}/stage"

        def _stream():
            run_to_memory_sink(
                stream_extract(stream_transcripts(spark, stage_dir)),
                "prof_stream_extract",
            )
            return spark.table("prof_stream_extract").count()

        n = timed("stream_extract full", _stream, spark)
        print(f"  rows={n}")

    elif step == "stage":
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        t = transcripts_from_events(spark, sf_dir)
        # warm
        t.limit(2000).write.mode("overwrite").parquet(f"{tmp}/warm")
        timed("derive only (noop)", lambda: noop(t), spark)
        timed(
            "derive+write parquet",
            lambda: t.write.mode("overwrite").parquet(f"{tmp}/stage"),
            spark,
        )
        # events scan alone
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        timed("events scan (noop)", lambda: noop(ev.select("event_id", "user_id", "ts")), spark)

    elif step == "dedup":
        from cimpy_spark.functions.dedup import (
            dedup_corpus,
            minhash_band_keys_v2,
            minhash_band_keys,
            minhash_candidates,
            ngram_jaccard,
        )

        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(cores)
            .cache()
        )
        docs.count()
        timed("band_keys v2 (noop)", lambda: noop(minhash_band_keys_v2(docs)), spark)
        timed("band_keys v1/md5 (noop)", lambda: noop(minhash_band_keys(docs)), spark)
        cand = minhash_candidates(docs)
        timed("candidates v2 (noop)", lambda: noop(cand), spark)
        timed(
            "jaccard verify (noop)",
            lambda: noop(ngram_jaccard(docs, minhash_candidates(docs))),
            spark,
        )
        timed("dedup_corpus v2 (count)", lambda: dedup_corpus(docs).count(), spark)
        timed("dedup_corpus v1 (count)", lambda: dedup_corpus(docs, family="md5").count(), spark)

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
