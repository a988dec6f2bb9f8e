"""xxhash64 MinHash family (dedup v2, round 6): driver-style parity
vs its DuckDB oracle (the pure-SQL XXH64 closed forms), plus the
family-recall contract on the organic planted-duplicate corpus.

v2 exists because the round-6 stage breakdown put the md5 signature
fold at the top of the dedup cost (BENCH.md round-6 scaling section)
and the v2 fold hashes each shingle once to a long + two fixed-width
block hashes per seed. Round 7 graduated xxh64 to the DEFAULT family
(VERDICT r6 #2); v1 (md5) stays available via family="md5" and keeps
its own gates (doc_minhash_candidates / doc_dedup_corpus pin it)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cimpy_spark.functions import dedup as D
from cimpy_spark.functions import doc_oracles as O
from cimpy_spark.fixtures.organic import organic_documents
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_TINY}/documents.parquet").cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_TINY}/documents.parquet')"
    )
    return c


def test_candidates_v2_parity_vs_duckdb(spark, docs, con):
    sp = {(r["doc_a"], r["doc_b"])
          for r in D.minhash_candidates_v2(docs).collect()}
    du = set(map(tuple, con.execute(O.minhash_candidates_v2_sql()).fetchall()))
    assert sp == du


def test_dedup_corpus_v2_parity_vs_duckdb(spark, docs, con):
    org = organic_documents(docs)
    sp = {tuple(r) for r in D.dedup_corpus_v2(org).collect()}
    du = set(map(tuple, con.execute(O.dedup_corpus_v2_sql()).fetchall()))
    assert sp == du


def test_v2_catches_planted_verbatim_dups(spark, docs):
    """J=1.0 pairs have identical signatures in ANY MinHash family —
    every band collides, recall is deterministic, not probabilistic.
    The organic corpus's verbatim copies (ids 2M+..: full-text copies
    re-keyed) must therefore always cluster with their source under
    v2, exactly as under v1."""
    org = organic_documents(docs)
    out = {r["doc_id"]: r for r in D.dedup_corpus_v2(org).collect()}
    texts = {r["doc_id"]: r["text"] for r in org.collect()}
    by_text: dict[str, list[int]] = {}
    for did, txt in texts.items():
        by_text.setdefault(txt, []).append(did)
    groups = [sorted(ids) for ids in by_text.values() if len(ids) > 1]
    assert groups, "fixture must contain verbatim copies"
    for ids in groups:
        canon = {out[d]["canonical_doc_id"] for d in ids}
        assert len(canon) == 1, ids
        # the cluster may be LARGER than the verbatim group (transitive
        # merge with near-dup mutations); the elected canonical is the
        # cluster min, hence <= the group's min, and is itself kept
        c = canon.pop()
        assert c <= min(ids)
        assert out[c]["is_kept"]


def test_v2_vs_v1_differences_are_borderline_only(spark, docs):
    """The two families may legitimately disagree ONLY on pairs in
    the probabilistic LSH recall zone (sub-1.0 Jaccard); every
    candidate one family surfaces and the other misses must either
    fail the exact verify (noise pair) or sit strictly below J=1.0.
    (Observed at sf0.01: exactly one trunc90 pair at J=0.889, a
    ~0.8%-probability band miss for 4 bands x 3 rows — documented in
    BENCH.md; the gates are per-family oracles, so cross-engine
    correctness is unaffected.)"""
    org = organic_documents(docs)
    c1 = {(r["doc_a"], r["doc_b"])
          for r in D.minhash_candidates(org).collect()}
    c2 = {(r["doc_a"], r["doc_b"])
          for r in D.minhash_candidates_v2(org).collect()}
    sym = sorted(c1 ^ c2)
    if not sym:
        return
    jac = D.ngram_jaccard(
        org, spark.createDataFrame(sym, "doc_a long, doc_b long")
    )
    assert jac.filter(F.col("jaccard") >= 1.0).count() == 0


def test_v2_two_batch_ingest_equals_one_shot(spark, docs, tmp_path):
    """The incremental path on the xxh64 family: batch-wise ingest
    must equal the one-shot dedup_corpus_v2 of the full corpus, same
    equivalence contract as v1 (test_dedup_incremental.py)."""
    org = organic_documents(docs).cache()
    out_dir = str(tmp_path / "v2_ingest")
    first = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(2)) == 0
    D.dedup_ingest(spark, org.filter(first), out_dir, family="xxh64")
    inc = D.dedup_ingest(spark, org, out_dir, family="xxh64")
    got = {tuple(r) for r in inc.collect()}
    want = {tuple(r) for r in D.dedup_corpus_v2(org).collect()}
    assert got == want


def test_ingest_family_mismatch_fails_loudly(spark, docs, tmp_path):
    """An out_dir bootstrapped under one family must not silently
    accept the other: the committed band_key column type differs, so
    the arrivals read-back errors at the scan."""
    org = organic_documents(docs)
    out_dir = str(tmp_path / "fammix")
    D.dedup_ingest(spark, org, out_dir, family="md5")
    with pytest.raises(Exception):
        D.dedup_ingest(spark, org, out_dir, family="xxh64")
    with pytest.raises(ValueError, match="unknown signature family"):
        D.dedup_ingest(spark, org, out_dir, family="sha9")
