"""Organic-duplicate fixture gates: threshold behavior on planted
similarity distributions (round-3 verdict item 1 — the reference's
analog is genuine cross-file rdf:about merges in the CIGRE fixtures,
tests/test_import.py:17-36, not self-unions of identical rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cimpy_spark.fixtures.organic import (
    ORGANIC_COS_THRESHOLD,
    ORGANIC_N_TABLES,
    organic_documents,
    organic_embeddings,
)
from cimpy_spark.functions import dedup as D
from cimpy_spark.functions import similarity as SIM

from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def odocs(spark):
    return organic_documents(
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
    ).cache()


@pytest.fixture(scope="module")
def oemb(spark):
    return organic_embeddings(
        spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    ).cache()


def _cls(id_col):
    """Planted class = id div 1M (0 = base, 1..4 = mutation class)."""
    return (F.col(id_col) / 1_000_000).cast("int")


def test_exact_dedup_finds_only_verbatim_copies(spark, odocs):
    groups = D.exact_duplicates(odocs)
    # every planted verbatim copy (class 1) lands in a group whose
    # canonical is its base doc; mutated classes never do
    n_exact = odocs.filter(_cls("doc_id") == 1).count()
    assert n_exact > 0
    matched = (
        odocs.filter(_cls("doc_id") == 1)
        .withColumn("base_id", F.col("doc_id") - 1_000_000)
        .join(
            groups.withColumnRenamed("canonical_doc_id", "base_id"),
            "base_id",
        )
        .count()
    )
    assert matched == n_exact


def test_dedup_corpus_threshold_on_organic_jaccard(spark, odocs):
    res = D.dedup_corpus(odocs).cache()
    by_cls = {
        r["cls"]: (r["n"], r["n_dropped"])
        for r in res.groupBy(_cls("doc_id").alias("cls"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((~F.col("is_kept")).cast("int")).alias("n_dropped"),
        )
        .collect()
    }
    # verbatim copies (J=1): always candidates, always verified → all dropped
    assert by_cls[1][1] == by_cls[1][0]
    # trunc90 (J ≈ 0.85-0.9): most dropped (LSH recall < 1 is organic)
    assert by_cls[2][1] >= by_cls[2][0] * 0.6
    # trunc60 (J ≈ 0.44-0.6): below the 0.8 threshold → essentially all
    # kept. NOT exactly all: two naturally near-identical SHORT base
    # docs can have near-identical trunc60 mutations (observed at
    # sf0.001: docs 33/436 share a 10-word prefix), and such organic
    # cross-doc clusters are precisely what this fixture is for — the
    # sound invariant (no trunc60 doc merges with its OWN base) is
    # pinned separately below.
    assert by_cls[3][1] <= by_cls[3][0] * 0.1
    # append (J ≈ 0.95): most dropped
    assert by_cls[4][1] >= by_cls[4][0] * 0.6
    # min-id canonical election sanity
    bad = (
        res.filter(~F.col("is_kept"))
        .filter(F.col("canonical_doc_id") >= F.col("doc_id"))
        .count()
    )
    assert bad == 0
    # no trunc60 mutation is ever directly merged with its own base:
    # their planted Jaccard is far below 0.8
    pairs = D.ngram_jaccard(odocs, D.minhash_candidates(odocs)).filter(
        F.col("jaccard") >= 0.8
    )
    own_base = pairs.filter(
        (_cls("doc_b") == 3) & (F.col("doc_a") == F.col("doc_b") % 1_000_000)
    ).count()
    assert own_base == 0


def test_trunc60_pairs_are_candidates_but_rejected(spark, odocs):
    """The below-threshold class must actually EXERCISE the verify
    stage: at least one trunc60 pair reaches the candidate set and is
    then rejected by exact Jaccard < 0.8."""
    cand = D.minhash_candidates(odocs)
    jac = D.ngram_jaccard(odocs, cand)
    t60 = jac.filter(
        (_cls("doc_b") == 3) & (F.col("doc_a") == F.col("doc_b") % 1_000_000)
    )
    rows = t60.collect()
    assert len(rows) > 0, "no trunc60 pair ever became an LSH candidate"
    assert all(r["jaccard"] < 0.8 for r in rows)


def test_multi_table_lsh_amplifies_recall(spark, oemb):
    """OR-amplification: extra hyperplane tables can only ADD
    candidates (table 0 is shared), and at cos ≈ 0.98 they must add
    some — the round-3 plane family reduced mod 7, collapsing every
    table to the same partition, which this pins against."""
    found = {
        L: {
            (r["vec_a"], r["vec_b"])
            for r in SIM.neardup_pairs(
                oemb, threshold=ORGANIC_COS_THRESHOLD, n_tables=L
            ).collect()
        }
        for L in (1, ORGANIC_N_TABLES)
    }
    assert found[1] <= found[ORGANIC_N_TABLES]
    assert len(found[ORGANIC_N_TABLES]) > len(found[1])


def test_neardup_threshold_on_organic_cosine(spark, oemb):
    pairs = SIM.neardup_pairs(
        oemb, threshold=ORGANIC_COS_THRESHOLD, n_tables=ORGANIC_N_TABLES
    ).cache()
    # found pairs are exactly (base, modulated-copy) pairs at cos ≈ 0.98
    assert pairs.count() > 0
    non_planted = pairs.filter(
        (F.col("vec_b") != F.col("vec_a") + 1_000_000)
    ).count()
    assert non_planted == 0
    sims = [r["sim"] for r in pairs.collect()]
    assert all(0.97 < s < 0.99 for s in sims)
    # the sign-flipped hard negatives (class 2) never appear
    flipped = pairs.filter(
        (_cls("vec_a") == 2) | (_cls("vec_b") == 2)
    ).count()
    assert flipped == 0


def test_emb_dedup_corpus_on_organic(spark, oemb):
    res = SIM.emb_dedup_corpus(
        oemb, threshold=ORGANIC_COS_THRESHOLD, n_tables=ORGANIC_N_TABLES
    ).cache()
    # every hard negative is kept; only modulated copies are dropped
    assert res.filter((_cls("vec_id") == 2) & ~F.col("is_kept")).count() == 0
    dropped = res.filter(~F.col("is_kept"))
    assert dropped.count() > 0
    assert dropped.filter(_cls("vec_id") != 1).count() == 0
    # dropped copies canonicalize to their base vector
    bad = dropped.filter(
        F.col("canonical_vec_id") != F.col("vec_id") - 1_000_000
    ).count()
    assert bad == 0


def test_organic_derivations_bit_identical_across_engines(spark, odocs, oemb):
    """The fixture's whole premise: the Spark and DuckDB derivations
    of the organic corpus are the SAME corpus, bit for bit — text
    equality for documents, float64 equality for embeddings. Drift
    here would silently desynchronize every dedup gate from its
    oracle."""
    import duckdb
    import numpy as np

    from cimpy_spark.fixtures.organic import (
        ORGANIC_DOCS_CTE,
        ORGANIC_EMB_CTE,
    )

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_TINY}/{t}.parquet')"
        )
    dd = con.execute(
        "WITH " + ORGANIC_DOCS_CTE + " SELECT doc_id, text FROM orgdocs ORDER BY doc_id"
    ).fetchall()
    sd = sorted(
        (r["doc_id"], r["text"]) for r in odocs.select("doc_id", "text").collect()
    )
    assert sd == [(i, t) for i, t in dd]

    de = con.execute(
        "WITH " + ORGANIC_EMB_CTE + " SELECT vec_id, emb FROM eorg ORDER BY vec_id"
    ).fetchall()
    se = sorted((r["vec_id"], r["embedding"]) for r in oemb.collect())
    assert [i for i, _ in se] == [i for i, _ in de]
    for (_, a), (_, b) in zip(se, de):
        assert np.array_equal(
            np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
        )
