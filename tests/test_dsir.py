"""DSIR importance weights (text.dsir_weights, round 7): driver-style
parity vs its DuckDB oracle (XXH64-port gram hashing + fixed-point
log-ratios), the selection contract (target-like docs outscore the
raw pool), and the exact-integer-sum determinism property.

Tail gate `doc_dsir_weights` is pinned here until its first driver
row."""

from __future__ import annotations

import duckdb
import pytest

from cimpy_spark.functions import doc_oracles as O
from cimpy_spark.functions import text as T
from tests.conftest import SF_TINY

TARGET = "src0"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_TINY}/documents.parquet").cache()


@pytest.fixture(scope="module")
def out_rows(spark, docs):
    return T.dsir_weights(docs, target_source=TARGET).collect()


def test_dsir_parity_vs_duckdb(out_rows):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_TINY}/documents.parquet')"
    )
    du = {
        (int(d), bool(t), int(n), round(w, 9))
        for d, t, n, w in con.execute(O.dsir_sql(TARGET)).fetchall()
    }
    sp = {
        (
            int(r["doc_id"]),
            bool(r["is_target"]),
            int(r["n_grams"]),
            round(r["logw"], 9),
        )
        for r in out_rows
    }
    assert sp == du


def test_dsir_selection_contract(out_rows):
    """Target docs must outscore the raw pool on average (they ARE
    the target distribution), every doc gets exactly one row, and
    n_grams = 2·len−1 gram occurrences."""
    tgt = [r["logw"] for r in out_rows if r["is_target"]]
    raw = [r["logw"] for r in out_rows if not r["is_target"]]
    assert tgt and raw
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)
    ids = [r["doc_id"] for r in out_rows]
    assert len(ids) == len(set(ids))
    assert all(r["n_grams"] >= 1 for r in out_rows)


def test_dsir_null_source_counts_as_raw(spark):
    """NULL source is RAW on BOTH engines (review finding: Spark's
    three-valued when(~is_target) silently dropped NULL-source grams
    from both distributions while the oracle counted them as raw,
    skewing every bucket's totals)."""
    rows = [
        (1, "alpha beta", "tgt"),
        (2, "alpha beta", None),
        (3, "gamma delta", "other"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        r["doc_id"]: r
        for r in T.dsir_weights(df, target_source="tgt").collect()
    }
    con = duckdb.connect()
    con.register("docs_in", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text", "source"]
    ))
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_in")
    du = {int(d): (bool(t), int(n), round(w, 9))
          for d, t, n, w in con.execute(O.dsir_sql("tgt")).fetchall()}
    assert not out[2]["is_target"]
    # the NULL-source doc shares the target doc's grams, so its raw
    # counts must actually register: identical outputs cross-engine
    for d, r in out.items():
        assert du[d] == (
            bool(r["is_target"]), int(r["n_grams"]), round(r["logw"], 9)
        )


def test_dsir_fixed_point_and_partition_invariance(spark, docs, out_rows):
    """logw is an exact integer count of micro-units (the per-doc sum
    is integer arithmetic — no float accumulation), so it cannot
    depend on partitioning / aggregation order."""
    for r in out_rows:
        micro = r["logw"] * 1_000_000
        assert abs(micro - round(micro)) < 1e-6
    re = {
        (r["doc_id"], r["logw"])
        for r in T.dsir_weights(
            docs.repartition(7), target_source=TARGET
        ).collect()
    }
    assert re == {(r["doc_id"], r["logw"]) for r in out_rows}
