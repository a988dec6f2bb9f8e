"""BPE vocabulary induction: differential tests against a third,
dict-based pure-Python reference (so a blind spot shared by the two
relational implementations can't hide), plus contract invariants.
Exact corpus values are covered by the DuckDB oracle gates
(doc_bpe_merges / doc_bpe_tokens)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cimpy_spark.functions import bpe as B
from cimpy_spark.functions import doc_oracles as O
from tests.conftest import SF_TINY


def _ref_bpe(word_counts: dict, k: int):
    """Sennrich BPE on a dict: positional pair counting, greedy
    leftmost non-overlapping merge application, (cnt DESC, lhs, rhs)
    tie-break."""
    vocab = {w: tuple(w) for w in word_counts}
    merges = []
    for step in range(k):
        pc = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        (lhs, rhs), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((step, lhs, rhs, lhs + rhs, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges, vocab


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest"),
    (4, "widest widest newest low"),
]


def _wc(corpus):
    wc = {}
    for _, text in corpus:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_bpe_merges_match_python_reference(spark):
    d = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["cnt"])
        for r in B.bpe_merges(d, k=6).orderBy("step").collect()
    ]
    want, _ = _ref_bpe(_wc(CORPUS), 6)
    assert got == want


def test_bpe_segmentation_matches_python_reference(spark):
    d = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["word"]: (r["segmentation"], r["n_syms"])
        for r in B.bpe_segment(d, k=6).collect()
    }
    _, vocab = _ref_bpe(_wc(CORPUS), 6)
    want = {w: (" ".join(s), len(s)) for w, s in vocab.items()}
    assert got == want


def test_bpe_run_counting_and_greedy_application(spark):
    """'aaaa' counts the (a,a) pair 3 times (positional) but merges
    to exactly two 'aa' symbols (greedy leftmost) — the convention
    boundary both engines must share."""
    d = spark.createDataFrame([(1, "aaaa aaaa b")], "doc_id long, text string")
    m = B.bpe_merges(d, k=1).collect()
    assert (m[0]["lhs"], m[0]["rhs"], m[0]["cnt"]) == ("a", "a", 6)
    seg = {r["word"]: r["segmentation"] for r in B.bpe_segment(d, k=1).collect()}
    assert seg["aaaa"] == "aa aa"


def test_bpe_token_count_upper_bound_and_monotone(spark):
    """n_bpe is bounded by the character count and never increases
    with more merges."""
    d = spark.createDataFrame(CORPUS, "doc_id long, text string")
    chars = {
        r["doc_id"]: r["nc"]
        for r in d.select(
            "doc_id",
            F.length(F.regexp_replace("text", r"\s+", "")).alias("nc"),
        ).collect()
    }
    t2 = {r["doc_id"]: r["n_bpe"] for r in B.bpe_token_count(d, k=2).collect()}
    t6 = {r["doc_id"]: r["n_bpe"] for r in B.bpe_token_count(d, k=6).collect()}
    for i in chars:
        assert t6[i] <= t2[i] <= chars[i]


def test_bpe_parity_vs_duckdb(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_TINY}/documents.parquet')"
    )
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    for sdf, sql in [
        (B.bpe_merges(docs, 4), O.bpe_merges_sql(4)),
        (B.bpe_token_count(docs, 4), O.bpe_token_count_sql(4)),
    ]:
        sp = sdf.toPandas()
        du = con.execute(sql).df()
        cols = sorted(sp.columns)
        sp = sp[cols].sort_values(cols).reset_index(drop=True)
        du = du[cols].sort_values(cols).reset_index(drop=True)
        assert list(sp.dtypes) == list(du.dtypes)
        assert sp.equals(du)


def test_bpe_oracle_survives_merge_exhaustion(spark):
    """Fewer possible merges than k: the engine breaks out of the
    loop; the oracle's LEFT JOIN ON TRUE + coalesce carries the
    vocabulary through the empty argmax levels (a CROSS JOIN
    annihilated it and zeroed the token counts — review finding)."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, 'ab ab ab' AS text, "
        "'en' AS lang, 's' AS source, 8 AS n_chars"
    )
    assert con.execute(O.bpe_merges_sql(3)).fetchall() == [
        (0, "a", "b", "ab", 3)
    ]
    assert con.execute(O.bpe_token_count_sql(3)).fetchall() == [(1, 3)]
    d = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    got = [tuple(r) for r in B.bpe_merges(d, k=3).collect()]
    assert got == [(0, "a", "b", "ab", 3)]
    assert [tuple(r) for r in B.bpe_token_count(d, k=3).collect()] == [(1, 3)]
    # the apply-merges path agrees with the trained path
    assert [tuple(r) for r in B.bpe_token_count(d, merges=got).collect()] == [
        (1, 3)
    ]
