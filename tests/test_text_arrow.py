"""Equivalence gates for the Arrow-kernel text operators.

The kernels in cimpy_spark/functions/text_arrow.py must reproduce the
SQL paths BIT-FOR-BIT — same rounded doubles, same flags, same
schema — on the real fixture corpus, on an adversarial whitespace
corpus (the cases where Java split / Spark trim semantics bite), and
under hypothesis fuzz over whitespace-heavy random documents.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cimpy_spark.functions import text as T
from cimpy_spark.functions.text_arrow import (
    contamination_arrow,
    dup_spans_arrow,
    repetition_score_arrow,
)

from tests.conftest import SF_TINY

# Each case exercises a split/trim edge: empty text, leading/trailing
# tab (trim strips SPACES only, Java split keeps the empty fragment),
# all-whitespace, vertical tab (in Java's \s, not RE2's), NBSP (in
# neither — must NOT split), high repetition (flag flips true), and a
# null (both paths treat it as zero grams).
ADVERSARIAL = [
    (1000001, ""),
    (1000002, "\ta"),
    (1000003, "a\t"),
    (1000004, "\t"),
    (1000005, " \t \n "),
    (1000006, "x \x0b y x y x y"),
    (1000007, "a b a b c"),
    (1000008, "a b a b a b a b"),
    (1000009, "  lead trail  "),
    (1000010, "w " * 200),
    (1000011, "one two three four five six seven"),
    (1000012, None),
]


def _docs(spark):
    real = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .select("doc_id", "text")
    )
    adv = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    return real.unionByName(adv)


def _assert_same(a_df, b_df):
    assert a_df.schema == b_df.schema
    a = a_df.orderBy("doc_id").collect()
    b = b_df.orderBy("doc_id").collect()
    assert len(a) == len(b)
    bad = [(x, y) for x, y in zip(a, b) if x != y]
    assert not bad, bad[:5]


def test_repetition_arrow_matches_sql(spark):
    docs = _docs(spark)
    _assert_same(T.repetition_score(docs), repetition_score_arrow(docs))
    # both repetitive outcomes present, so the flag comparison is live
    flags = {
        r["repetitive"]
        for r in repetition_score_arrow(docs).collect()
    }
    assert flags == {True, False}


def test_contamination_arrow_matches_sql(spark):
    docs = _docs(spark)
    bench = docs.filter("doc_id % 37 = 0")
    _assert_same(
        T.contamination(docs, bench), contamination_arrow(docs, bench)
    )
    hit = {
        r["contaminated"] for r in contamination_arrow(docs, bench).collect()
    }
    assert hit == {True, False}


def test_contamination_arrow_empty_bench(spark):
    """Empty benchmark ⇒ nothing contaminated (is_in on an empty
    value set), matching the SQL path's left-join + fillna(0)."""
    docs = _docs(spark)
    bench = docs.filter("doc_id < 0")
    _assert_same(
        T.contamination(docs, bench), contamination_arrow(docs, bench)
    )


def test_arrow_kernels_zero_exchange(spark):
    """Both kernels must stay narrow: project → MapInArrow, no
    Exchange anywhere in the corpus-side physical plan (the 100 TB
    property — scan-local compute)."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    plan = repetition_score_arrow(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInArrow" in plan
    bench = docs.filter("doc_id % 97 = 0")
    plan2 = contamination_arrow(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2
    assert "MapInArrow" in plan2


# words drawn to collide often (repetition needs duplicate grams);
# separators cover every Java-\s char plus NBSP and runs thereof
WORD = st.sampled_from(["a", "b", "ab", "A1", "7", ",", "a b", "é"])
SEP = st.text(
    alphabet=[" ", "\t", "\n", "\x0b", "\f", "\r", "\xa0"],
    min_size=1,
    max_size=3,
)


@st.composite
def fuzz_corpus(draw):
    n_docs = draw(st.integers(1, 12))
    rows = []
    for i in range(n_docs):
        k = draw(st.integers(0, 20))
        words = [draw(WORD) for _ in range(k)]
        seps = [draw(SEP) for _ in range(k)]
        lead = draw(st.sampled_from(["", " ", "\t"]))
        text = lead + "".join(w + s for w, s in zip(words, seps))
        rows.append((i, text))
    return rows


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=fuzz_corpus(), bench_mod=st.integers(2, 5))
def test_arrow_fuzz_matches_sql(spark, rows, bench_mod):
    """Differential fuzz: random whitespace-heavy documents through
    both engines — tokenization, gram equality, HALF_UP rounding and
    flags must agree exactly."""
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    _assert_same(T.repetition_score(docs), repetition_score_arrow(docs))
    bench = docs.filter(f"doc_id % {bench_mod} = 0")
    _assert_same(
        T.contamination(docs, bench, n=2), contamination_arrow(docs, bench, n=2)
    )


def test_dup_spans_arrow_matches_sql(spark):
    """The hashed-gram front ends differ (xxhash64 pair vs md5-seeded
    positional polynomial) but equal grams must map to equal keys in
    both, so the shared relational tail must emit IDENTICAL spans —
    on the organic corpus (real planted duplicates) plus the
    adversarial split/trim edge cases."""
    from cimpy_spark.fixtures.organic import organic_documents

    docs = organic_documents(_docs(spark))
    a = T.dup_spans(docs).orderBy("doc_id", "span_start").collect()
    b = dup_spans_arrow(docs).orderBy("doc_id", "span_start").collect()
    assert a == b
    assert len(a) > 0


def test_dup_spans_arrow_within_doc_positions(spark):
    """gram_keys_arrow computes word positions batch-locally (global
    index minus doc start); a doc later in the batch must still get
    0-based in-doc positions."""
    d = spark.createDataFrame(
        [
            (1, "filler words here nothing repeats in this document"),
            (2, " ".join(["p q r s t u"] * 2)),
        ],
        "doc_id long, text string",
    ).coalesce(1)
    rows = dup_spans_arrow(d, n=6).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in rows] == [
        (2, 0, 11)
    ]


def test_gram_keys_arrow_narrow(spark):
    """The Arrow front end must stay scan-local: project → MapInArrow,
    no Exchange (the spans tail then adds exactly its two window
    shuffles)."""
    from cimpy_spark.functions.text_arrow import gram_keys_arrow

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    plan = gram_keys_arrow(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInArrow" in plan
