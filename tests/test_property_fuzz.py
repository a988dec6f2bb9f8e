"""Property-based fuzz: random transcripts from the full mention
grammar (plus adversarial noise) must produce identical triple sets
from the distributed pipeline and the pure-Python oracle.

Hypothesis drives the corpus; each example is one spark run, so
examples are few but each covers dozens of random turns including
malformed mentions, unicode noise, self-references and forward refs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cimpy_spark import pipeline as P
from cimpy_spark.oracle import precision_recall, run_oracle

ENT = st.integers(0, 30).map(lambda i: f"E{i}")
TYP = st.integers(0, 4).map(lambda i: f"T{i}")
PRED = st.sampled_from(["connects_to", "feeds", "controls"])
NOISE = st.text(
    alphabet="abc xyz0é中 ,.", min_size=0, max_size=12
).filter(lambda s: "«" not in s and "»" not in s)


@st.composite
def mention(draw):
    kind = draw(st.integers(0, 5))
    e = draw(ENT)
    if kind == 0:
        return (
            f"«decl {e} type:{draw(TYP)}"
            f" p_int={draw(st.integers(0, 99))}"
            f" p_bool={draw(st.sampled_from(['true', 'false']))}"
            f" p_enum=kind:Unit.V{draw(st.integers(0, 2))}»"
        )
    if kind == 1:
        return f"«about {e} q_int={draw(st.integers(0, 50))}»"
    if kind == 2:
        dst = draw(st.one_of(ENT, st.integers(0, 9).map(lambda i: f"X{i}")))
        return f"«rel {e} {draw(PRED)} {dst}»"
    if kind == 3:
        return f"«same {e} {draw(ENT)}»"
    if kind == 4:
        return f"«unk {draw(st.integers(0, 9))}»"
    # malformed mention: must be skipped, never crash or emit
    return draw(
        st.sampled_from(
            [
                "«decl type:T1»",
                "«rel E1 feeds»",
                "«decl E1 type:»",
                "«same E1»",
                "««»",
                "«decl E1 type:T1 =v»",
            ]
        )
    )


@st.composite
def transcript(draw):
    n = draw(st.integers(5, 40))
    rows = []
    for i in range(n):
        conv = f"c{draw(st.integers(0, 4))}"
        # 0-3 mentions per turn — fuzzes the multi-mention extraction
        # path (mention_idx ordering, same-turn attr overwrites)
        k = draw(st.integers(0, 3))
        text = draw(NOISE) + "".join(
            draw(mention()) + draw(NOISE) for _ in range(k)
        )
        rows.append((conv, i, "user", text, None))
    return rows


ROLES = st.sampled_from(["user", "assistant", "tool", "system"])


@st.composite
def role_transcript(draw):
    """Transcripts over ALL roles (the routing election depends on
    observed provenance, which the main fuzz holds constant)."""
    n = draw(st.integers(5, 25))
    rows = []
    for i in range(n):
        conv = f"c{draw(st.integers(0, 2))}"
        k = draw(st.integers(0, 2))
        text = draw(NOISE) + "".join(
            draw(mention()) + draw(NOISE) for _ in range(k)
        )
        rows.append((conv, i, draw(ROLES), text, None))
    return rows


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=role_transcript(),
    active=st.sets(
        st.sampled_from(["user", "assistant", "tool", "system"]), min_size=1
    ).map(sorted),
)
def test_routing_election_matches_reimplementation(spark, rows, active):
    """Differential fuzz for the export-profile election: an
    independent pure-Python reimplementation of the two-step rule
    (observed-when-legal, else min-priority-active, else skip; class
    skip cascades; is_about = attr profile ≠ class profile) must
    produce EXACTLY the rows route_to_profiles emits, for random
    transcripts × random active sets."""
    from cimpy_spark.operators.schema import (
        _FIXTURE_ROWS,
        PROFILE_PRIORITY,
        fixture_schema,
        route_to_profiles,
    )

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    nodes = P.build_graph(df, cache=False).nodes
    node_rows = [
        (r["entity_id"], r["attr"], r["value"], r["profile"])
        for r in nodes.collect()
    ]
    got = {
        (r["entity_id"], r["attr"], r["value"], r["export_profile"], r["is_about"])
        for r in route_to_profiles(nodes, fixture_schema(spark), active).collect()
    }

    possible = {(t, a): ps for t, a, _, _, _, _, ps in _FIXTURE_ROWS}
    types = {e: v for e, a, v, _ in node_rows if a == "rdf_type"}
    class_obs = {e: p for e, a, _, p in node_rows if a == "rdf_type"}

    def elect(observed, poss):
        legal = [p for p in poss if p in active]
        if observed in legal:
            return observed
        if not legal:
            return None
        return min(legal, key=lambda p: PROFILE_PRIORITY[p])

    expected = set()
    for e, a, v, p in node_rows:
        typ = types.get(e)
        cp = elect(class_obs.get(e), possible.get((typ, "__class__"), []))
        if cp is None:
            continue  # class skipped → entity skipped
        if a == "rdf_type":
            ep = cp
        elif (typ, a) in possible:
            ep = elect(p, possible[(typ, a)])
        else:
            ep = p if p in active else None  # unknown attr: provenance
        if ep is None:
            continue
        expected.add((e, a, v, ep, ep != cp))
    assert got == expected, (got - expected, expected - got)
    # every exported row lands in an ACTIVE profile
    assert all(r[3] in active for r in got)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=transcript())
def test_pipeline_matches_oracle_on_random_grammar(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    oracle = run_oracle(
        [{"conv_id": c, "turn_idx": i, "text": t} for c, i, _, t, _ in rows]
    )
    g = P.build_graph(df, cache=False)
    emitted = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"])
        for r in g.triples.select("subj", "pred", "obj", "obj_kind").distinct().collect()
    }
    expected = set(oracle.triples)
    p, r = precision_recall(emitted, expected)
    assert (p, r) == (1.0, 1.0), (
        emitted - expected,
        expected - emitted,
    )
    edges = {(e["src"], e["pred"], e["dst"]) for e in g.edges.collect()}
    assert edges == oracle.edges
    cmap = {r["entity_id"]: r["canonical_id"] for r in g.cmap.collect()}
    assert cmap == oracle.cmap


# ---------------------------------------------------------------------------
# Curation-operator differential fuzz (round 5): random document
# corpora (unicode noise, whitespace runs, empties) vs pure-Python
# reimplementations of the packing / chunking semantics, plus
# scrubbing idempotence.
# ---------------------------------------------------------------------------

DOC_TEXT = st.text(
    alphabet="ab xyz0é中\t .,@:/+", min_size=0, max_size=80
)


@st.composite
def doc_corpus(draw):
    n = draw(st.integers(1, 25))
    return [(i, draw(DOC_TEXT)) for i in range(n)]


def _pywords(t: str) -> list[str]:
    # mirror of text._words: Spark's trim strips SPACES only (tabs
    # survive — DuckDB's trim agrees, which is why the oracles match),
    # and Java's \s is ASCII whitespace; split of '' yields ['']
    import re

    return re.split(r"[ \t\n\x0b\f\r]+", t.strip(" "))


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=doc_corpus(), budget=st.integers(2, 40))
def test_pack_sequences_matches_python_reimplementation(spark, corpus, budget):
    """Differential fuzz: a pure-Python re-run of the packing rule
    (md5 shard, doc_id order, exclusive cumsum, floor-div/mod) must
    produce EXACTLY the engine's (shard, seq_id, offset) rows."""
    import hashlib

    from cimpy_spark.functions import text as T

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["seq_id"], r["offset"])
        for r in T.pack_sequences(df, budget=budget, n_shards=4).collect()
    }
    shards: dict[int, list[tuple[int, int]]] = {}
    for doc_id, t in corpus:
        h = int(hashlib.md5(f"pack0#{doc_id}".encode()).hexdigest()[:8], 16)
        shards.setdefault(h % 4, []).append((doc_id, len(_pywords(t))))
    expected = {}
    for shard, members in shards.items():
        cum = 0
        for doc_id, n in sorted(members):
            expected[doc_id] = (shard, n, cum // budget, cum % budget)
            cum += n
    assert got == expected


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    corpus=doc_corpus(),
    mt=st.integers(3, 30),
    ov=st.integers(0, 10),
)
def test_chunking_matches_python_reimplementation(spark, corpus, mt, ov):
    """Differential fuzz for chunking: minimal window count, exact
    slices, full word coverage — vs a Python re-run."""
    import math

    from cimpy_spark.functions import text as T

    ov = min(ov, mt - 1)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in T.chunk_documents(df, max_tokens=mt, overlap=ov).collect()
    }
    stride = mt - ov
    expected = {}
    for doc_id, t in corpus:
        w = _pywords(t)
        last = max(0, math.ceil((len(w) - mt) / stride))
        for ci in range(last + 1):
            piece = w[ci * stride : ci * stride + mt]
            expected[(doc_id, ci)] = (len(piece), " ".join(piece))
    assert got == expected


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=doc_corpus())
def test_pii_scrub_is_idempotent_on_fuzz_text(spark, corpus):
    """Scrubbing a scrubbed corpus is a no-op: placeholders never
    re-match any pattern and counts on clean text are all zero (random
    text may contain '@'/':'/'/' shards that look PII-adjacent)."""
    from pyspark.sql import functions as F

    from cimpy_spark.functions import text as T

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    once = T.pii_scrub(df).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = T.pii_scrub(once)
    assert twice.filter(
        (F.col("n_url") > 0) | (F.col("n_email") > 0)
        | (F.col("n_ip") > 0) | (F.col("n_phone") > 0)
    ).count() == 0
    joined = twice.join(once.select("doc_id", "text"), "doc_id")
    assert joined.filter(F.col("clean_text") != F.col("text")).count() == 0
