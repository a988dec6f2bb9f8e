"""Organic-duplicate corpus fixtures for the dedup/near-dup gates.

The reference's import tests run on fixtures with *genuine* cross-file
merges (CIGRE MV: 48 ``rdf:about`` re-declarations merged across
profiles, tests/test_import.py:17-36) — the analog for a training-data
dedup operator is a corpus where duplicates arrive organically IN the
input, at controlled similarity levels, instead of the round-2/3
gates' shifted-id self-unions of identical rows.

This module derives that corpus deterministically from the driver's
``documents`` / ``embeddings`` parquet, with the SAME derivation
expressed twice — once as Spark column expressions, once as a DuckDB
CTE — so the correctness oracle computes the planted truth
independently. The dedup operators under test receive the corpus as a
plain input frame and never see how it was made.

Planted classes (new ids never collide with base ids, which are
< 1_000_000 at every sf):

documents (word-3-gram Jaccard against the source doc, W = words):
- exact copy     (id+1M, doc_id%17==3): J = 1            → dup
- truncate to 90% (id+2M, doc_id%13==5): J ≈ 0.9·W/(W-2) → ~0.88,
  above the 0.8 corpus threshold for typical lengths
- truncate to 60% (id+3M, doc_id%13==7): J ≈ 0.58        → candidate
  often, rejected at verify (exercises the threshold)
- append 3 words  (id+4M, doc_id%13==9): J = (W-2)/(W+1) → ~0.95
Prefix mutations keep the mutated shingle set a SUBSET of the
original's, so the planted Jaccard is exactly |mut|/|orig| — a
controlled level per document length, not a point mass at 1.0.

embeddings (cosine against the source vector):
- amplitude modulation ±20% by coordinate parity (id+1M, vec_id%11==2):
  cos = (1+0.2b)/sqrt(1.04+0.4b) with b = (Σ±v²)/Σv² ≈ 0 ± 0.18
  → cos ≈ 0.9806 ± 0.0015 — tightly above a 0.95 threshold
- sign flip by coordinate parity (id+2M, vec_id%11==5):
  cos = b ≈ 0 ± 0.18 — far below the threshold (hard negative)

Both engines compute the perturbed values from the same float32
parquet cast to double with the same literals, so elementwise values
are bit-identical; verify margins (≥0.025 from the 0.95 threshold)
dwarf any summation-order noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

APPEND_SUFFIX = " qq7 zz9 xx3"

# Gate threshold for the organic embedding corpus: the planted
# modulated copies sit at cos ≈ 0.9806 ± 0.0015 (measured at sf0.01:
# min 0.9798) and the hard negatives below 0.3 — both margins dwarf
# cross-engine float noise at round-6 precision.
ORGANIC_COS_THRESHOLD = 0.95

# Hyperplane-LSH tables for the organic near-dup gates: one 8-plane
# table recalls the planted cos≈0.98 pairs at ~0.63 (per-plane
# agreement 1 - arccos(0.98)/π ≈ 0.936, ^8 ≈ 0.59); three tables
# OR-amplify to ~0.95 measured. The cap applies per (table, bucket).
ORGANIC_N_TABLES = 3

# Spark-side truncation expression: first max(1, (W*num) div 10) words
_W = "split(trim(text), '\\\\s+')"


def _trunc_expr(num: int) -> str:
    return (
        f"array_join(slice({_W}, 1, "
        f"greatest(1, (size({_W}) * {num}) div 10)), ' ')"
    )


# The planting recipe — (modulus, residue, id offset, kind) per
# duplicate lane — lives HERE and only here: the corpus builders
# (both dialects) and the ground-truth builders all derive from these
# tables, so truth and corpus cannot drift (review finding: the same
# numbers used to be hardcoded in four independent literals).
ORGANIC_PLANTS = (
    (17, 3, 1_000_000, "exact"),
    (13, 5, 2_000_000, "trunc90"),
    (13, 7, 3_000_000, "trunc60"),
    (13, 9, 4_000_000, "append"),
)
ORGANIC_EMB_PLANTS = (
    (11, 2, 1_000_000, "modulated"),
    (11, 5, 2_000_000, "flipped"),
)
_PLANT = {k: (m, r, off) for m, r, off, k in ORGANIC_PLANTS}
_EMB_PLANT = {k: (m, r, off) for m, r, off, k in ORGANIC_EMB_PLANTS}


def _lane(base: DataFrame, kind: str, id_col: str = "doc_id"):
    m, r, off = (_PLANT | _EMB_PLANT)[kind]
    return base.filter(F.col(id_col) % m == r), off


def organic_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, text) corpus with organically-planted exact and near
    duplicates at controlled Jaccard levels (see module docstring)."""
    base = docs.select("doc_id", "text")
    lane_e, off_e = _lane(base, "exact")
    exact = lane_e.select(
        (F.col("doc_id") + off_e).alias("doc_id"), "text"
    )
    lane_9, off_9 = _lane(base, "trunc90")
    trunc90 = lane_9.select(
        (F.col("doc_id") + off_9).alias("doc_id"),
        F.expr(_trunc_expr(9)).alias("text"),
    )
    lane_6, off_6 = _lane(base, "trunc60")
    trunc60 = lane_6.select(
        (F.col("doc_id") + off_6).alias("doc_id"),
        F.expr(_trunc_expr(6)).alias("text"),
    )
    lane_a, off_a = _lane(base, "append")
    appended = lane_a.select(
        (F.col("doc_id") + off_a).alias("doc_id"),
        F.concat(F.col("text"), F.lit(APPEND_SUFFIX)).alias("text"),
    )
    return base.unionByName(exact).unionByName(trunc90).unionByName(
        trunc60
    ).unionByName(appended)


def organic_embeddings(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding array<double>) corpus with perturbed near
    duplicates at controlled cosine (see module docstring)."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # ±20% amplitude modulation by coordinate parity: cos ≈ 0.98
    lane_m, off_m = _lane(base, "modulated", id_col="vec_id")
    modulated = lane_m.select(
        (F.col("vec_id") + off_m).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * F.when(i % 2 == 0, F.lit(1.2)).otherwise(F.lit(0.8)),
        ).alias("embedding"),
    )
    # alternating sign flip: cos ≈ 0 — the planted hard negative
    lane_f, off_f = _lane(base, "flipped", id_col="vec_id")
    flipped = lane_f.select(
        (F.col("vec_id") + off_f).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
        ).alias("embedding"),
    )
    return base.unionByName(modulated).unionByName(flipped)


# ---------------------------------------------------------------------------
# The SAME derivations in DuckDB dialect, for the correctness oracles.
# ---------------------------------------------------------------------------

# NB DuckDB list_slice(l, 1, n) is begin/end INCLUSIVE == Spark
# slice(l, 1, n) (begin/length) when begin is 1; both clamp past-end.
ORGANIC_DOCS_CTE = f"""
orgw AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents
),
orgdocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 17 = 3
  UNION ALL
  SELECT doc_id + 2000000,
         array_to_string(list_slice(w, 1, greatest(1, (len(w) * 9) // 10)), ' ')
  FROM orgw WHERE doc_id % 13 = 5
  UNION ALL
  SELECT doc_id + 3000000,
         array_to_string(list_slice(w, 1, greatest(1, (len(w) * 6) // 10)), ' ')
  FROM orgw WHERE doc_id % 13 = 7
  UNION ALL
  SELECT doc_id + 4000000, text || '{APPEND_SUFFIX}'
  FROM documents WHERE doc_id % 13 = 9
)
"""

# Spark's 0-based transform index i0 maps to the 1-based unnest index
# i = i0 + 1, so "i0 even" (factor 1.2 / sign +1) is "i odd" here.
ORGANIC_EMB_CTE = """
ebase AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
eexp AS (
  SELECT vec_id, nums.i AS i, emb[nums.i] AS v
  FROM ebase, (SELECT unnest(generate_series(1, 64)) AS i) nums
  WHERE nums.i <= len(emb)
),
eorg AS (
  SELECT vec_id, emb FROM ebase
  UNION ALL
  SELECT vec_id + 1000000,
         list(v * (CASE WHEN i % 2 = 1 THEN 1.2 ELSE 0.8 END) ORDER BY i)
  FROM eexp WHERE vec_id % 11 = 2 GROUP BY vec_id
  UNION ALL
  SELECT vec_id + 2000000,
         list(v * (CASE WHEN i % 2 = 1 THEN 1.0 ELSE -1.0 END) ORDER BY i)
  FROM eexp WHERE vec_id % 11 = 5 GROUP BY vec_id
)
"""


def _truth_pairs(ids: DataFrame, plants, id_col: str) -> DataFrame:
    out = None
    for m, r, off, kind in plants:
        lane = ids.filter(F.col(id_col) % m == r).select(
            F.col(id_col).alias("doc_a"),
            (F.col(id_col) + off).alias("doc_b"),
            F.lit(kind).alias("kind"),
        )
        out = lane if out is None else out.unionByName(lane)
    return out


def _truth_cte(name: str, table: str, id_col: str, plants) -> str:
    arms = "\n  UNION ALL\n  ".join(
        (f"SELECT {id_col} AS doc_a, {id_col} + {off} AS doc_b, "
         f"'{kind}' AS kind\n  FROM {table} WHERE {id_col} % {m} = {r}")
        if i == 0
        else (f"SELECT {id_col}, {id_col} + {off}, '{kind}'\n"
              f"  FROM {table} WHERE {id_col} % {m} = {r}")
        for i, (m, r, off, kind) in enumerate(plants)
    )
    return f"""
{name} AS (
  {arms}
)
"""


def organic_truth_pairs(docs: DataFrame) -> DataFrame:
    """The planted-pair GROUND TRUTH of organic_documents, as data:
    (doc_a, doc_b, kind) for every (original, planted copy) pair the
    fixture manufactures — the golden set a dedup evaluation op
    scores against. Derives from the RAW documents frame with the
    same residue/offset rules as the corpus builder, so truth and
    corpus cannot drift."""
    return _truth_pairs(docs.select("doc_id"), ORGANIC_PLANTS, "doc_id")


def organic_emb_truth_pairs(emb: DataFrame) -> DataFrame:
    """Planted-pair ground truth of organic_embeddings: the cos≈0.98
    modulated copies (should be found at the 0.95 gate) and the
    cos≈0 sign-flipped hard negatives (must NOT be found). Column
    names match organic_truth_pairs so one evaluation operator serves
    both sides."""
    return _truth_pairs(emb.select("vec_id"), ORGANIC_EMB_PLANTS, "vec_id")


ORGANIC_TRUTH_CTE = _truth_cte(
    "orgtruth", "documents", "doc_id", ORGANIC_PLANTS
)

ORGANIC_EMB_TRUTH_CTE = _truth_cte(
    "orgembtruth", "embeddings", "vec_id", ORGANIC_EMB_PLANTS
)


VERSION_SUFFIX = " v2"
ADDED_SUFFIX = " addendum"


def versioned_documents(docs: DataFrame) -> DataFrame:
    """The "next release" of the documents corpus for the
    corpus_diff gate: %13==0 docs removed, %7==1 survivors' text
    suffixed (changed), %11==3 docs re-published under +5M ids
    (added) — same residue style as the organic planting, derived
    identically by VERSIONED_DOCS_CTE."""
    base = docs.select("doc_id", "text")
    kept = base.filter(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 1,
            F.concat(F.col("text"), F.lit(VERSION_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = base.filter(F.col("doc_id") % 11 == 3).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(ADDED_SUFFIX)).alias("text"),
    )
    return kept.unionByName(added)


VERSIONED_DOCS_CTE = f"""
verdocs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 1 THEN text || '{VERSION_SUFFIX}'
              ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 5000000, text || '{ADDED_SUFFIX}'
  FROM documents WHERE doc_id % 11 = 3
)
"""


def pii_documents(docs: DataFrame) -> DataFrame:
    """Planted-PII corpus for the scrubber gate: the synthetic fixture
    text carries no organic PII, so a deterministic per-doc_id
    appendage plants one known item per class on ~4/7 of documents
    (email / URL / IPv4 / intl phone) — same derivation as
    doc_oracles.PII_DOCS_CTE, computed independently by both engines.
    The scrubber under test receives the corpus as a plain input
    frame."""
    d = F.col("doc_id")
    text = (
        F.when(
            d % 7 == 1,
            F.concat(F.col("text"), F.lit(" mail user"), d.cast("string"),
                     F.lit("@example.com now")),
        )
        .when(
            d % 7 == 2,
            F.concat(F.col("text"), F.lit(" see https://ex.org/d/"),
                     d.cast("string"), F.lit(" ok")),
        )
        .when(
            d % 7 == 3,
            F.concat(F.col("text"), F.lit(" host 10."),
                     (d % 200).cast("string"), F.lit(".0."),
                     (d % 250).cast("string"), F.lit(" up")),
        )
        .when(
            d % 7 == 4,
            F.concat(F.col("text"), F.lit(" call +49301234"),
                     (d % 90 + 10).cast("string"), F.lit(" thanks")),
        )
        .otherwise(F.col("text"))
    )
    return docs.select("doc_id", text.alias("text"))


def lined_documents(docs: DataFrame) -> DataFrame:
    """Multi-line corpus for the boilerplate-line-removal gate: the
    synthetic fixture text is a single line, so this derives a
    deterministic multi-line layout — same derivation as
    doc_oracles.LINED_DOCS_CTE, computed independently by both
    engines. The operator under test receives the corpus as a plain
    input frame and never sees how it was made.

    Layout per document:
    - the word stream re-wrapped into lines of 6 words;
    - a per-source footer line ``copyright <source> all rights
      reserved`` appended on doc_id % 3 != 0 — the planted
      BOILERPLATE (appears in ~2/3 of every source's docs, so any
      min_docs >= 2 flags it);
    - a globally unique line ``unique marker <doc_id>`` on
      doc_id % 97 == 5 — the planted NEGATIVE a correct operator must
      keep."""
    d = F.col("doc_id")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = ((F.size(w) + F.lit(5)) / F.lit(6)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(w, i * 6 + 1, 6), " "),
    )
    text = F.concat(
        F.array_join(chunks, "\n"),
        F.when(
            d % 3 != 0,
            F.concat(
                F.lit("\ncopyright "),
                F.col("source"),
                F.lit(" all rights reserved"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 97 == 5,
            F.concat(F.lit("\nunique marker "), d.cast("string")),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", text.alias("text"))


def mirrored_documents(docs: DataFrame) -> DataFrame:
    """Cross-source duplicate corpus for the source-overlap gate: the
    fixture corpus has no texts shared ACROSS sources (checked at
    sf0.01), so docs with doc_id % 7 == 1 are re-published verbatim (7 is coprime with the 20-source id cycle, so every source contributes)
    under a synthetic 'mirror' source (id + 5M) — the syndicated-
    content pattern the overlap matrix exists to expose. Same
    derivation as doc_oracles.MIRRORED_DOCS_CTE."""
    copies = docs.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        "text",
        F.lit("mirror").alias("source"),
    )
    return docs.select("doc_id", "text", "source").unionByName(copies)
