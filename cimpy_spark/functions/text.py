"""Text-analysis operators for training-data pipelines over the
`documents` table: token counting, quality scoring, language-ID
heuristic, document fingerprinting.

All pure column expressions (`pyspark.sql.functions` only — JVM-side,
whole-stage codegen, no Python). Each has an exact DuckDB oracle in
cimpy_spark/functions/doc_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, single other non-space.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in"]
DATA_STOPWORDS = ["data", "table", "row", "column", "query"]


def _words(col: str = "text"):
    return F.split(F.trim(F.col(col)), "\\s+")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace and BPE-ish
    regex token counts."""
    return docs.select(
        "doc_id",
        F.size(_words()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


def _ratio(hits, total):
    return F.round(hits * F.lit(1.0) / total, 6)


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score.

    Deterministic arithmetic only (same association order as the SQL
    oracle, rounded to 6 decimals so both engines hash-match).
    """
    w = _words()
    n_tok = F.size(w)
    stop_hits = F.size(F.filter(w, lambda x: x.isin(EN_STOPWORDS)))
    avg_word_len = F.round(
        F.length(F.trim(F.col("text"))) * F.lit(1.0) / n_tok, 6
    )
    stop_ratio = _ratio(stop_hits, n_tok)
    score = F.round(
        F.least(n_tok * F.lit(1.0) / 50, F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + F.least(avg_word_len / 10, F.lit(1.0)) * 0.2,
        6,
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        avg_word_len.alias("avg_word_len"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram/stopword language-ID heuristic (the real thing would
    score character n-grams per language; same plumbing)."""
    w = _words()
    en_hits = F.size(F.filter(w, lambda x: x.isin(EN_STOPWORDS)))
    data_hits = F.size(F.filter(w, lambda x: x.isin(DATA_STOPWORDS)))
    pred = (
        F.when(en_hits >= 2, F.lit("en"))
        .when(data_hits >= 3, F.lit("dataese"))
        .otherwise(F.lit("unk"))
    )
    return docs.select(
        "doc_id",
        en_hits.alias("en_hits"),
        data_hits.alias("data_hits"),
        pred.alias("lang_pred"),
    )


def shingle_array(n: int = 3, col: str = "text"):
    """Distinct word n-grams of `col` as a per-row array expression —
    THE single shingle construction shared by fingerprinting, MinHash
    and Jaccard (one source of truth: a tokenization tweak here moves
    all three together). Narrow; docs shorter than n words yield an
    empty array."""
    w = _words(col)
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(gram)


def has_shingles(n: int = 3):
    """Predicate: the doc has at least one n-gram shingle — derived
    from the SAME `_words` tokenization as `shingle_array` so the two
    can never diverge."""
    return F.size(_words()) >= n


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams — the exploded form of
    `shingle_array`."""
    return docs.select("doc_id", F.explode(shingle_array(n)).alias("shingle"))


def corpus_filter(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple = ("en", "dataese"),
    dedup_threshold: float = 0.8,
) -> DataFrame:
    """Training-corpus selection — the decision a data pipeline
    actually ships: quality gate + language gate + near-duplicate
    keep, in one plan. Output: (doc_id, quality, lang_pred, is_kept,
    selected). All three inputs are existing oracle-gated operators;
    joins are on doc_id (co-partitioned aggregations, no skew)."""
    from cimpy_spark.functions.dedup import dedup_corpus

    q = quality_score(docs).select("doc_id", "quality")
    lang = lang_id(docs).select("doc_id", "lang_pred")
    keep = dedup_corpus(docs, threshold=dedup_threshold).select(
        "doc_id", "is_kept"
    )
    return (
        q.join(lang, "doc_id")
        .join(keep, "doc_id")
        .select(
            "doc_id",
            "quality",
            "lang_pred",
            "is_kept",
            (
                (F.col("quality") >= min_quality)
                & F.col("lang_pred").isin(*langs)
                & F.col("is_kept")
            ).alias("selected"),
        )
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint = lexicographic-min md5 over word 5-grams
    (a 1-permutation MinHash; rolling-hash analog), falling back to
    md5(text) for very short docs."""
    sh = shingles(docs, n=5)
    fp = sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fp"))
    return (
        docs.select("doc_id", F.md5("text").alias("fallback"))
        .join(fp, "doc_id", "left")
        .select("doc_id", F.coalesce("fp", "fallback").alias("fingerprint"))
    )


def hash_split(
    docs: DataFrame, salt: str = "split0", val_pct: int = 5, test_pct: int = 5
) -> DataFrame:
    """Deterministic hash-based train/val/test split — the
    reproducible-corpus-split primitive a training pipeline needs
    instead of RNG sampling: bucket = first 8 hex digits of
    md5(salt#doc_id) mod 100, so a document's split (a) never changes
    when OTHER documents arrive or depart (stable under corpus
    growth, unlike any fraction-based random split), (b) is
    recomputable by any engine from the id alone, and (c) re-salts
    into an independent split. Output: (doc_id, bucket, split)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("#", F.lit(salt), F.col("doc_id").cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    bucket = (h % 100).cast("int")
    split = (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return docs.select(
        "doc_id", bucket.alias("bucket"), split.alias("split")
    )


def source_quota(docs: DataFrame, k: int = 10) -> DataFrame:
    """Per-source quality quota: the top `k` documents of each source
    by (quality desc, doc_id asc) — the per-domain selection/mixing
    step of corpus curation (cap each domain's contribution, keep its
    best). One window over the (source, quality) projection; at scale
    this is a rank-based top-K per partition key, spillable, no
    collect. Output: (doc_id, source, quality, rk)."""
    from pyspark.sql import Window

    q = quality_score(docs).select("doc_id", "quality")
    joined = docs.select("doc_id", "source").join(q, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "source", "quality", "rk")
    )


def contamination(train: DataFrame, bench: DataFrame, n: int = 5) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a benchmark/eval corpus (the GPT-3-style 13-gram
    check, here parameterized; default 5 suits the short synthetic
    docs). Output: (doc_id, n_hit_grams, contaminated) for every
    training doc.

    Scale shape: the benchmark side is SMALL by definition — its
    distinct n-gram set broadcasts; the training side is one narrow
    explode feeding a broadcast semi-equi-join, so the corpus is read
    once and never shuffled (the aggregation shuffles only the hit
    rows, a tiny fraction). No per-row Python anywhere."""
    bench_grams = (
        bench.select(F.explode(shingle_array(n)).alias("gram")).distinct()
    )
    train_grams = train.select(
        "doc_id", F.explode(shingle_array(n)).alias("gram")
    )
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .fillna(0, ["n_hit_grams"])
        .select(
            "doc_id",
            F.col("n_hit_grams").cast("bigint").alias("n_hit_grams"),
            (F.col("n_hit_grams") > 0).alias("contaminated"),
        )
    )
