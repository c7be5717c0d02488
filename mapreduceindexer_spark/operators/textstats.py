"""Text-analysis operators: TF-IDF, language stats/ID, quality scoring,
token counting, document fingerprinting.

All built-in-function compositions over the ``documents`` table — the hot
path is explode + hash-aggregate, the same shape as the index pipeline, so
everything whole-stage-codegens and scales with the same partitioning
story. The reference's seed is T1/T2/A1 (tokenize/normalize/aggregate,
``src/functions.cpp:77-128``); TF-IDF composes the reference's df with the
term frequencies it deliberately discards (``src/functions.cpp:86``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduceindexer_spark.functions.text import (
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
    normalized_token_array,
    shingles,
    tokens_normalized,
)

# Whitespace tokens, alpha runs, digit runs, single punctuation — the
# "BPE-ish" pre-tokenizer split used by q_token_counts.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tfidf(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf, idf, tfidf) — classic ln(N/df) weighting.

    Shape: ONE corpus scan — tf by aggregation, then df as a window count
    over tf (tf has exactly one row per (doc, term), so ``count() OVER
    (PARTITION BY term)`` IS the document frequency). No self-join, no
    second scan: scan → explode → (doc,term) agg → term-partitioned window
    → broadcast of the single-row corpus count. At 100 TB the df column is
    exactly the index's postings df — build once, reuse both places.
    """
    from pyspark.sql import Window

    terms = tokens_normalized(docs)
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").cast("bigint").alias("tf"))
    tfdf = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("bigint")
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    idf_raw = F.log(F.col("n_docs") / F.col("df"))
    return tfdf.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        F.round(idf_raw, 6).alias("idf"),
        F.round(F.col("tf") * idf_raw, 6).alias("tfidf"),
    )


def lang_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus statistics (metadata aggregation family)."""
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(38,10)")).cast("double") / F.count("*"),
            6,
        ).alias("avg_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality heuristics: token count, mean token length,
    stopword ratio, and a bounded composite score.

    The score is a deliberately simple, fully-deterministic formula
    (length prior × (1 − stopword share)); real pipelines swap in a model
    score — the query shape (explode → agg → arithmetic) is the point.
    """
    terms = tokens_normalized(docs)
    per_doc = terms.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.col("term").isin(*STOPWORDS_EN).cast("int")).cast("bigint").alias("n_stop"),
        F.round(
            F.sum(F.length("term").cast("decimal(38,10)")).cast("double") / F.count("*"),
            6,
        ).alias("avg_token_len"),
    )
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        "avg_token_len",
        F.round(F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * (1 - stop_ratio), 6).alias(
            "quality"
        ),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-list language ID (n-gram heuristic family).

    Scores each doc against three stopword lists; argmax with a fixed
    precedence (en > de > fr) for ties. A real system uses char-n-gram
    models; the Spark shape (explode → conditional agg → argmax) is
    identical.
    """
    terms = tokens_normalized(docs)
    hits = terms.groupBy("doc_id").agg(
        F.sum(F.col("term").isin(*STOPWORDS_EN).cast("int")).cast("bigint").alias("en_hits"),
        F.sum(F.col("term").isin(*STOPWORDS_DE).cast("int")).cast("bigint").alias("de_hits"),
        F.sum(F.col("term").isin(*STOPWORDS_FR).cast("int")).cast("bigint").alias("fr_hits"),
    )
    return hits.select(
        "doc_id",
        "en_hits",
        "de_hits",
        "fr_hits",
        F.when(
            (F.col("en_hits") >= F.col("de_hits")) & (F.col("en_hits") >= F.col("fr_hits")),
            "en",
        )
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
        .alias("lang_pred"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace vs BPE-ish pre-tokenizer counts per document — the
    token-budget accounting every training pipeline needs."""
    ws = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    bpe = F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE), 0)
    return docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.size(bpe).cast("bigint").alias("n_bpe_pieces"),
    )


def fingerprints(docs: DataFrame, k: int = 3) -> DataFrame:
    """Winnowing-style document fingerprint: min shingle digest per doc.

    Documents with < k tokens have no shingles and are excluded —
    consistent in engine and oracle.
    """
    sh = docs.select(
        "doc_id",
        F.explode(shingles(normalized_token_array("text"), k)).alias("shingle"),
    )
    return sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))
