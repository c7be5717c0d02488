"""Query catalog: every harness-checkable query + its DuckDB oracle SQL.

This is the single registration point consumed by ``__spark_entry__.py``:
``QUERIES[name] = (builder, oracle_sql | None)`` where ``builder(spark,
sf_dir) -> DataFrame``. Oracle SQL runs in DuckDB over the same parquet
files (views pre-registered by the driver: region nation customer supplier
part orders lineitem events documents embeddings).

Contract discipline (the driver hash-compares values after sorting columns
by name):

- every computed column is aliased identically in Spark and SQL;
- float aggregates are summed in DECIMAL(38,10) (exact, order-independent)
  then cast back to DOUBLE, or rounded to >= 6 fractional digits — so
  shuffle/accumulation order can never flip a hash bit;
- hashes that feed bucketing (minhash/simhash/fingerprints) use the
  md5-derived portable ``hash60`` (``functions/hashing.py``) which DuckDB
  reproduces exactly — never engine-native ``xxhash64``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduceindexer_spark.operators import index as ix
from mapreduceindexer_spark.operators import search
from mapreduceindexer_spark.sources.tables import load_table

Builder = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, tuple[Builder, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Builder) -> Builder:
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (kept in lockstep with functions/text.py).
# ---------------------------------------------------------------------------

# Raw whitespace tokens, empties dropped (reference: fin >> word skips all
# whitespace; leading-whitespace artifacts are empty strings in both
# engines' regex split, filtered identically).
SQL_RAW_TOKENS = r"""
  SELECT d.doc_id, t.tok
  FROM documents d, unnest(string_split_regex(d.text, '\s+')) AS t(tok)
  WHERE t.tok <> ''
"""

# Normalized nonempty terms, duplicates preserved (T1+T2+F1).
SQL_TERMS = r"""
  SELECT d.doc_id, lower(regexp_replace(t.tok, '[^A-Za-z]', '', 'g')) AS term
  FROM documents d, unnest(string_split_regex(d.text, '\s+')) AS t(tok)
  WHERE lower(regexp_replace(t.tok, '[^A-Za-z]', '', 'g')) <> ''
"""

# Distinct (doc_id, term) pairs (D1).
SQL_PAIRS = f"SELECT DISTINCT doc_id, term FROM ({SQL_TERMS})"

# Full postings relation (A1+A2+P1).
SQL_POSTINGS = f"""
  SELECT term,
         substr(term, 1, 1) AS letter,
         list_sort(list(doc_id)) AS doc_ids,
         CAST(count(doc_id) AS BIGINT) AS df
  FROM ({SQL_PAIRS})
  GROUP BY term
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Salted two-level aggregation by default: identical output, skew-safe
    # (see operators/index.py docstring).
    return ix.build_postings(_docs(spark, sf_dir), salt_buckets=16)


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ix.term_doc_pairs(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# §2.1 core operator queries (documents table)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402


@register(
    "q_doc_scan",
    "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 200",
)
def q_doc_scan(spark, sf_dir):
    """S2: scan + projection + pushed filter on the documents table."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") > 200)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "q_tokenize",
    f"SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM ({SQL_RAW_TOKENS}) GROUP BY doc_id",
)
def q_tokenize(spark, sf_dir):
    """T1: whitespace tokenization, counted per document."""
    from mapreduceindexer_spark.functions.text import tokenize

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.explode(tokenize("text")).alias("tok")
    ).filter(F.col("tok") != "").groupBy("doc_id").agg(
        F.count("*").alias("n_tokens")
    )


@register("q_normalize", SQL_TERMS.strip())
def q_normalize(spark, sf_dir):
    """T2+F1: normalized nonempty terms, duplicates preserved."""
    from mapreduceindexer_spark.functions.text import tokens_normalized

    return tokens_normalized(_docs(spark, sf_dir))


@register("q_term_doc_distinct", SQL_PAIRS)
def q_term_doc_distinct(spark, sf_dir):
    """D1: per-document distinct terms."""
    return _pairs(spark, sf_dir)


@register("q_postings", f"SELECT term, letter, doc_ids, df FROM ({SQL_POSTINGS})")
def q_postings(spark, sf_dir):
    """FLAGSHIP (A1+A2+P1): the reference's entire pipeline as one query."""
    return _postings(spark, sf_dir).select("term", "letter", "doc_ids", "df")


@register(
    "q_letter_histogram",
    f"""SELECT letter, CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(df) AS BIGINT) AS sum_df
        FROM ({SQL_POSTINGS}) GROUP BY letter""",
)
def q_letter_histogram(spark, sf_dir):
    """P1 as a query: per-letter index statistics."""
    return ix.letter_histogram(_postings(spark, sf_dir))


@register(
    "q_sorted_index",
    f"""SELECT letter, term, df,
               CAST(row_number() OVER (PARTITION BY letter ORDER BY df DESC, term ASC) AS BIGINT) AS rn
        FROM ({SQL_POSTINGS})""",
)
def q_sorted_index(spark, sf_dir):
    """O1: (df DESC, term ASC) order within each letter, pinned as ranks."""
    return ix.sorted_index(_postings(spark, sf_dir))


@register(
    "q_index_lines",
    f"""SELECT letter,
               term || ':[' || array_to_string(doc_ids, ' ') || ']' AS line,
               df, term
        FROM ({SQL_POSTINGS})""",
)
def q_index_lines(spark, sf_dir):
    """S3's formatting: the exact ``term:[ids]`` output lines."""
    return ix.index_lines(_postings(spark, sf_dir))


# ---------------------------------------------------------------------------
# §2.2 boolean search queries
# ---------------------------------------------------------------------------

PROBE_TERM_A = "spark"
PROBE_TERM_B = "join"


@register(
    "q_term_lookup",
    f"SELECT doc_id FROM ({SQL_PAIRS}) WHERE term = '{PROBE_TERM_A}'",
)
def q_term_lookup(spark, sf_dir):
    return search.docs_with_term(_pairs(spark, sf_dir), PROBE_TERM_A)


@register(
    "q_bool_and",
    f"""SELECT doc_id FROM ({SQL_PAIRS}) WHERE term = '{PROBE_TERM_A}'
        INTERSECT
        SELECT doc_id FROM ({SQL_PAIRS}) WHERE term = '{PROBE_TERM_B}'""",
)
def q_bool_and(spark, sf_dir):
    return search.bool_and(_pairs(spark, sf_dir), [PROBE_TERM_A, PROBE_TERM_B])


@register(
    "q_bool_or",
    f"""SELECT DISTINCT doc_id FROM ({SQL_PAIRS})
        WHERE term IN ('{PROBE_TERM_A}', '{PROBE_TERM_B}')""",
)
def q_bool_or(spark, sf_dir):
    return search.bool_or(_pairs(spark, sf_dir), [PROBE_TERM_A, PROBE_TERM_B])


@register(
    "q_bool_not",
    f"""SELECT doc_id FROM ({SQL_PAIRS}) WHERE term = '{PROBE_TERM_A}'
        EXCEPT
        SELECT doc_id FROM ({SQL_PAIRS}) WHERE term = '{PROBE_TERM_B}'""",
)
def q_bool_not(spark, sf_dir):
    return search.bool_not(_pairs(spark, sf_dir), PROBE_TERM_A, PROBE_TERM_B)


@register(
    "q_top_terms",
    f"SELECT term, df FROM ({SQL_POSTINGS}) ORDER BY df DESC, term ASC LIMIT 20",
)
def q_top_terms(spark, sf_dir):
    return search.top_terms(_postings(spark, sf_dir), k=20)
