"""Boolean search over the inverted index (SURVEY §2.2).

The reference builds the index but ships no query executor — lookups are
what the output format is *for* (``/root/reference/README.md:14-16``). These
are the first-class Spark versions.

Scale design: every operator here works on the **distinct (term, doc_id)
pair** relation, not on materialized posting arrays. Filtering
``term IN (...)`` is a pushed-down predicate on the (letter-partitionable)
pairs table, and AND/OR/NOT become semi/anti joins and unions on ``doc_id``
— shapes that stay bounded per task no matter how long a stopword's posting
list gets. (``array_intersect`` on pre-built posting rows is the
small-scale shortcut; joins are the 100 TB path, so that is the default.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def docs_with_term(pairs: DataFrame, term: str) -> DataFrame:
    """doc_ids containing ``term`` (term lookup)."""
    return pairs.filter(F.col("term") == term).select("doc_id")


def bool_and(pairs: DataFrame, terms: Sequence[str]) -> DataFrame:
    """Documents containing ALL of ``terms`` (conjunctive query).

    Chain of left-semi joins: each term's doc set filters the running
    result; Catalyst turns these into shuffled or broadcast hash joins
    depending on runtime sizes (AQE).
    """
    result = docs_with_term(pairs, terms[0])
    for t in terms[1:]:
        result = result.join(docs_with_term(pairs, t), "doc_id", "left_semi")
    return result


def bool_or(pairs: DataFrame, terms: Sequence[str]) -> DataFrame:
    """Documents containing ANY of ``terms`` — one pass, no per-term union."""
    return (
        pairs.filter(F.col("term").isin(list(terms))).select("doc_id").distinct()
    )


def bool_not(pairs: DataFrame, include: str, exclude: str) -> DataFrame:
    """Documents containing ``include`` but not ``exclude`` (anti join)."""
    return docs_with_term(pairs, include).join(
        docs_with_term(pairs, exclude), "doc_id", "left_anti"
    )


def top_terms(postings: DataFrame, k: int = 20) -> DataFrame:
    """Top-k terms by (df DESC, term ASC) — planned as TakeOrderedAndProject,
    so only k rows ever leave each partition."""
    return postings.select("term", "df").orderBy(F.desc("df"), F.asc("term")).limit(k)
