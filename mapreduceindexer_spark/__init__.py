"""mapreduceindexer_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame/SQL-first re-expression of the query and
data-processing capabilities of gabrieltintu/MapReduceIndexer (a C++11
pthreads map/reduce inverted-index builder; reference snapshot at
/root/reference, read-only), generalized into a full analytics engine:

- ``sources``   — table loaders (parquet), corpus manifest/document scans
                  (reference ``src/functions.cpp:14-37`` manifest parse,
                  ``:71-87`` document scan).
- ``functions`` — scalar/text functions (tokenize/normalize per reference
                  ``src/functions.cpp:39-46,77-84``), array/vector math.
- ``operators`` — the inverted-index pipeline (reference
                  ``src/functions.cpp:48-168``), boolean search, relational
                  queries, dedup, similarity search, text analysis.
- ``plans``     — plan-introspection helpers (pushdown/broadcast asserts).
- ``streaming`` — Structured Streaming equivalents of the batch windows.

Architecture is idiomatic Spark: declarative DataFrame programs handed to
Catalyst/Tungsten (predicate pushdown, partial aggregation, AQE, whole-stage
codegen), not a translation of the reference's thread/mutex/barrier design —
Spark's shuffle replaces the reference's shared-state merge entirely
(reference ``src/functions.cpp:121-127`` global mutex → groupBy exchange).
"""

from mapreduceindexer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
