from mapreduceindexer_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views
from mapreduceindexer_spark.sources.corpus import read_manifest_corpus

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_manifest_corpus",
]
