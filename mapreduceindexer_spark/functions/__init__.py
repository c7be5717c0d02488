from mapreduceindexer_spark.functions.text import normalize_term, tokenize, tokens_normalized
from mapreduceindexer_spark.functions.vector import cosine_similarity, dot, l2_norm

__all__ = [
    "normalize_term",
    "tokenize",
    "tokens_normalized",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
