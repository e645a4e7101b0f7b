"""Column-level functions (SURVEY.md §2.7): vector math, text/tokenize,
deterministic hashing. All JVM-side (higher-order functions / built-ins) —
no row-at-a-time Python UDFs in any hot path.
"""

from memfuse_spark.functions.vector import (
    dot,
    l2_norm,
    normalize,
    cosine_similarity,
    hash_embedding,
)
from memfuse_spark.functions.text import (
    tokenize,
    word_count_cjk,
    char_ngrams,
    word_shingles,
)

__all__ = [
    "dot",
    "l2_norm",
    "normalize",
    "cosine_similarity",
    "hash_embedding",
    "tokenize",
    "word_count_cjk",
    "char_ngrams",
    "word_shingles",
]
