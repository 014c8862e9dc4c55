from fuzzy_matcher_spark.functions.normalize import normalize_col, is_valid_name_col
from fuzzy_matcher_spark.functions.similarity import (
    jaro_winkler,
    levenshtein_sim,
    similarity,
    trie_edit_distance,
    jaro_winkler_udf,
    trie_edits_udf,
    similarity_udf,
)

__all__ = [
    "normalize_col",
    "is_valid_name_col",
    "jaro_winkler",
    "levenshtein_sim",
    "similarity",
    "trie_edit_distance",
    "jaro_winkler_udf",
    "trie_edits_udf",
    "similarity_udf",
]
