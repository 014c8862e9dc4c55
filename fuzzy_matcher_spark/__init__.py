"""fuzzy_matcher_spark — a PySpark-native near-duplicate detection and
fuzzy entity-matching engine.

Re-expresses the query/data-processing capabilities of the reference
Fuzzy-Matcher engine (/root/reference, Go, trie-based) as idiomatic Spark:

- multi-field fuzzy matching (blocking joins -> vectorized verification ->
  weighted scoring -> window top-k), reference semantics per
  fuzzy_matcher_core/fuzzy_matcher_core.go:109-291
- document-scale near-duplicate detection: exact hash, MinHash-LSH,
  SimHash Hamming buckets, n-gram Jaccard, suffix-array substring
- connected-components clustering (large-star/small-star)
- checkpointed, resumable batch pipeline with lineage + metrics tables

All hot-path expressions are JVM built-ins; Python appears only as
Arrow-vectorized pandas UDFs (never per-row).
"""

from fuzzy_matcher_spark.config import (
    CoreParams,
    FieldParams,
    MatchConfig,
    DedupConfig,
)
from fuzzy_matcher_spark.session import get_spark

__all__ = [
    "CoreParams",
    "FieldParams",
    "MatchConfig",
    "DedupConfig",
    "get_spark",
]

__version__ = "0.1.0"
