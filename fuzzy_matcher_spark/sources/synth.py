"""Distributed deterministic document synthesis — pure JVM expressions.

``synthetic_docs`` builds an arbitrarily large corpus from
``spark.range`` + hash-based word selection: no driver-side loops, no
Python workers, fully deterministic in (n_docs, words_per_doc, seed).
This is the generator used for scaling benchmarks (bench.py --scaling)
— the same expression tree would synthesize a 10^12-row corpus on a
real cluster, partitioned by range.

Planted near-duplicates: ids with id % 10 == 1 re-generate the text of
id - 1 truncated to 92% of its words (word-shingle Jaccard ~0.9);
ids with id % 20 == 2 are byte-identical copies of id - 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "the a of to and in for on with data page web site news article store "
    "product review comment user profile search query result index table "
    "spark shuffle partition join filter scan merge sort window hash "
    "stream batch value count group order line item event click view "
    "price offer ship cart buy sell open close fast slow small large "
    "green blue red market house garden river mountain city road bridge "
    "paper stone metal glass wood light dark north south east west cloud"
).split()


def synthetic_docs(
    spark: SparkSession,
    n_docs: int,
    words_per_doc: int = 150,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id long, text string) with planted dup families."""
    n_words = len(_WORDS)
    words_lit = F.array(*[F.lit(w) for w in _WORDS])
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    base_id = (
        F.when(F.col("id") % 20 == 2, F.col("id") - 2)
        .when(F.col("id") % 10 == 1, F.col("id") - 1)
        .otherwise(F.col("id"))
    )
    n_keep = F.when(
        (F.col("id") % 10 == 1) & (F.col("id") % 20 != 2),
        F.lit(int(words_per_doc * 0.92)),
    ).otherwise(F.lit(words_per_doc))

    toks = F.transform(
        F.sequence(F.lit(1), n_keep),
        lambda i: F.element_at(
            words_lit,
            (F.pmod(F.xxhash64(base_id, i, F.lit(seed)), F.lit(n_words)) + 1).cast(
                "int"
            ),
        ),
    )
    return df.select(
        F.col("id").alias("doc_id"), F.array_join(toks, " ").alias("text")
    )
