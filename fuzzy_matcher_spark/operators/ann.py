"""Similarity search over embedding columns (array<float>).

Three paths:

- ``brute_force_topk``: exact cosine top-k. Probes (small) are
  broadcast; the dot product / norms are pure JVM higher-order
  functions (zip_with + aggregate) inside the join projection — no
  Python, no UDF. Top-k via ranking window per probe.

- ``lsh_topk``: random-hyperplane LSH (Charikar 2002). A numpy pandas
  UDF projects each embedding onto t*r seeded hyperplanes and packs
  sign bits into t bucket keys; candidates come from per-table bucket
  equi-joins (capped for skew), then exact cosine ranks the candidates.
  Scale path: bucket join replaces the probe x corpus product; recall
  is tunable via (tables, bits).

- ``ivf_topk``: inverted-file index (IVF-flat, the faiss/SPANN family).
  Spherical k-means centroids trained DRIVER-SIDE on a bounded,
  deterministic sample (TakeOrderedAndProject by xxhash64 — a map-side
  partial top-N, never a full sort/shuffle), broadcast to executors
  inside the assignment UDF's closure (k*dim floats — a few hundred KB
  at production sizes). One corpus scan assigns each vector to its
  nearest centroid ("inverted list"); probes fan out to their nprobe
  nearest lists and candidates come from a plain list_id equi-join.
  Vs LSH: one index row per vector (not ``tables``), candidates need
  no dedup (each corpus id lives in exactly one list), and recall is
  tuned by a RUNTIME knob (nprobe) instead of an index-build knob —
  the standard trade across the public ANN literature.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fuzzy_matcher_spark.operators.topk import topk_per_group


def dot_col(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(ca, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_col(a: Column | str, b: Column | str, na: Column, nb: Column) -> Column:
    return dot_col(a, b) / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """(probe_id, vec_id, cosine, rank) — exact; probes broadcast."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv"), norm_col(vec_col).alias("_cn")
    )
    p = probes.select(
        F.col(probe_id_col),
        F.col(vec_col).alias("_pv"),
        norm_col(vec_col).alias("_pn"),
    )
    scored = (
        c.join(F.broadcast(p), F.col(id_col) != F.col(probe_id_col))
        .withColumn(
            "cosine", dot_col("_cv", "_pv") / (F.col("_cn") * F.col("_pn"))
        )
        .select(probe_id_col, id_col, "cosine")
    )
    return topk_per_group(
        scored, [probe_id_col], [F.desc("cosine"), F.col(id_col)], k
    )


def hyperplane_buckets_udf(dim: int | None, tables: int, bits: int, seed: int):
    """pandas UDF: embedding -> array<long> of per-table bucket keys.

    ``dim=None`` infers the dimension from the first Arrow batch on each
    executor — the planes are regenerated from the same seed, so every
    worker derives identical hyperplanes without any driver-side
    materialization (no ``.first()`` on the plan)."""
    weights = (1 << np.arange(bits, dtype=np.int64))
    planes_cache: dict[int, np.ndarray] = {}

    def planes_for(d: int) -> np.ndarray:
        p = planes_cache.get(d)
        if p is None:
            rng = np.random.RandomState(seed)
            p = rng.standard_normal((tables * bits, d)).astype(np.float32)
            planes_cache[d] = p
        return p

    if dim is not None:
        planes_for(dim)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            mat = np.stack(
                [np.asarray(v, dtype=np.float32) for v in vecs]
            )  # (n, dim)
            planes = planes_for(mat.shape[1])
            signs = (mat @ planes.T) > 0  # (n, tables*bits)
            keys = signs.reshape(len(mat), tables, bits) @ weights  # (n, tables)
            yield pd.Series(list(keys.astype(np.int64)))

    return _udf


def lsh_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 16,
    bits: int = 10,
    seed: int = 42,
    max_bucket: int = 2048,
) -> DataFrame:
    """Embedding near-duplicate pairs (a, b, cosine) with a < b — the
    bucketed scale path for threshold-pair generation (the brute-force
    all-pairs query is its sf0.01 oracle anchor).

    Candidates come from per-table hyperplane-bucket self-joins
    (capped for skew, operators/pairs.py) instead of the O(n^2)
    product; exact cosine over candidates decides. Recall per pair at
    cosine c: 1 - (1 - p^bits)^tables with p = 1 - arccos(c)/pi —
    0.999+ for c >= 0.95 at the defaults, lower near the threshold
    itself; raise ``tables`` (or lower ``bits``) for tight-margin
    corpora. Pair-set equality vs brute force on planted duplicates is
    asserted by tests/test_ann_lsh.py.
    """
    from fuzzy_matcher_spark.operators.pairs import capped_self_join_pairs

    buckets = hyperplane_buckets_udf(None, tables, bits, seed)
    idx = (
        emb.withColumn("_bk", buckets(F.col(vec_col)))
        .select(
            F.col(id_col), F.posexplode("_bk").alias("table_id", "bucket")
        )
    )
    pairs = capped_self_join_pairs(
        idx, ["table_id", "bucket"], id_col, max_bucket
    )
    va = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_ea"))
    vb = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_eb"))
    return (
        pairs.join(va, "a")
        .join(vb, "b")
        .withColumn(
            "cosine", dot_col("_ea", "_eb") / (norm_col("_ea") * norm_col("_eb"))
        )
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means centroids, float32 (n_centroids, dim).

    The training sample is the ``train_size`` rows with the smallest
    xxhash64(id) — deterministic for a given corpus, and collected via
    TakeOrderedAndProject (per-partition top-N merged on the driver),
    so the only driver-side materialization is the bounded sample
    itself: at the defaults ~4096 * dim floats, regardless of corpus
    size. Lloyd iterations run on the driver in numpy (k-means is
    inherently iterative-with-global-state; distributing ~10 rounds
    over a 4096-row sample would pay 10 job/barrier round-trips to
    save microseconds of matmul). Empty clusters are reseeded to the
    points farthest from their current centroid — deterministic, and
    the standard k-means repair.
    """
    sample = (
        corpus.select(F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(train_size)
        .collect()
    )
    mat = np.stack([np.asarray(r[0], dtype=np.float32) for r in sample])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    n = len(mat)
    k = min(n_centroids, n)
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        sims = mat @ cents.T  # (n, k) cosine (rows unit-norm)
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
            else:
                # reseed to the globally worst-served point
                cents[c] = mat[int(np.argmin(np.max(sims, axis=1)))]
    return cents.astype(np.float32)


def ivf_assign_udf(centroids: np.ndarray, nprobe: int = 1):
    """pandas UDF: embedding -> array<int> of the nprobe nearest list
    ids (by cosine). ``nprobe=1`` for corpus assignment, >1 for probe
    fan-out. Centroids travel in the closure (broadcast once per
    executor by task serialization, k*dim float32)."""
    cents = np.ascontiguousarray(centroids, dtype=np.float32)
    np_ = min(nprobe, len(cents))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat @ cents.T  # (n, k)
            if np_ == 1:
                top = np.argmax(sims, axis=1)[:, None]
            else:
                part = np.argpartition(-sims, np_ - 1, axis=1)[:, :np_]
                order = np.argsort(
                    -np.take_along_axis(sims, part, axis=1), axis=1
                )
                top = np.take_along_axis(part, order, axis=1)
            yield pd.Series(list(top.astype(np.int32)))

    return _udf


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    train_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF-flat inverted index.

    Plan shape: ONE corpus scan computes (id, list_id) — the inverted
    index, a narrow int pair per vector; probes (small by contract)
    fan out to nprobe lists and broadcast into the list_id equi-join,
    so the only exchange is the candidate-sized vector join-back (ids
    are unique per list: no dedup shuffle at all, unlike LSH's
    per-table union). Residual skew (one hot list) is a plain
    equi-join for AQE's skew-split — capping would silently cost
    recall, the wrong trade for a search operator. Recall is a runtime
    knob: nprobe/n_centroids, re-ranked by exact cosine
    (tests/test_ann_lsh.py pins recall vs brute force).
    """
    cents = train_ivf_centroids(
        corpus, n_centroids, vec_col, id_col, train_size, seed=seed
    )
    assign1 = ivf_assign_udf(cents, 1)
    assignp = ivf_assign_udf(cents, nprobe)
    cidx = corpus.select(
        F.col(id_col), assign1(F.col(vec_col))[0].alias("_list")
    )
    pidx = probes.select(
        F.col(probe_id_col),
        F.explode(assignp(F.col(vec_col))).alias("_list"),
    )
    cand = (
        cidx.join(F.broadcast(pidx), "_list")
        .where(F.col(id_col) != F.col(probe_id_col))
        .select(probe_id_col, id_col)
    )
    cv = corpus.select(F.col(id_col), F.col(vec_col))
    pv = probes.select(F.col(probe_id_col), F.col(vec_col).alias("_pv"))
    scored = (
        cand.join(cv, id_col)
        .join(F.broadcast(pv), probe_id_col)
        .withColumn(
            "cosine",
            dot_col(vec_col, "_pv") / (norm_col(vec_col) * norm_col("_pv")),
        )
        .select(probe_id_col, id_col, "cosine")
    )
    return topk_per_group(
        scored, [probe_id_col], [F.desc("cosine"), F.col(id_col)], k
    )


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    tables: int = 8,
    bits: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join + exact re-rank.

    Shuffle discipline (same semi-join reduction as
    dedup_minhash.verify_pairs): the bucket index carries IDS ONLY —
    an index row per (id, table) that also carried the embedding would
    ship every vector through the bucket exchange ``tables`` times and
    once more through the dedup. Candidates are deduped as narrow
    (probe_id, id) rows first; corpus vectors join back once onto the
    candidate-sized set, and probe vectors (small by contract) join
    back as a broadcast. Each embedding therefore crosses the wire
    O(candidates) instead of O(tables * index).
    """
    buckets = hyperplane_buckets_udf(dim, tables, bits, seed)

    def index(df: DataFrame, idc: str) -> DataFrame:
        return (
            df.withColumn("_bk", buckets(F.col(vec_col)))
            .select(
                F.col(idc),
                F.posexplode("_bk").alias("table_id", "bucket"),
            )
        )

    cand = (
        index(corpus, id_col)
        .join(index(probes, probe_id_col), ["table_id", "bucket"])
        .where(F.col(id_col) != F.col(probe_id_col))
        .select(probe_id_col, id_col)
        .dropDuplicates([probe_id_col, id_col])
    )
    cv = corpus.select(F.col(id_col), F.col(vec_col))
    pv = probes.select(F.col(probe_id_col), F.col(vec_col).alias("_pv"))
    scored = (
        cand.join(cv, id_col)
        .join(F.broadcast(pv), probe_id_col)
        .withColumn(
            "cosine",
            dot_col(vec_col, "_pv") / (norm_col(vec_col) * norm_col("_pv")),
        )
        .select(probe_id_col, id_col, "cosine")
    )
    return topk_per_group(
        scored, [probe_id_col], [F.desc("cosine"), F.col(id_col)], k
    )
