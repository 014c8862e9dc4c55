"""Hyperplane-LSH operators vs brute force on planted duplicates.

The shipped testdata embeddings have no near-duplicate pairs (max
pairwise cosine ~0.51), so the driver-level oracle for the bucketed
pair operator is trivially consistent; these tests carry the real
evidence: on a corpus with planted high-cosine duplicates the LSH
pair set must EQUAL the brute-force pair set (recall and precision
1.0 — precision is structural, since exact cosine decides).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuzzy_matcher_spark.operators.ann import (
    brute_force_topk,
    lsh_dup_pairs,
    lsh_topk,
)

DIM = 32


def _planted_corpus(n_base=120, n_dups=40, seed=7):
    """Random unit-ish vectors + noisy copies (cosine >= ~0.97)."""
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n_base, DIM))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    for j in range(n_dups):
        src = j % n_base
        noisy = base[src] + 0.08 * rng.standard_normal(DIM)
        rows.append((n_base + j, [float(x) for x in noisy]))
    return rows


def _brute_pairs(rows, threshold):
    out = set()
    vecs = {i: np.asarray(v) for i, v in rows}
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i >= j:
                continue
            a, b = vecs[i], vecs[j]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if cos >= threshold:
                out.add((i, j))
    return out


def test_lsh_dup_pairs_equals_brute_force(spark):
    rows = _planted_corpus()
    want = _brute_pairs(rows, 0.9)
    assert len(want) >= 40  # every planted dup + a few base collisions

    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got_rows = lsh_dup_pairs(emb, threshold=0.9).collect()
    got = {(r.a, r.b) for r in got_rows}

    assert got == want, (
        f"missed={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )
    # cosine values must be the exact-verify values (spot check one)
    if got_rows:
        r = got_rows[0]
        a = np.asarray(dict(rows)[r.a])
        b = np.asarray(dict(rows)[r.b])
        ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert r.cosine == pytest.approx(ref, abs=1e-12)


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF-flat must recover >= 0.95 of the exact k=1 neighbors for
    probes with true near-duplicates (a near-duplicate's nearest
    centroid is its source's centroid with overwhelming probability,
    and nprobe widens the window); exact-cosine re-rank makes any
    recovered neighbor's score exact."""
    from fuzzy_matcher_spark.operators.ann import ivf_topk

    rows = _planted_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.where(F.col("vec_id") >= 120).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = {
        (r.probe_id, r.vec_id)
        for r in brute_force_topk(emb, probes, k=1).collect()
    }
    got_rows = ivf_topk(
        emb, probes, k=1, n_centroids=16, nprobe=4, train_size=160
    ).collect()
    approx = {(r.probe_id, r.vec_id) for r in got_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f}"
    # re-rank scores are exact cosine (spot check one row)
    r = got_rows[0]
    a = np.asarray(dict(rows)[r.probe_id])
    b = np.asarray(dict(rows)[r.vec_id])
    ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert r.cosine == pytest.approx(ref, abs=1e-12)


def test_ivf_centroids_deterministic(spark):
    """Same corpus + seed -> bit-identical centroids (the sample is
    xxhash64-ordered, not partition-ordered), so a re-run of the
    assignment stage reproduces the same inverted lists — required
    for resumable pipelines that persist (id, list_id)."""
    from fuzzy_matcher_spark.operators.ann import train_ivf_centroids

    rows = _planted_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1 = train_ivf_centroids(emb, 16, train_size=100)
    c2 = train_ivf_centroids(
        emb.repartition(7), 16, train_size=100
    )
    assert c1.shape == (16, DIM)
    assert np.array_equal(c1, c2)


def test_lsh_topk_recall_vs_brute_force(spark):
    """lsh_topk must recover >= 0.95 of the exact nearest neighbors
    (k=1) for probes that have true near-duplicates — lower ranks are
    random ~0.4-cosine vectors, which bucketed LSH by design does not
    chase."""
    rows = _planted_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = emb.where(F.col("vec_id") >= 120).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = {
        (r.probe_id, r.vec_id)
        for r in brute_force_topk(emb, probes, k=1).collect()
    }
    approx = {
        (r.probe_id, r.vec_id) for r in lsh_topk(emb, probes, k=1).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f}"
