"""Cross-corpus near-duplicate detection: probe a NEW corpus against
an EXISTING (indexed) one.

The asymmetric variant of MinHash-LSH dedup every multi-dump pipeline
needs: "which documents of crawl N+1 already exist (near-)verbatim in
crawls 1..N?" — the corpus-scale generalization of the reference
matcher's probe-vs-index search contract (fuzzy_matcher_core.go:
Search probes an index built by Build; here both sides are corpora).

Plan shape (the 100 TB story):

- Both sides share ONE signature config (the signature-format guard in
  functions/minhash.py applies: mixing configs silently yields zero
  agreement, so ``cross_dup_pairs`` derives both sides itself).
- Band indexes are joined on (band_id, band_hash) — a plain equi-join
  keyed by band hash, shuffling only narrow (key, id) rows, never
  text.
- Skew control mirrors pairs.capped_self_join_pairs but asymmetric:
  INDEX members of a bucket are ranked by id (one window pass, the
  same shuffle the join needs) and sliced to ``cap`` — bounded
  per-bucket memory even on mega-buckets — while PROBE rows are never
  collected at all: each probe row fans out to at most ``cap`` index
  ids. Truncation is observable via ``cross_bucket_stats``, never
  silent.
- Verification reuses dedup_minhash.verify_pairs (explode-by-side ->
  ONE join -> ONE groupBy, candidate-volume-sized shuffle). The two
  corpora may use overlapping id spaces, so ids are remapped to a
  disjoint synthetic space (2*id / 2*id+1) around the verifier and
  decoded after — ids must fit in 62 bits, which a 10^12-doc corpus
  clears by nine orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.minhash import explode_bands, token_gram_sig_udf
from ..functions.shingles import token_hashes_col
from .cachereg import register_cache as _register_cache
from .cachereg import release_caches
from .dedup_minhash import (
    _EAGER_STATS_MIN_BYTES,
    _has_tokens,
    _shingle_sets,
    add_signatures,
    ensure_parallelism,
    plan_size_bytes,
    verify_pairs,
)

__all__ = [
    "capped_cross_join_pairs",
    "cross_bucket_stats",
    "cross_dup_pairs",
    "cross_dedup_keep",
]


def capped_cross_join_pairs(
    idx_a: DataFrame,
    idx_b: DataFrame,
    bucket_keys: list[str],
    id_col: str,
    cap: int,
    a_out: str = "a",
    b_out: str = "b",
) -> DataFrame:
    """Distinct cross-side (a, b): every B row joins the <= ``cap``
    smallest A ids of its bucket. A-side membership is bounded by a
    rank-and-filter window (never an unbounded collect); the B side
    streams through the bucket join one row at a time."""
    wr = Window.partitionBy(*bucket_keys).orderBy(id_col)
    a_capped = (
        idx_a.withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") <= cap)
        .groupBy(*bucket_keys)
        .agg(F.sort_array(F.collect_list(id_col)).alias("_aids"))
    )
    return (
        idx_b.join(a_capped, bucket_keys)
        .select(
            F.col(id_col).alias(b_out), F.explode("_aids").alias(a_out)
        )
        .select(a_out, b_out)
        .distinct()
    )


def cross_bucket_stats(
    idx_a: DataFrame, bucket_keys: list[str], cap: int
) -> DataFrame:
    """Observability for the A-side cap: one row per OVERSIZED bucket
    with its true size and how many members the cap dropped."""
    return (
        idx_a.groupBy(*bucket_keys)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .where(F.col("bucket_size") > cap)
        .select(
            *bucket_keys,
            "bucket_size",
            (F.col("bucket_size") - F.lit(cap)).alias("n_dropped"),
        )
    )


def _narrow_signatures(
    df: DataFrame, cfg: DedupConfig, text_col: str, id_col: str
) -> DataFrame:
    """(id, signature) ONLY — the ~1.1 KB/doc relation worth
    persisting, mirroring dedup_minhash._signatures_with_exact_key.
    Same zero-token exclusion as add_signatures (sentinel signatures
    must not band together). Word mode skips the wide shingle-set half
    of the fused UDF entirely; char mode derives from add_signatures
    and just drops the wide column before the persist."""
    if cfg.shingle_mode == "word":
        base = ensure_parallelism(df).where(_has_tokens(text_col))
        sig = token_gram_sig_udf(cfg.num_perm, cfg.seed, cfg.shingle_size)
        return base.select(
            F.col(id_col), sig(token_hashes_col(text_col)).alias("signature")
        )
    return add_signatures(df, cfg, text_col, id_col).select(id_col, "signature")


def cross_dup_pairs(
    index_docs: DataFrame,
    probe_docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    single_pass: bool | None = None,
) -> DataFrame:
    """(index_id, probe_id, jaccard) for every cross-corpus pair with
    exact Jaccard >= cfg.jaccard_threshold among LSH band candidates.

    Zero-token docs on either side are excluded (add_signatures
    contract) — they can never be near-duplicates of anything, and
    ``cross_dedup_keep`` therefore always keeps them.

    ``single_pass`` (r6): the signature subtrees feed two consumers
    (band index + verifier values), so the LAZY shape evaluates each
    side's signature UDF pass twice. With ``single_pass`` each side
    runs ONCE into a persisted NARROW (id, signature) relation and the
    wide shingle sets are recomputed for CANDIDATE ids only via
    verify_pairs' shingle_builder semi-join — at corpus scale that
    halves the scan+UDF cost and keeps the verify join narrow. It
    costs ~10 extra scheduler jobs (cache fills, semi-joins), pure
    fixed overhead when the input is tiny (measured at sf0.1:
    1.4s lazy vs 3.9s single-pass — all barrier/job cost, no data).
    Default (None): single-pass iff the combined input-plan estimate
    >= _EAGER_STATS_MIN_BYTES, i.e. exactly when recompute could cost
    more than scheduling; unknown stats (RDD-backed inputs) choose
    single-pass, the conservative-at-scale side. Results are
    identical on both paths (both oracle-checked)."""
    release_caches()  # free the previous dedup invocation's caches
    if single_pass is None:
        single_pass = (
            plan_size_bytes(index_docs) + plan_size_bytes(probe_docs)
            >= _EAGER_STATS_MIN_BYTES
        )
    if not single_pass:
        return _cross_dup_pairs_lazy(
            index_docs, probe_docs, cfg, id_col, text_col
        )
    sig_i = _register_cache(
        _narrow_signatures(index_docs, cfg, text_col, id_col).persist()
    )
    sig_p = _register_cache(
        _narrow_signatures(probe_docs, cfg, text_col, id_col).persist()
    )
    bi = explode_bands(sig_i, id_col, cfg)
    bp = explode_bands(sig_p, id_col, cfg)
    cand = capped_cross_join_pairs(
        bi,
        bp,
        ["band_id", "band_hash"],
        id_col,
        cfg.max_band_bucket,
        a_out="index_id",
        b_out="probe_id",
    )
    # disjoint synthetic id space around the shared verifier (the two
    # corpora may reuse ids); decoded right back after the verdict
    two = F.lit(2)
    pairs_v = cand.select(
        (F.col("index_id") * two).alias("a"),
        (F.col("probe_id") * two + 1).alias("b"),
    )

    def _builder(cand_ids: DataFrame) -> DataFrame:
        # cand_ids carries SYNTHETIC ids; decode per side, semi-join
        # the raw corpus down to candidate-touched docs BEFORE the
        # tokenize/gram-mix pass, re-encode on the way out
        idx_ids = cand_ids.where(F.col(id_col) % two == 0).select(
            F.shiftright(id_col, 1).alias(id_col)
        )
        prb_ids = cand_ids.where(F.col(id_col) % two == 1).select(
            F.shiftright(id_col, 1).alias(id_col)
        )
        si = _shingle_sets(
            index_docs.join(idx_ids, id_col, "left_semi"),
            cfg,
            text_col,
            id_col,
            parallelize=False,
        )
        sp = _shingle_sets(
            probe_docs.join(prb_ids, id_col, "left_semi"),
            cfg,
            text_col,
            id_col,
            parallelize=False,
        )
        return si.select(
            (F.col(id_col) * two).alias(id_col), "shingle_hashes"
        ).unionByName(
            sp.select((F.col(id_col) * two + 1).alias(id_col), "shingle_hashes")
        )

    # sig_df is only consumed on the exact=False path; the exact path
    # reads its values from the shingle_builder's candidate-sized sets
    sig_v = sig_i.select(
        (F.col(id_col) * two).alias(id_col), "signature"
    ).unionByName(
        sig_p.select((F.col(id_col) * two + 1).alias(id_col), "signature")
    )
    verified = verify_pairs(
        pairs_v, sig_v, cfg, id_col=id_col, exact=True, shingle_builder=_builder
    )
    # decode: a = 2*index_id (even), b = 2*probe_id + 1 (odd) — a
    # right shift is exact at any id magnitude (float division is not
    # above 2^53)
    return verified.select(
        F.shiftright("a", 1).alias("index_id"),
        F.shiftright("b", 1).alias("probe_id"),
        "jaccard",
    )


def _cross_dup_pairs_lazy(
    index_docs: DataFrame,
    probe_docs: DataFrame,
    cfg: DedupConfig,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """The small-input shape: unpersisted signature subtrees feeding
    bands and verifier values directly. Each side's UDF pass is
    evaluated twice, but below _EAGER_STATS_MIN_BYTES that recompute
    is cheaper than the single-pass shape's cache/semi-join jobs (see
    cross_dup_pairs docstring)."""
    sig_i = add_signatures(index_docs, cfg, text_col, id_col)
    sig_p = add_signatures(probe_docs, cfg, text_col, id_col)
    bi = explode_bands(sig_i, id_col, cfg)
    bp = explode_bands(sig_p, id_col, cfg)
    cand = capped_cross_join_pairs(
        bi,
        bp,
        ["band_id", "band_hash"],
        id_col,
        cfg.max_band_bucket,
        a_out="index_id",
        b_out="probe_id",
    )
    # disjoint synthetic id space around the shared verifier (the two
    # corpora may reuse ids); decoded right back after the verdict
    two = F.lit(2)
    pairs_v = cand.select(
        (F.col("index_id") * two).alias("a"),
        (F.col("probe_id") * two + 1).alias("b"),
    )
    values_v = sig_i.select(
        (F.col(id_col) * two).alias(id_col), "shingle_hashes", "signature"
    ).unionByName(
        sig_p.select(
            (F.col(id_col) * two + 1).alias(id_col),
            "shingle_hashes",
            "signature",
        )
    )
    # materialize=False: this branch only runs below
    # _EAGER_STATS_MIN_BYTES (cross_dup_pairs gates on the input-plan
    # estimate), so the pairs-count AQE barrier buys nothing — a
    # mis-broadcast at this scale is tens of MiB at worst, exactly the
    # minhash_dedup small-input reasoning (its materialize=eager_stats)
    verified = verify_pairs(
        pairs_v, values_v, cfg, id_col=id_col, exact=True, materialize=False
    )
    return verified.select(
        F.shiftright("a", 1).alias("index_id"),
        F.shiftright("b", 1).alias("probe_id"),
        "jaccard",
    )


def cross_dedup_keep(
    index_docs: DataFrame,
    probe_docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The keep-side: probe docs with NO near-duplicate in the index
    corpus (all probe columns preserved). The incremental-crawl filter:
    union(index, keep) is dedup-clean across dumps."""
    hits = (
        cross_dup_pairs(index_docs, probe_docs, cfg, id_col, text_col)
        .select(F.col("probe_id").alias(id_col))
        .distinct()
    )
    return probe_docs.join(hits, id_col, "left_anti")
