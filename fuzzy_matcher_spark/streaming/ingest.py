"""Structured Streaming ingest — incremental index maintenance.

The reference supports incremental Build on a live matcher
(fuzzy_matcher_core.go:59-106 is re-entrant; tested
tests/integration_test.go:656-675) and lazy TTL expiry (clean.go:29-51).
Streaming analogs:

- ``incremental_dedup_sink``: foreachBatch sink that, per micro-batch
  of new documents, (1) computes MinHash signatures, (2) finds verified
  near-dup pairs of new docs vs the already-indexed corpus AND within
  the batch, (3) appends signatures + pairs to TableIO tables. This is
  exactly the batch pipeline's stage graph applied incrementally —
  insert-then-search visibility within one trigger, like the
  reference's insert-then-search immediacy.

- ``windowed_doc_counts``: watermarked tumbling-window aggregation over
  the ingest stream (late data handled by the watermark), the standard
  observability companion.

TTL expiry at read time stays a predicate (operators/matcher.py); the
maintenance delete is TableIO.delete_where.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzy_matcher_spark.config import DedupConfig
from fuzzy_matcher_spark.functions.minhash import (
    sig_agreement_col,
    signature_format_id,
)
from fuzzy_matcher_spark.operators.dedup_minhash import (
    add_signatures,
    candidate_pairs,
    jaccard_udf,
)
from fuzzy_matcher_spark.sources.tableio import TableIO

SIG_TABLE = "stream_signatures"
PAIR_TABLE = "stream_pairs"


def incremental_dedup_sink(
    io: TableIO,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns a foreachBatch(df, epoch_id) function.

    Persisted-state guard: every appended signature row carries a
    ``sig_format`` stamp (code-format version + signature-space config,
    functions/minhash.signature_format_id). Signatures written under a
    different hash family / gram-id space / banding config band-join
    with ~zero agreement against fresh ones — duplicates would be
    silently missed — so the sink REFUSES to append to a table whose
    stamp mismatches (checked once per sink, on the first micro-batch
    that finds an existing table). Recovery: recompute the table with
    the current code/config, or run with the recorded config.
    """
    fmt = signature_format_id(cfg)
    state = {"format_checked": False}

    def _check_format(old: DataFrame) -> None:
        if state["format_checked"]:
            return
        if "sig_format" not in old.columns:
            raise ValueError(
                f"{SIG_TABLE} predates signature-format stamping; its "
                "signatures are not comparable with the current code "
                f"(expected {fmt!r}). Rebuild it with the current "
                "pipeline before streaming into it."
            )
        bad = (
            old.select("sig_format")
            .where(F.col("sig_format") != fmt)
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"{SIG_TABLE} holds signatures with format "
                f"{bad[0][0]!r} but the running config produces {fmt!r}"
                "; mixed-format band joins silently miss duplicates. "
                "Rebuild the table or match the recorded config."
            )
        state["format_checked"] = True

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_sigs = (
            add_signatures(batch_df, cfg, text_col, id_col)
            .withColumn("sig_format", F.lit(fmt))
            .persist()
        )

        # candidates: new-vs-new (self) + new-vs-indexed (cross)
        pairs = candidate_pairs(new_sigs, cfg, id_col)
        if io.exists(SIG_TABLE):
            old = io.read(SIG_TABLE)
            _check_format(old)
            from fuzzy_matcher_spark.functions.minhash import explode_bands

            nb = explode_bands(new_sigs, id_col, cfg)
            ob = explode_bands(old, id_col, cfg)
            cross = (
                nb.join(
                    ob.withColumnRenamed(id_col, "_old_id"),
                    ["band_id", "band_hash"],
                )
                .select(
                    F.least(F.col(id_col), F.col("_old_id")).alias("a"),
                    F.greatest(F.col(id_col), F.col("_old_id")).alias("b"),
                )
                .where(F.col("a") != F.col("b"))
                .distinct()
            )
            pairs = pairs.union(cross).distinct()
            all_sigs = old.unionByName(new_sigs)
        else:
            all_sigs = new_sigs

        sig_a = all_sigs.select(
            F.col(id_col).alias("a"),
            F.col("signature").alias("_sig_a"),
            F.col("shingle_hashes").alias("_sh_a"),
        )
        sig_b = all_sigs.select(
            F.col(id_col).alias("b"),
            F.col("signature").alias("_sig_b"),
            F.col("shingle_hashes").alias("_sh_b"),
        )
        verified = (
            pairs.join(sig_a, "a")
            .join(sig_b, "b")
            .withColumn("est", sig_agreement_col("_sig_a", "_sig_b", cfg.num_perm))
            .where(F.col("est") >= cfg.jaccard_threshold - 0.1)
            .withColumn("jaccard", jaccard_udf("_sh_a", "_sh_b"))
            .where(F.col("jaccard") >= cfg.jaccard_threshold)
            .select("a", "b", "jaccard", F.lit(int(epoch_id)).alias("epoch"))
        )
        io.write(verified, PAIR_TABLE, mode="append")
        io.write(new_sigs, SIG_TABLE, mode="append")
        new_sigs.unpersist()

    return sink


def windowed_doc_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
    window: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per language (late rows beyond
    the watermark are dropped by the engine)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_docs",
        )
    )
