"""Phase-level profiler for the scaling rig (round 5).

Why: the north rule's N->4N efficiency criterion failed at 0.47 with a
fitted ~160 s/run serial term (round-4 judge measurement). T = s + w/n
over two points cannot say WHERE the serial time lives; this script
times each pipeline phase separately in the same pinned fresh-process
harness run_scaling_rep uses, so the non-scaling phase is identifiable
and fixable.

Usage (one pinned rep, prints one JSON line):
    python scripts/profile_scaling.py <ncores> [n_docs] [words]
Run it once per level from a clean shell; compare per-phase times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    words = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    os.sched_setaffinity(0, set(range(n)))
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

    from pyspark.sql import functions as F

    import bench
    from fuzzy_matcher_spark.config import DedupConfig
    from fuzzy_matcher_spark.operators import dedup_minhash as dm
    from fuzzy_matcher_spark.operators.connected_components import (
        connected_components,
    )
    from fuzzy_matcher_spark.operators.dedup_minhash import (
        candidate_pairs,
        minhash_dedup,
        verify_pairs,
    )
    from fuzzy_matcher_spark.operators.dedup_exact import star_pairs_from_keys
    from fuzzy_matcher_spark.session import get_spark
    from fuzzy_matcher_spark.sources.synth import synthetic_docs

    corpus = os.environ.get(
        "SPARK_GRAFT_SCALE_CORPUS",
        f"/tmp/spark_graft_scale_corpus_{n_docs}x{words}.parquet",
    )
    cfg = DedupConfig(shingle_mode="word", shingle_size=4, jaccard_threshold=0.8)
    if not os.path.exists(corpus):
        spark = get_spark(master="local[16]")
        synthetic_docs(spark, n_docs, words).repartition(96).write.mode(
            "overwrite"
        ).parquet(corpus)
        spark.stop()
        time.sleep(10)

    spark = get_spark(master=f"local[{n}]", shuffle_partitions=3 * n)
    sc = spark.sparkContext
    docs = spark.read.parquet(corpus)
    out: dict = {"n": n, "n_docs": n_docs, "words": words}

    # warm pass: full plan shape on 5% (codegen + python workers + Arrow)
    minhash_dedup(docs.where(F.col("doc_id") % 20 == 0), cfg).count()

    probe = bench.host_speed_probe()
    out["calib_before"] = probe["calib_sec"]
    out["fault_before"] = probe["fault_sec"]

    phases: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        r = fn()
        phases[name] = round(time.perf_counter() - t0, 3)
        return r

    def njobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None))

    jobs0 = njobs()

    # ---- phase breakdown (mirrors minhash_dedup's stage graph) ----
    timed("scan_count", lambda: docs.count())

    full = dm._signatures_with_exact_key(docs, cfg, "text", "doc_id").persist()
    timed("signatures", lambda: full.count())
    j_sig = njobs()
    sig_df = full.where(F.col("n_units") > 0)

    pairs = candidate_pairs(sig_df, cfg, "doc_id")
    # verify_pairs persists+counts pairs internally; time it as one
    # phase, then the scoring separately via a persisted intermediary
    verified = verify_pairs(
        pairs,
        sig_df,
        cfg,
        "doc_id",
        exact=True,
        shingle_builder=lambda cand_ids: dm._shingle_sets(
            docs.join(cand_ids, "doc_id", "left_semi"),
            cfg,
            "text",
            "doc_id",
            parallelize=False,
        ),
    ).persist()
    timed("pairs_and_verify", lambda: verified.count())
    j_ver = njobs()

    edge_df = verified.select("a", "b").union(
        star_pairs_from_keys(full.select("doc_id", "_ek"), "doc_id")
    ).distinct()
    comp = timed(
        "cc", lambda: connected_components(edge_df, max_iter=cfg.cc_max_iter)
    )
    j_cc_build = njobs()
    all_ids = full.select(F.col("doc_id"))
    res = all_ids.join(comp, all_ids["doc_id"] == comp["id"], "left").select(
        F.col("doc_id"),
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    timed("final_join_count", lambda: res.count())
    j_end = njobs()

    out["phases"] = phases
    out["phase_sum"] = round(sum(phases.values()), 3)
    out["jobs"] = {
        "warm+scan": j_sig - jobs0,
        "verify": j_ver - j_sig,
        "cc_build": j_cc_build - j_ver,
        "final": j_end - j_cc_build,
        "total": j_end,
    }

    # ---- end-to-end reference number (fresh, same session) ----
    full.unpersist()
    verified.unpersist()
    t0 = time.perf_counter()
    minhash_dedup(docs, cfg).count()
    out["end_to_end"] = round(time.perf_counter() - t0, 3)
    probe = bench.host_speed_probe()
    out["calib_after"] = probe["calib_sec"]
    out["fault_after"] = probe["fault_sec"]
    spark.stop()
    print("PROFILE " + json.dumps(out))


if __name__ == "__main__":
    main()
