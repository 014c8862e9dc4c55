#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Runs the headline dedup pipeline (the north-rule metric is docs/sec
end-to-end near-dup clustering) plus representative operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Scaling evidence (north rule: >= 0.8 efficiency from N to 4N):
  python bench.py --scaling    # runs flagship at local[8] and local[32]
and is recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def host_speed_probe() -> dict:
    """Host-condition stamp for every bench JSON. This sandbox is
    multi-tenant with external contention (r2: identical code measured
    1.3-3x apart across captures; 'quiet window' claims were not
    reproducible). Two context numbers make each capture
    self-describing: the 1/5/15-min load averages, and ``calib_sec`` —
    wall time of a fixed single-thread numpy kernel (~0.25s quiet).
    Comparisons across rounds should only trust captures whose
    calib_sec agree within ~20%."""
    import numpy as np

    a = np.random.RandomState(0).standard_normal((384, 384))
    t0 = time.perf_counter()
    for _ in range(60):
        a = np.tanh(a @ a.T / 384.0)
    calib = time.perf_counter() - t0
    # fresh-allocation fault probe: the matmul is cache-resident and
    # blind to this sandbox's lazy-VM page-fault stalls (see
    # warm_guest_memory); ~0.02s when memory is warm/healthy, seconds
    # when allocations hit the slow backing store
    d = np.empty(8_388_608, dtype=np.int64)  # 64 MiB
    t0 = time.perf_counter()
    d[::512] = 1
    fault = time.perf_counter() - t0
    del d
    l1, l5, l15 = os.getloadavg()
    return {
        "loadavg": [round(l1, 2), round(l5, 2), round(l15, 2)],
        "calib_sec": round(calib, 3),
        "fault_sec": round(fault, 3),
    }


def warm_guest_memory(gb: float | None = None) -> dict:
    """Touch-and-hold `gb` GiB once so benchmarks measure compute, not
    the sandbox's lazy VM memory.

    Measured on this host: the FIRST touch of each guest-physical page
    is served from a slow backing store at 0.01-1 GB/s (about 20-200us
    per 4 KiB fault — 100-1000x a normal anonymous fault), while
    already-materialized pages fault at normal speed and steady-state
    bandwidth is ~20 GB/s. Once touched, pages stay materialized even
    after the guest frees them, so ONE warm pass fixes every later
    JVM-heap growth, Arrow batch, and shuffle buffer — without it, the
    same Spark job varies 10x run-to-run (e.g. 82s vs 807s) as it
    faults fresh guest-physical memory mid-run. A single large held
    allocation guarantees distinct physical pages (touch-and-free
    loops may just recycle the already-warm free-list head)."""
    gb = gb if gb is not None else float(os.environ.get("SPARK_GRAFT_WARM_GB", "0"))
    if gb <= 0:
        # default OFF: freed guest pages get DISCARDED again (free-page
        # reporting), so a standalone warm pass only helps memory that
        # stays held. The durable fix is per-process: the pre-touched
        # fixed JVM heap (session.py SPARK_GRAFT_PRETOUCH) plus the
        # no-trim malloc env for python workers.
        return {"warmed_gb": 0}
    # fault service parallelizes (~0.05 GB/s per thread, scales to
    # ~25x with concurrent touchers) — warm with one process per GiB,
    # each HOLDING its slab until all are done so the slabs occupy
    # distinct physical pages
    from multiprocessing import Barrier, Process

    import numpy as np

    procs = max(1, int(gb))
    per = gb / procs
    barrier = Barrier(procs)

    def _touch() -> None:
        a = np.empty(int(per * (1 << 30) // 8), dtype=np.int64)
        a[::512] = 1
        barrier.wait(timeout=3600)

    t0 = time.perf_counter()
    ps = [Process(target=_touch) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    dt = time.perf_counter() - t0
    return {"warmed_gb": gb, "sec": round(dt, 1), "gb_per_sec": round(gb / dt, 2)}


def build_suite():
    """name -> callable(spark) returning a row count (forces the plan)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from fuzzy_matcher_spark.config import DedupConfig
    from fuzzy_matcher_spark.operators.dedup_minhash import minhash_dedup
    from fuzzy_matcher_spark.operators.dedup_simhash import simhash_dedup
    from fuzzy_matcher_spark.operators.dedup_exact import exact_clusters

    cfg = DedupConfig(shingle_mode="word", shingle_size=4, jaccard_threshold=0.8)

    def docs(spark):
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def near_dup_pairs_default(s):
        """Production-shaped pair generation: default est_margin keeps
        the JVM signature-agreement prefilter ON. The oracle query
        (near_dup_pairs) disables it (est_margin=1.0) so banding
        recall itself is what the DuckDB hash-match tests — both are
        timed so the prefilter's cost/benefit stays measured."""
        from fuzzy_matcher_spark.operators.dedup_minhash import (
            add_signatures,
            candidate_pairs,
            verify_pairs,
        )

        sig = add_signatures(docs(s), cfg).persist()
        return verify_pairs(
            candidate_pairs(sig, cfg), sig, cfg, exact=True
        ).count()

    return {
        "minhash_dedup_docs": lambda s: minhash_dedup(docs(s), cfg).count(),
        "simhash_dedup_docs": lambda s: simhash_dedup(docs(s), cfg).count(),
        "exact_dedup_docs": lambda s: exact_clusters(docs(s), "text", "doc_id").count(),
        "near_dup_pairs": lambda s: E.q_near_dup_pairs(s, SF_DIR).count(),
        "near_dup_pairs_default": near_dup_pairs_default,
        "tpch_q1": lambda s: E.q_tpch_q1(s, SF_DIR).count(),
        "topk_orders": lambda s: E.q_topk_orders_per_customer(s, SF_DIR).count(),
        "events_hourly": lambda s: E.q_events_hourly(s, SF_DIR).count(),
        "ann_topk": lambda s: E.q_ann_topk(s, SF_DIR).count(),
    }


def run_suite(master: str, shuffle: int | None = None):
    from pyspark.sql import functions as F

    from fuzzy_matcher_spark.session import get_spark

    spark = get_spark(app_name="bench", master=master, shuffle_partitions=shuffle)
    suite = build_suite()
    # warm up: spawn Python workers on every core + compile the Arrow/
    # pandas-UDF path and codegen, so timings measure the operators
    from fuzzy_matcher_spark.config import DedupConfig
    from fuzzy_matcher_spark.operators.dedup_minhash import (
        add_signatures,
        minhash_dedup,
    )

    cfg = DedupConfig(shingle_mode="word", shingle_size=4, jaccard_threshold=0.8)

    warm = spark.range(0, 2000).selectExpr(
        "id as doc_id", "repeat(concat('w', id % 97, ' '), 40) as text"
    )
    # element_at aggregate defeats column pruning so the UDF really runs
    add_signatures(warm, DedupConfig()).agg(
        F.sum(F.element_at("signature", 1).cast("decimal(38,0)"))
    ).collect()
    # one untimed full-flagship pass on the synthetic docs: JIT/codegen
    # of the whole dedup plan shape (signatures -> bands -> capped
    # pairs -> two-pass verify -> CC) ramps over several executions
    # (measured at sf0.1: rep1 ~8-10s, steady state ~4s with identical
    # plans); a long-running cluster job amortizes this entirely, so
    # the suite warms the shape once like run_scaling already does
    minhash_dedup(warm, cfg).count()
    suite["exact_dedup_docs"](spark)
    # best-of-3: the first execution of each distinct plan shape pays
    # one-time codegen/planning cost (~2x), and this sandbox shows
    # multi-tenant host jitter — min of three is the steady-state
    # number a long-running cluster job actually sees
    timings, rows = {}, {}
    for name, fn in suite.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rows[name] = fn(spark)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.stop()
    return timings, rows, n_docs


def run_scaling(n_docs: int | None = None, words: int = 150):
    """Same job, same materialized input, two parallelism levels
    (local[8] = N, local[32] = 4N). North-rule evidence: efficiency =
    throughput(4N) / (4 * throughput(N)) >= 0.8.

    The corpus must be large enough that compute dominates fixed
    overhead at the HIGHER parallelism (this host runs the flagship at
    several hundred docs/s/core, so 4N on a small corpus measures JIT
    warm-up and stage-scheduling floor, not scaling). Each session
    also runs one untimed warm pass of the full flagship plan shape —
    first execution pays one-time codegen that a long-running cluster
    job amortizes."""
    n_docs = n_docs or int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "750000"))
    # pre-touched fixed heap by default: scaling runs are exactly the
    # workload the lazy-VM fault path distorts (see warm_guest_memory)
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from pyspark.sql import functions as F

    from fuzzy_matcher_spark.config import DedupConfig
    from fuzzy_matcher_spark.operators.dedup_minhash import (
        add_signatures,
        minhash_dedup,
    )
    from fuzzy_matcher_spark.session import get_spark
    from fuzzy_matcher_spark.sources.synth import synthetic_docs

    corpus = os.environ.get(
        "SPARK_GRAFT_SCALE_CORPUS", "/tmp/spark_graft_scale_corpus.parquet"
    )
    cfg = DedupConfig(shingle_mode="word", shingle_size=4, jaccard_threshold=0.8)
    if not os.path.exists(corpus):  # reuse a pre-generated corpus
        spark = get_spark(master="local[32]")
        synthetic_docs(spark, n_docs, words).repartition(32).write.mode(
            "overwrite"
        ).parquet(corpus)
        spark.stop()

    levels = tuple(
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")
    )
    if len(levels) != 2:
        raise SystemExit("SPARK_GRAFT_SCALE_LEVELS must name exactly two levels")
    # ALTERNATE the levels across reps and take per-level min: this
    # multi-tenant host shows minutes-long external CPU bursts (r2/r3
    # captures of identical code 1.3-3x apart), and alternation makes
    # a burst hit both levels symmetrically instead of poisoning
    # whichever level it overlapped; per-rep calib stamps make every
    # rep self-describing
    # a rep is "quiet" when the single-thread calib probe agrees with
    # the unloaded baseline (~0.13-0.17s here) BOTH before and after
    # the timed run — external bursts last minutes, so a before-only
    # stamp misses bursts that arrive mid-run (observed: 81.8s vs
    # 807s for the identical rep, before-calib quiet in both)
    quiet_thresh = float(os.environ.get("SPARK_GRAFT_SCALE_CALIB_QUIET", "0.22"))
    max_rounds = int(os.environ.get("SPARK_GRAFT_SCALE_MAX_ROUNDS", "6"))
    want_quiet = int(os.environ.get("SPARK_GRAFT_SCALE_QUIET_REPS", "2"))
    # max seconds to WAIT for external bursts to pass before each rep
    # (this host shows minutes-long load-20+ bursts; measuring through
    # one wastes a whole rep)
    max_wait = int(os.environ.get("SPARK_GRAFT_SCALE_WAIT", "600"))
    out = {
        "levels": list(levels),
        "mem_warm": warm_guest_memory(),
        "host_before": host_speed_probe(),
    }
    rep_log: dict[int, list] = {n: [] for n in levels}
    n_corpus = 0

    def _quiet_reps(n: int) -> int:
        return sum(1 for r in rep_log[n] if r["quiet"])

    def _wait_quiet() -> None:
        deadline = time.time() + max_wait
        while time.time() < deadline:
            if host_speed_probe()["calib_sec"] < quiet_thresh:
                return
            time.sleep(20)

    # Pin the WHOLE process tree (driver JVM + python workers) to n
    # cores per level: python UDF workers run outside Spark's task-slot
    # accounting, so an unpinned local[8] silently consumes up to ~2x
    # its nominal cores on this 32-core host (measured: java capped at
    # 8 while python used 6 more), overstating N-level throughput and
    # understating N->4N efficiency. Affinity set before JVM launch is
    # inherited by the JVM and every forked worker — the honest
    # single-host analog of an N-core vs 4N-core cluster.
    all_cpus = set(range(os.cpu_count() or max(levels)))

    for _round in range(max_rounds):
        if all(_quiet_reps(n) >= want_quiet for n in levels):
            break
        for n in levels:
            if _quiet_reps(n) >= want_quiet:
                continue
            _wait_quiet()
            os.sched_setaffinity(0, set(range(n)))
            # 3x cores shuffle partitions (the cluster-submit setting,
            # session.py docstring): every stage runs ~3 balanced
            # waves at BOTH levels instead of one straggler-bound
            # wave at the higher one; AQE still coalesces tiny
            # shuffles
            spark = get_spark(master=f"local[{n}]", shuffle_partitions=3 * n)
            warm = spark.range(0, 2000).selectExpr(
                "id as doc_id", "repeat(concat('w', id % 97, ' '), 40) as text"
            )
            add_signatures(warm, DedupConfig()).agg(
                F.sum(F.element_at("signature", 1).cast("decimal(38,0)"))
            ).collect()
            docs = spark.read.parquet(corpus)
            # a reused pre-generated corpus may differ from the
            # requested n_docs — throughput uses the actual row count
            n_corpus = docs.count()
            # untimed warm pass on a slice: full plan shape, ~5% data
            minhash_dedup(docs.where(F.col("doc_id") % 20 == 0), cfg).count()
            c_before = host_speed_probe()["calib_sec"]
            t0 = time.perf_counter()
            minhash_dedup(docs, cfg).count()
            dt = time.perf_counter() - t0
            c_after = host_speed_probe()["calib_sec"]
            spark.stop()
            os.sched_setaffinity(0, all_cpus)
            rep_log[n].append(
                {
                    "sec": round(dt, 3),
                    "calib_before": c_before,
                    "calib_after": c_after,
                    "quiet": max(c_before, c_after) < quiet_thresh,
                }
            )
    out["n_docs"] = n_corpus
    out["reps"] = rep_log
    out["all_levels_have_quiet_reps"] = all(_quiet_reps(n) >= 1 for n in levels)
    for n in levels:
        pool = [r for r in rep_log[n] if r["quiet"]] or rep_log[n]
        best = min(r["sec"] for r in pool)
        out[f"local[{n}]"] = {
            "sec": best,
            "docs_per_sec": round(n_corpus / best, 2),
        }
    lo, hi = sorted(levels)  # run order is as given; eff always N->4N
    eff = (
        out[f"local[{hi}]"]["docs_per_sec"]
        / ((hi / lo) * out[f"local[{lo}]"]["docs_per_sec"])
    )
    out["scaling_efficiency_N_to_4N"] = round(eff, 4)
    out["host_after"] = host_speed_probe()
    print(json.dumps(out))


def run_kernel_scaling():
    """Pure-Python multi-process scaling of the MinHash kernel (no
    Spark, no JVM): per-core docs/s at 1, 8, and 32 worker processes.
    Complements --scaling: immune to multi-tenant host bursts and to
    Spark's per-job fixed costs, it isolates whether the compute
    kernel itself scales with cores (it should be embarrassingly
    parallel)."""
    import multiprocessing as mp

    import numpy as np

    from fuzzy_matcher_spark.functions.minhash import _MASK32, _P, _perm_coeffs

    def worker(q):
        rng = np.random.RandomState(7)
        docs = [rng.randint(0, 1 << 62, 150).astype(np.int64) for _ in range(2000)]
        a, b = _perm_coeffs(128, 42)
        a_col, b_col = a[:, None], b[:, None]
        t0 = time.time()
        for h in docs:
            x = h.astype(np.uint64) & _MASK32
            ((a_col * x[None, :] + b_col) % _P).min(axis=1)
        q.put(len(docs) / (time.time() - t0))

    out = {}
    for n in (1, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        rates = [q.get() for _ in ps]
        out[f"procs_{n}"] = {
            "docs_per_sec_per_core": round(sum(rates) / len(rates), 1),
            "docs_per_sec_total": round(sum(rates), 1),
        }
    out["kernel_scaling_efficiency_1_to_32"] = round(
        out["procs_32"]["docs_per_sec_total"]
        / (32 * out["procs_1"]["docs_per_sec_total"]),
        4,
    )
    print(json.dumps(out))


def run_micro():
    """Kernel micro-benchmarks mirroring the reference's Go harnesses
    (distance_calculator_test.go:716-736, example_members_test.go:
    458-497, ocr_multichar_test.go:242-292)."""
    from fuzzy_matcher_spark.functions.similarity import (
        jaro_winkler,
        levenshtein_sim,
        trie_edit_distance,
    )

    def rate(fn, *args, seconds=1.0):
        n, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            for _ in range(1000):
                fn(*args)
            n += 1000
        return round(n / (time.perf_counter() - t0))

    out = {
        "jw_john_jon_per_sec": rate(jaro_winkler, "john", "jon"),
        "lev_hello_hallo_per_sec": rate(levenshtein_sim, "hello", "hallo"),
        "trie_edits_ocr_on_per_sec": rate(
            trie_edit_distance, "srnithsrnithsrnith", "smithsmithsmith", True
        ),
        "trie_edits_ocr_off_per_sec": rate(
            trie_edit_distance, "srnithsrnithsrnith", "smithsmithsmith", False
        ),
    }

    # end-to-end probe workload: 20-member roster, repeated probes
    from fuzzy_matcher_spark.config import example_member_config
    from fuzzy_matcher_spark.operators.matcher import search
    from fuzzy_matcher_spark.session import get_spark
    from fuzzy_matcher_spark.sources.members import (
        members_df,
        probe_validity_col,
        probes_df,
    )

    spark = get_spark(app_name="bench-micro", master=f"local[{CPUS}]")
    cfg = example_member_config()
    base = members_df(spark, cfg)
    n_probes = 2000
    probes = probes_df(
        spark, [(i, "John", "Smith", "1990-05-15") for i in range(n_probes)]
    )
    search(base, probes, cfg, is_valid_col=probe_validity_col()).count()  # warm
    t0 = time.perf_counter()
    search(base, probes, cfg, is_valid_col=probe_validity_col()).count()
    wall = time.perf_counter() - t0
    out["member_search_probes_per_sec"] = round(n_probes / wall, 1)
    spark.stop()
    print(json.dumps(out))


def main():
    if "--warm-memory" in sys.argv:
        print(json.dumps(warm_guest_memory()))
        return
    if "--scaling" in sys.argv:
        run_scaling()
        return
    if "--micro" in sys.argv:
        run_micro()
        return
    if "--kernel-scaling" in sys.argv:
        run_kernel_scaling()
        return

    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    warm = warm_guest_memory()
    probe_before = host_speed_probe()
    # 3x cores shuffle partitions: same wave-balance reasoning as
    # run_scaling (one wave of cores-many tasks is straggler-bound)
    timings, _, n_docs = run_suite(f"local[{CPUS}]", shuffle=3 * int(CPUS))
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (flagship: minhash near-dup dedup)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "docs": n_docs,
                "docs_per_sec_minhash_dedup": round(
                    n_docs / timings["minhash_dedup_docs"], 2
                ),
                "mem_warm": warm,
                "host_before": probe_before,
                "host_after": host_speed_probe(),
            }
        )
    )


if __name__ == "__main__":
    main()
