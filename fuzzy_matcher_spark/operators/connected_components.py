"""Connected components over a pair/edge DataFrame.

Alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — the standard
O(log n)-round, shuffle-friendly formulation:

- large-star: for every node u with undirected neighborhood N(u),
  m = min(N(u) + {u}); emit (v, m) for v in N(u), v > u.
- small-star: orient edges toward the smaller endpoint; for every u,
  m = min(N(u)); emit (v, m) for v in N(u) + {u}, v != m.

Each round is two groupBy-min aggregations + joins (map-side partial
aggregation applies). Mega-clusters (boilerplate web pages) show up as
high-degree roots; both stars only ever materialize (node, min) pairs
— degree skew lands in the groupBy, which Spark handles with partial
aggregation, and AQE skew-join handles the join back. Lineage is
truncated every iteration with localCheckpoint, otherwise the
driver-side loop builds an unoptimizable plan tower.

Convergence: the algorithm's fixed point is a disjoint union of
canonical depth-1 stars (roots = component minima), so the loop stops
as soon as the edge set IS star-shaped — one cheap aggregation per
round (each child has one parent, no child is a root), detecting the
fixed point a full star round earlier than a between-rounds
signature compare would.

The reference has no clustering (its queries return top-5 matches per
probe); this is the north-rule generalization that turns verified
near-dup pairs into cluster assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u > v) pairs, no self-loops, distinct."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _is_stars(edges: DataFrame) -> bool:
    """True iff the canonical (u > v) edge set is a disjoint union of
    depth-1 stars — i.e. every child u has exactly one parent and no
    node is both child and root. Under canonicalization every root is
    smaller than all its children, so a depth-1 forest's roots ARE the
    component minima: star-shape == the algorithm's fixed point. This
    detects convergence ONE star round early (the signature-compare
    needed a full extra large+small-star round — ~6 shuffles — to
    reproduce the same edge set), for the price of one aggregation;
    on this repo's diameter-2 dup graphs that halves CC's rounds."""
    bad = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("n"), F.lit(1).alias("c")),
                    F.struct(F.col("v").alias("n"), F.lit(0).alias("c")),
                )
            ).alias("x")
        )
        .groupBy("x.n")
        .agg(F.sum("x.c").alias("as_child"), F.count(F.lit(1)).alias("tot"))
        .where(
            (F.col("as_child") > 1)
            | ((F.col("as_child") >= 1) & (F.col("tot") > F.col("as_child")))
        )
        .limit(1)
    )
    return len(bad.collect()) == 0


def _large_star(edges: DataFrame) -> DataFrame:
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = _canonical(edges)  # u > v
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    joined = oriented.join(mins, "u")
    to_nbrs = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    to_self = mins.select(F.col("u"), F.col("m").alias("v"))
    return to_nbrs.union(to_self)


def _driver_union_find(rows) -> list[tuple]:
    """Min-label union-find over collected (u, v) rows: smaller root
    absorbs larger, so every final root IS its component's minimum —
    identical output to the distributed star loop. Path compression
    keeps it near-linear; at the 1M-edge cap this is well under a
    second of driver time."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(n, find(n)) for n in parent] + [
        (n, n) for n in {find(n) for n in parent}
    ]


def connected_components(
    pairs: DataFrame,
    max_iter: int = 25,
    checkpoint: bool = True,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """pairs(a, b) -> components(id, component) for every node that
    appears in at least one pair. component = min node id of the CC.

    Nodes not present in ``pairs`` are singletons — callers union them
    in (their component is their own id).

    Small-graph fast path: the star loop costs ~5 Spark jobs per
    iteration (two stars + canonical distinct + the convergence agg,
    each multiplied by AQE stages) — pure serial overhead when the
    edge set is tiny relative to the cluster (the dominant CC regime
    even at 10^12 docs ISN'T tiny, but every sf0.1-style test/bench
    corpus and the per-batch incremental path are). One
    ``limit(cap+1)`` collect probes the size and, when the whole edge
    set fits, a driver union-find replaces the loop — one job instead
    of ~15 (measured 4.4s -> ~0.4s on the sf0.1 flagship). The collect
    is bounded by construction (cap+1 rows max), results are
    bit-identical (min-label semantics both paths, equality-tested),
    and ``driver_max_edges=0`` forces the distributed loop — which
    remains the 100 TB path, sized by edge volume, not node count.
    """
    cols = pairs.columns
    edges = _canonical(
        pairs.select(F.col(cols[0]).alias("u"), F.col(cols[1]).alias("v"))
    )
    # lazy checkpoints: the loop's one action per iteration (and the
    # size probe below, when enabled) materializes the checkpoint as a
    # side effect — eager=True would schedule a SECOND job just to
    # materialize, and CC's per-iteration cost is job/barrier
    # overhead, not data (the serial term the scaling rig measures).
    # Checkpointing BEFORE the probe means an overflowing probe's
    # partial distinct work is cached for the loop instead of redone.
    if checkpoint:
        edges = edges.localCheckpoint(eager=False)
    if driver_max_edges:
        head = edges.limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            comp = _driver_union_find(head)
            schema = T.StructType(
                [
                    T.StructField("id", edges.schema["u"].dataType),
                    T.StructField("component", edges.schema["v"].dataType),
                ]
            )
            # slice count follows the assignment size, not the core
            # count: the default parallelize() width schedules
            # cores-many near-empty tasks for what is usually a few
            # hundred rows (~64k rows/slice keeps even the 2M-row
            # worst case at the edge cap to ~32 slices)
            n_slices = max(1, min(32, len(comp) // 65536 + 1))
            out = pairs.sparkSession.createDataFrame(
                pairs.sparkSession.sparkContext.parallelize(comp, n_slices),
                schema,
            )
            # the assignment is known-small here (bounded by 2x the
            # edge cap); the hint lets every downstream join (roster
            # left-join, canonical election) skip its shuffle —
            # parallelize()d relations otherwise report unknown stats
            # and plan sort-merge
            if len(comp) <= 500_000:
                out = out.hint("broadcast")
            return out
    for _ in range(max_iter):
        edges = _canonical(_small_star(_large_star(edges)))
        if checkpoint:
            edges = edges.localCheckpoint(eager=False)
        # the star-test is the loop's one action per iteration: it
        # materializes the lazy checkpoint AND detects the fixed point
        # one round earlier than the old signature-compare (which only
        # fired after an extra star round reproduced the same edges)
        if _is_stars(edges):
            break

    # fixed point: edges form stars (u=child > v=root)
    children = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("component")).distinct().select(
        F.col("component").alias("id"), "component"
    )
    return children.union(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def incremental_components(
    prev: DataFrame,
    new_pairs: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """Incremental cluster maintenance (SURVEY.md §3.3): fold a batch
    of newly verified pairs into an existing (id, component) assignment
    by re-running CC RESTRICTED to touched components — the incremental
    path for streaming ingest (new near-dup pairs per micro-batch) and
    for the delete path's cluster repair.

    Correctness: a component's membership can only change if one of its
    nodes appears in a new pair. The affected subgraph = every member
    of every component containing a touched node, represented exactly
    by its star edges (id -> component), plus the new pairs; CC over
    that union reproduces precisely what a full re-run would assign to
    those nodes (star edges preserve membership; min-relabel is
    recomputed). Untouched components keep their rows verbatim, so the
    result equals connected_components(all pairs ever seen) — asserted
    end-to-end by tests/test_connected_components.py.

    Cost at scale: shuffles are sized by the AFFECTED subgraph, not the
    full cluster table — at 10^12 docs with a trickle of new pairs the
    untouched-component anti-join is the only full-table pass (and on
    Iceberg it becomes a partition-pruned MERGE).
    """
    cols = new_pairs.columns
    edges = new_pairs.select(
        F.col(cols[0]).alias("a"), F.col(cols[1]).alias("b")
    )
    touched = (
        edges.select(F.explode(F.array("a", "b")).alias("id")).distinct()
    )
    affected_comps = (
        prev.join(touched, "id").select("component").distinct()
    )
    affected = prev.join(affected_comps, "component").select("id", "component")
    prior_star = affected.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("a"), F.col("component").alias("b")
    )
    # Constraint-lineage barrier: the batch edges and the prior-star
    # edges both descend from checkpointed/persisted relations whose
    # LogicalRDDs carry origin constraints, and Catalyst's
    # Union.rewriteConstraints resolves child constraints against the
    # head child's AttributeMap — a combination that throws
    # NoSuchElementException ("key not found: u#...") once the
    # star-iteration's self-unions re-derive constraints over this
    # union. Checkpointing the unioned edge set (affected-subgraph-
    # sized) replaces the whole subtree with a constraint-free
    # LogicalRDD before CC's unions are built above it.
    all_edges = edges.union(prior_star).localCheckpoint(eager=False)
    sub = connected_components(all_edges, max_iter=max_iter)
    # universe of nodes needing (re)assignment: members of affected
    # components + nodes first seen in this batch
    universe = affected.select("id").union(touched).distinct()
    reassigned = universe.join(sub, "id", "left").select(
        F.col("id"),
        F.coalesce(F.col("component"), F.col("id")).alias("component"),
    )
    untouched = prev.join(affected_comps, "component", "left_anti").select(
        "id", "component"
    )
    return untouched.unionByName(reassigned)
