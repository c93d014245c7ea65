"""Connected components for duplicate-cluster resolution.

Near-dup detection (minhash/simhash/embedding LSH) emits PAIRS, but
dedup policy acts on CLUSTERS: transitively-linked docs collapse to one
representative.  The pair->cluster step is connected components on the
similarity graph.

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SOCC'14) -- each
round rewires every node's neighbors to its neighborhood minimum, which
converges in O(log n) rounds even on adversarial long-chain graphs
(plain min-label propagation needs O(diameter) rounds; near-dup chains
can be long, so the star algorithm is the 100 TB-safe choice).

Each round is two shuffles (neighborhood-min aggregate + co-partitioned
join) and an eager localCheckpoint to truncate lineage -- without it the
plan doubles per round and round 20 replays round 1.  Convergence is
detected by an order-independent edge-set signature (count + sums of
endpoint hashes), one cheap aggregate per round rather than a full
set-difference job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("u"), F.col("v"))
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(nbrs: DataFrame) -> DataFrame:
    """Large-star over the SYMMETRIC neighbor list: rewire every
    strictly-larger neighbor of u to m(u) = min(N(u) + {u})."""
    mins = nbrs.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        nbrs.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient each edge (larger -> smaller), group on the
    larger endpoint, rewire all smaller neighbors AND the node itself to
    the minimum (the (u, m) self-link is what keeps u attached to its
    component between rounds)."""
    oriented = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_links = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        rewired.union(self_links)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _signature(nbrs: DataFrame) -> tuple:
    row = nbrs.agg(
        F.count(F.lit(1)),
        # decimal(38) accumulator: a BIGINT sum of int64 hashes overflows.
        # Per-column sums go through xxhash64 too (not a numeric cast) so
        # the signature works for ANY node id type, incl. wide strings
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        F.sum(F.xxhash64("u").cast("decimal(38,0)")),
        F.sum(F.xxhash64("v").cast("decimal(38,0)")),
    ).collect()[0]
    return tuple(row)


def _union_find_components(pairs) -> dict:
    """Driver-side union-find with union-by-min and path compression:
    the tree root of every component is its minimum node id, so labels
    match the distributed algorithm's exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in pairs:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_rounds: int = 50,
    local_edge_threshold: int | None = 2_000_000,
    local_byte_budget: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Cluster assignment for every node that appears in `edges`:
    returns (node, component) where component is the smallest node id in
    the connected component.  Isolated nodes never appear in `edges`, so
    callers union singletons back if the policy needs them.

    Deterministic: component ids are graph minima, independent of
    partitioning, round count, or which execution path ran.

    Scale-adaptive (the AQE-broadcast decision applied to graphs): the
    near-dup PAIR set is orders of magnitude smaller than the corpus
    that produced it, and an edge set below `local_edge_threshold` is
    union-found on the driver in one collect -- O(n alpha(n)) in C-speed
    Python -- instead of paying O(log n) contraction rounds of 2 shuffles
    + a checkpoint job each (measured: ~5 rounds of fixed job latency
    dominated curation_pipeline at small scale).  Bigger graphs take the
    star-contraction path unchanged; the threshold (default 2M edges) is
    the caller's knob, None disables the local path entirely.  The edge
    count alone is not a safe gate -- 2M edges of wide string node ids
    can be GBs -- so the same cheap aggregate also measures total cell
    bytes and the local path additionally requires them under
    `local_byte_budget` (default 128 MiB of raw id bytes, a few hundred
    MB of driver heap after tuple overhead).  The input pairs are pinned
    with one eager localCheckpoint so neither the gate aggregate nor the
    collect re-runs the (expensive) pair-producing lineage."""
    pair_df = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)

    def _fits_local() -> bool:
        if not local_edge_threshold:
            return False
        n, cell_bytes = pair_df.agg(
            F.count(F.lit(1)),
            F.sum(
                F.octet_length(F.col("u").cast("string"))
                + F.octet_length(F.col("v").cast("string"))
            ),
        ).first()
        return n <= local_edge_threshold and (cell_bytes or 0) <= local_byte_budget

    if _fits_local():
        comp = _union_find_components(
            (r[0], r[1]) for r in pair_df.collect()
        )
        from pyspark.sql.types import StructField, StructType

        node_t = pair_df.schema[0].dataType
        schema = StructType(
            [StructField("node", node_t), StructField("component", node_t)]
        )
        return pair_df.sparkSession.createDataFrame(
            list(comp.items()), schema
        )
    star = _symmetrize(pair_df).localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        star = _small_star(_large_star(_symmetrize(star))).localCheckpoint(
            eager=True
        )
        sig = _signature(star)
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: a star forest of (node, root) edges; nodes may carry
    # several edges mid-collapse, so take the min, and roots (appearing
    # only as targets) label themselves
    members = star.groupBy("u").agg(F.min("v").alias("component"))
    roots = (
        star.select(F.col("v").alias("u"))
        .distinct()
        .join(members, "u", "left_anti")
        .select("u", F.col("u").alias("component"))
    )
    return members.union(roots).select(
        F.col("u").alias("node"), "component"
    )


def component_sizes(members: DataFrame) -> DataFrame:
    """(component, size) for a (node, component) assignment -- one hash
    aggregate with map-side combine, so a giant component costs one
    long-tail reduce row, not a skewed task."""
    return members.groupBy("component").agg(F.count(F.lit(1)).alias("size"))


def flag_oversize_components(members: DataFrame, cap: int) -> DataFrame:
    """The giant-cluster policy guard: members annotated with their
    cluster size and an ``oversize`` flag (size > cap).

    Star contraction itself survives dense graphs -- a clique collapses
    in O(1) rounds and the hub-keyed min-aggregates are map-side
    combined -- so a pathological near-dup graph (everything similar to
    everything) is not a COMPUTE failure.  It is a POLICY failure:
    "keep one representative per cluster" is right for organic
    duplication, but a component whose size explodes past any plausible
    duplication factor almost always means a degenerate feature chained
    unrelated docs together (boilerplate shingle, empty text, template
    headers).  Collapsing it would silently delete a corpus slice, so
    the guard surfaces those clusters for DROP-or-review instead of
    letting them flow into the keep-one filter.

    Scale notes: sizes are a broadcastable aggregate of the (small)
    member set; the annotate join broadcasts it back -- no corpus-sized
    shuffle."""
    sizes = component_sizes(members).select(
        "component",
        F.col("size").alias("cluster_size"),
        (F.col("size") > F.lit(cap)).alias("oversize"),
    )
    return members.join(F.broadcast(sizes), "component").select(
        "node", "component", "cluster_size", "oversize"
    )
