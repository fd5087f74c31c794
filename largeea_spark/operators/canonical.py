"""Connected-components canonicalization (north rule; SURVEY.md §7.0
`canonical.py`).

Assigns one canonical id per connected component of an undirected
edge set — the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), which converges in O(log² n) rounds and is the standard
shuffle-bounded CC at web scale:

  large-star: for each node u, link every STRICTLY LARGER neighbor v
              to min(N(u) ∪ {u});
  small-star: for each node u, link every neighbor v ≤ u (and u) to
              the minimum of those.

Each round is groupBy(min) + explode — two shuffles; iteration stops
when the edge multiset is stable (checked via a cheap aggregate hash).
Lineage truncation: ``localCheckpoint`` every round (SURVEY.md §4.3.2).

Output: DataFrame(node long, component long) where component is the
minimum node id in the component — deterministic across parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirect + drop self-loops + distinct, as (a, b) with a < b."""
    e = edges.select(F.col(edges.columns[0]).alias("u"), F.col(edges.columns[1]).alias("v"))
    return (
        e.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    # neighbors both directions; for each u: m = min(N(u) ∪ {u});
    # emit (v, m) for v in N(u) with v > u. Since m ≤ u < v, the output
    # edge (m, v) is already in canonical a<b order.
    #
    # Shuffle shape (round 6, guide §2.4): one repartition on u feeds
    # BOTH the groupBy and the join (HashPartitioning(u) satisfies
    # each), so the round pays one exchange here instead of two; the
    # dedup repartitions on b so the downstream small-star groupBy/join
    # on u=b reuse that exchange too. Column-only repartition (no pinned
    # count) so AQE coalesces the tiny late-round stages — CC results
    # are exact min-ids, independent of partitioning.
    nbrs = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).repartition(F.col("u"))
    m = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("m").alias("a"), F.col("v").alias("b"))
        .where(F.col("a") != F.col("b"))
        .repartition(F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient edges to point from larger to smaller: (u, v) with v <= u;
    # for each u: m = min neighbors∪{u}; emit (v, m) for all small nbrs + (u, m).
    # When e arrives hash-partitioned on b (the large-star output), the
    # groupBy and join below reuse that partitioning — the only new
    # exchange in this half-round is the final distinct.
    oriented = e.select(F.col("b").alias("u"), F.col("a").alias("v"))  # a<b ⇒ v<u
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    pairs = (
        oriented.join(m, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .unionAll(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    return pairs


def connected_components(
    edges: DataFrame, max_iter: int = 50, checkpoint_every: int = 1,
) -> DataFrame:
    """Returns DataFrame(node, component). Deterministic min-id labels."""
    e = _canonical_edges(edges).localCheckpoint(eager=False)
    prev_sig = None
    for it in range(max_iter):
        e = _small_star(_large_star(e))
        if checkpoint_every and it % checkpoint_every == 0:
            # lazy checkpoint: the signature action below materializes
            # it, so each round runs ONE job (the eager form ran a
            # checkpoint job AND a signature job per round)
            e = e.localCheckpoint(eager=False)
        sig_row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        sig = (sig_row.n, sig_row.h)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged: every edge is canonical (root, node) with root = a < b.
    members = e.select(F.col("b").alias("node"), F.col("a").alias("component"))
    roots = e.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    out = members.unionByName(roots)
    # a node may briefly carry >1 label candidate; keep the min
    return out.groupBy("node").agg(F.min("component").alias("component"))


def canonical_ids(edges: DataFrame, all_nodes: DataFrame | None = None,
                  node_col: str = "node") -> DataFrame:
    """Canonical id per node: CC label for connected nodes; own id for
    isolated ones (when ``all_nodes`` given). The entity-canonicalization
    step before graph materialization (north rule)."""
    cc = connected_components(edges)
    if all_nodes is None:
        return cc
    nodes = all_nodes.select(F.col(node_col).alias("node")).distinct()
    return (
        nodes.join(cc, "node", "left")
        .withColumn("component", F.coalesce("component", F.col("node")))
    )
