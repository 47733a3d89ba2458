"""Iterative graph operators — the driver-loop answer to SQL's
``WITH RECURSIVE`` (SURVEY §2.C "subqueries/CTEs": Spark SQL has no
recursive CTE; iteration lives in driver code over DataFrames).

The flagship use is dedup *clustering*: near-duplicate detection yields
pairs, but a training pipeline needs groups ("keep one doc per cluster"),
i.e. connected components of the pair graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    Returns (node, component) where component = min node id in the
    component.  Each round every node adopts the smallest label among
    itself and its neighbours; rounds repeat until a fixpoint (checked on
    the driver via a 1-row count — the standard Spark iteration shape,
    since convergence is data-dependent control flow Catalyst can't
    express).

    Scale: label diameter shrinks geometrically (min labels hop multiple
    edges per round through the two-sided propagation), so rounds ~
    O(log(diameter)); each round is one groupBy shuffle over the edge
    list.  Per-round ``localCheckpoint`` truncates the growing lineage —
    without it plan depth, not data, becomes the bottleneck.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        # materialize once: every iteration re-reads the edge list, and
        # without this the (possibly expensive) upstream that produced the
        # edges would re-execute per round
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        # candidate label for each node: min over its own and neighbours'
        neighbour = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbour)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    round_dp: int = 10,
) -> DataFrame:
    """PageRank by fixed-iteration power method over an undirected graph
    (edges are symmetrized; every node therefore has in- and out-degree).

    The other half of the iterative-graph surface next to
    ``connected_components``: convergence there is data-dependent (driver
    fixpoint check); here the iteration count is fixed, so the loop is a
    pure driver-side plan builder — no count() per round, one groupBy
    shuffle per iteration, keyed the same way every round so AQE reuses
    the exchange layout.  ``localCheckpoint`` per round truncates lineage
    exactly like the CC loop.

    Ranks are rounded to ``round_dp`` decimals at the END of each
    iteration: partial-sum order across partitions differs run to run
    (and engine to engine), and without the per-round quantization those
    1-ulp differences would compound through the damping recurrence.
    10 dp sits far above double noise (~1e-16 relative) and far below any
    meaningful rank difference.

    Scale: the edge list is the big side and is scanned once per
    iteration with a rank broadcast-or-shuffle hash join on the node key;
    the rank table itself is node-sized.  100 TB of edges works exactly
    like the 60k-row fixture — iterations × (one join + one aggregate).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    n_nodes = deg.count()
    base = (1.0 - damping) / n_nodes
    ranks = deg.select(
        F.col("a").alias("node"), "d", F.lit(1.0 / n_nodes).alias("r")
    )
    for _ in range(iterations):
        contrib = (
            sym.join(ranks, sym.a == ranks.node)
            .select(F.col("b").alias("node"), (F.col("r") / F.col("d")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            deg.join(contrib, deg.a == contrib.node)
            .select(
                "node",
                "d",
                F.round(F.lit(base) + F.lit(damping) * F.col("s"), round_dp)
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """Synchronous label propagation (community detection): each round
    every node adopts the most frequent label among its neighbours
    (count DESC, label ASC tiebreak — fully deterministic, so both
    engines converge identically).  Fixed iteration count, so like
    ``pagerank`` the loop is a pure driver-side plan builder — one
    edge join + one (node, label) aggregation + one node-partitioned
    argmax window per round, lineage truncated per round.

    Synchronous LPA can oscillate on bipartite structure; with a fixed
    round budget and deterministic ties that is a defined (and
    cross-engine identical) output — production runs would use the
    asynchronous variant or add self-votes.

    Scale: the edge list is scanned once per round; votes aggregate on
    (node, label) with map-side partials; the argmax window partitions
    by node — state bounded by the distinct labels per node, never the
    graph.
    """
    from pyspark.sql import Window as W

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = W.partitionBy("node").orderBy(F.col("c").desc(), F.col("label"))
    for _ in range(iterations):
        votes = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return labels
