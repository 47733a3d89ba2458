"""Graph-analytics queries (SURVEY.md §2.C "WITH RECURSIVE equivalent" /
§2.D extension surface): iterative algorithms the driver-loop operators in
``operators/graph.py`` implement — connected components is registered as
``dedup_clusters``; this module registers PageRank over the
customer–supplier bipartite graph derived from lineitem⋈orders.

The oracle unrolls the fixed 3-iteration power method as chained CTEs —
both engines quantize ranks to 10 dp per round, so double summation-order
differences cannot compound (see operators.graph.pagerank docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.operators.graph import pagerank
from ducklakexl_spark.queries import load, query

PR_ITER = 3
PR_DAMP = 0.85
PR_TOPN = 20


def _pr_oracle() -> str:
    iters = "".join(
        f""",
    r{k + 1} AS (
      SELECT deg.a AS node, deg.d,
             round((1 - {PR_DAMP}) / nn.n + {PR_DAMP} * x.s, 10) AS r
      FROM (SELECT s.b, sum(p.r / p.d) AS s
            FROM sym s JOIN r{k} p ON s.a = p.node GROUP BY s.b) x
      JOIN deg ON deg.a = x.b CROSS JOIN nn
    )"""
        for k in range(PR_ITER)
    )
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                      's' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS MATERIALIZED (SELECT a, count(*) AS d FROM sym GROUP BY a),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT deg.a AS node, deg.d, 1.0 / nn.n AS r
           FROM deg CROSS JOIN nn){iters}
    SELECT node, rnk, round(r, 6) AS rank
    FROM (SELECT node, r,
                 row_number() OVER (ORDER BY r DESC, node) AS rnk
          FROM r{PR_ITER}) t
    WHERE rnk <= {PR_TOPN}
    """


@query("graph_pagerank", oracle=_pr_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} PageRank nodes of the customer–supplier graph.

    Edge derivation is one distinct projection of the lineitem⋈orders
    join (both filters/columns pruned to the two keys at the scan);
    the power method itself is operators.graph.pagerank — per iteration
    one equi-join of the node-sized rank table against the edge list and
    one partial-aggregated groupBy, the shape that holds at 100 TB of
    edges."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iterations=PR_ITER, damping=PR_DAMP)
    w = W.orderBy(F.col("rank").desc(), "node")
    return (
        ranks.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PR_TOPN)
        .select("node", "rnk", F.round("rank", 6).alias("rank"))
    )


@query(
    "graph_triangles",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT 'n_nodes' AS metric,
           (SELECT count(DISTINCT u) FROM (SELECT u FROM e0
                                           UNION ALL SELECT v FROM e0) t)
             AS value
    UNION ALL
    SELECT 'n_edges', (SELECT count(*) FROM e0)
    UNION ALL
    SELECT 'n_triangles',
           (SELECT count(*)
            FROM e0 e1
            JOIN e0 e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN e0 e3 ON e3.u = e1.v AND e3.v = e2.v)
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts appearing in
    the same order are adjacent) — the clustering-coefficient /
    community-density primitive.

    Scale shape: the degree-ORIENTED algorithm (Cohen 2009; also the
    GraphX/Trino shape).  Each undirected edge is directed from its
    lower-(degree, id) endpoint to the higher one, so every out-degree is
    bounded by O(sqrt(m)) and wedge generation — the self-join on the
    shared source — produces sum-over-nodes C(out_deg, 2) candidates
    instead of C(deg, 2) around hubs; each wedge closes with one more
    equi-join against the oriented edge list.  All three joins are
    equi-joins on node keys (no BNLJ, no cartesian); the naive id-ordered
    triple join stays in the DuckDB oracle only, where it is exact by
    symmetry.  The three scalar aggregates UNION into (metric, value)
    rows — no scalar-combine join in the plan.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    # The edge list, degree table and oriented edge list are each
    # referenced by several downstream branches; without materialization
    # the whole upstream pipeline replays per reference (the pre-r9 plan
    # re-ran the lineitem self-join+distinct 7x: 18 parquet scans, 37
    # exchanges).  localCheckpoint(eager) is the same
    # materialize-the-iteration-input discipline the pagerank/CC/LPA
    # operators above already use: each stage executes exactly once.
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # one pass for both endpoint degrees (explode, not a union of two
    # edge-list rescans); node-sized, so the checkpoint is tiny
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    ed = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    lower_first = F.struct("du", "u") < F.struct("dv", "v")
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    ).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = (
        o1.join(o2, "src")
        .filter(
            F.struct(F.col("o1.ddeg"), F.col("o1.dst"))
            < F.struct(F.col("o2.ddeg"), F.col("o2.dst"))
        )
        .select(F.col("o1.dst").alias("wa"), F.col("o2.dst").alias("wb"))
    )
    closing = oriented.select(
        F.col("src").alias("wa"), F.col("dst").alias("wb")
    )
    tri = wedges.join(closing, ["wa", "wb"]).agg(
        F.count(F.lit(1)).alias("value")
    ).select(F.lit("n_triangles").alias("metric"), "value")
    # n_nodes and n_edges fall out of ONE scan of the degree table:
    # |V| = rows, |E| = sum(d)/2 (every edge contributes two endpoint
    # degrees) — the pre-r9 plan re-derived the edge pipeline for each
    counts = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.expr("sum(d) DIV 2").alias("n_edges"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("n_nodes").alias("metric"),
                        F.col("n_nodes").alias("value"),
                    ),
                    F.struct(
                        F.lit("n_edges").alias("metric"),
                        F.col("n_edges").alias("value"),
                    ),
                )
            ).alias("mv")
        )
        .select("mv.metric", "mv.value")
    )
    return counts.unionAll(tri)


LPA_ITER = 2
LPA_TOPN = 20


def _lpa_oracle() -> str:
    iters = "".join(
        f""",
    v{k + 1} AS (
      SELECT s.b AS node, p.label, count(*) AS c
      FROM sym s JOIN l{k} p ON s.a = p.node
      GROUP BY 1, 2
    ),
    l{k + 1} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM v{k + 1}) t
      WHERE rn = 1
    )"""
        for k in range(LPA_ITER)
    )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                      's' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    l0 AS (SELECT a AS node, a AS label FROM (SELECT DISTINCT a FROM sym) t)
    {iters}
    SELECT label AS community, CAST(count(*) AS BIGINT) AS size
    FROM l{LPA_ITER}
    GROUP BY label ORDER BY size DESC, community LIMIT {LPA_TOPN}
    """


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    customer–supplier graph, top-{20} community sizes after 2 rounds.
    Third member of the iterative-graph family (CC = data-dependent
    fixpoint, PageRank = fixed-round numeric recurrence, LPA =
    fixed-round categorical argmax); the oracle unrolls the identical
    rounds as CTE chains with the same (count DESC, label) tiebreak, so
    the driver-loop operator is verified against a pure-SQL twin."""
    from ducklakexl_spark.operators.graph import label_propagation
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    labels = label_propagation(edges, iterations=LPA_ITER)
    comm = labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return comm.orderBy(F.col("size").desc(), "community").limit(LPA_TOPN)
