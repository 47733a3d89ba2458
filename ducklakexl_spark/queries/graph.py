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
    WITH e0 AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                      's' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    sym AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS (SELECT a, count(*) AS d FROM sym GROUP BY a),
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
