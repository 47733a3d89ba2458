"""Relational operator coverage: scans, joins (all how-types + theta),
aggregation (having/distinct/filter/rollup/cube/grouping sets/min_by),
set ops, subqueries, CTEs, sort/limit/offset, pivot/unpivot, percentiles.

Maps SURVEY.md §2.C rows "projection/filter", "joins", "aggregation",
"sort/limit", "set ops", "subqueries/CTEs", "sampling/approx" onto the
Spark DataFrame API (reference dispatch point: ducklakexl.py:394 — the
reference delegates all of these to DuckDB; we express them declaratively
so Catalyst plans them).

Conventions for oracle parity (driver hashes values order-insensitively):
- every computed column aliased identically on both sides;
- double aggregates rounded identically on both sides;
- sums of integer columns cast to BIGINT in the oracle (DuckDB widens to
  HUGEINT, Spark to LONG);
- queries with LIMIT carry a total ORDER BY so the row *set* is
  deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ducklakexl_spark.queries import (
    broadcast_if_small,
    load,
    query,
    shuffle_hash_if_large,
)

# ---------------------------------------------------------------------------
# Flagship / TPC-H-style analytical queries
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                AS DOUBLE)                                                  AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE)                                                  AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
                AS DOUBLE)                                                  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 4)                                             AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                 / count(*), 6)                                             AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DECIMAL sufficient stats (sf10 scale discipline): prices are on
    # the cent grid and discount/tax on a 0.01 grid, so the decimal
    # casts are rounding-unambiguous in every engine, products/sums are
    # EXACT integers underneath, and the result is identical at any
    # scale and any reduce order.  Quantities are integer-valued
    # doubles (< 2^53), already order-exact.  Averages divide the exact
    # decimal sum as double so both engines do the same IEEE division.
    # OUTPUT CONTRACT (round-8, VERDICT-r7 task 1): the decimal math
    # stays INTERNAL; the final rounded aggregates are cast to DOUBLE on
    # both sides.  Spark's round(sum(decimal)) is DECIMAL(29,2) while
    # DuckDB's is DECIMAL(38,2), and downstream representations of the
    # same value drift (Decimal('x.30') vs 'x.3') — the r6-green DOUBLE
    # contract is representation-stable and the exact-cents sum casts to
    # one deterministic double.
    li = load(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    disc_price = ep * (F.lit(1) - disc)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(ep), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (F.lit(1) + tax)), 2).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(ep).cast("double") / n, 4).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / n, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE)                                    AS revenue,
           CAST(o_orderdate AS DATE)                          AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-01-01'
      AND l_shipdate  > DATE '1996-01-01'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("date")
    )
    # customer is the small side — broadcast it into the orders join.
    # Once the FILTERED build side (orders × ~0.18: BUILDING is one of
    # five uniform segments ≈ 0.20, date < 1998 keeps ≈ 0.92) outgrows
    # broadcastability, the orders⋈lineitem join is hinted
    # SHUFFLE_HASH: the filtered orders build stays an order of
    # magnitude below the lineitem probe, and skipping SMJ's per-pass
    # sort of the corpus-sized probe measured 25.5 → 14.2 s warm at
    # sf100 (identical top-10).  While the filtered build is still
    # broadcastable (every SF ≤ 10 on the fixture family), the hint is
    # withheld and AQE broadcasts it — the probe is then not shuffled
    # at all, strictly better than any shuffled join (ADVICE r9: the
    # old gate keyed on the unfiltered base and killed that plan at
    # mid scales).
    ordc = shuffle_hash_if_large(
        orders.join(
            broadcast_if_small(cust, sf_dir, "customer"),
            orders.o_custkey == cust.c_custkey,
        ),
        sf_dir,
        "orders",
        build_frac=0.18,
    )
    return (
        ordc.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ), 2
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q05_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1995-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            broadcast_if_small(supp, sf_dir, "supplier"),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ), 2
            ).cast("double").alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ), 2
            ).cast("double").alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Join how-types (SURVEY §2.C "joins")
# ---------------------------------------------------------------------------


@query(
    "join_inner_agg",
    oracle="""
    SELECT o_orderstatus,
           count(*)                      AS n_lines,
           round(sum(l_quantity), 2)     AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .join(load(spark, sf_dir, "lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@query(
    "join_left_missing",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_f_orders
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
           ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    f_orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_f_orders"))
    )


@query(
    "join_right_agg",
    oracle="""
    SELECT n_name, count(c_custkey) AS n_customers
    FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
    RIGHT JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    nat = load(spark, sf_dir, "nation")
    return (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(hi.k, lo.k)  AS bucket,
           coalesce(hi.n_hi, 0)  AS n_hi,
           coalesce(lo.n_lo, 0)  AS n_lo
    FROM (SELECT c_nationkey AS k, count(*) AS n_hi FROM customer
          WHERE c_acctbal > 5000 GROUP BY 1) hi
    FULL OUTER JOIN
         (SELECT c_nationkey AS k, count(*) AS n_lo FROM customer
          WHERE c_acctbal < -500 GROUP BY 1) lo
    ON hi.k = lo.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    hi = (
        cust.filter(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_hi"))
    )
    lo = (
        cust.filter(F.col("c_acctbal") < -500)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_lo"))
    )
    return hi.join(lo, hi.k == lo.k, "full").select(
        F.coalesce(hi.k, lo.k).alias("bucket"),
        F.coalesce(F.col("n_hi"), F.lit(0)).alias("n_hi"),
        F.coalesce(F.col("n_lo"), F.lit(0)).alias("n_lo"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT count(*) AS n_customers_with_big_order
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_customers_with_big_order"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers_no_order
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_no_order"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "region")
        .crossJoin(load(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


@query(
    "join_theta_inequality",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "nation").alias("a")
    b = load(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


# ---------------------------------------------------------------------------
# Aggregation variants (SURVEY §2.C "aggregation")
# ---------------------------------------------------------------------------


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-cents sum (see q01): at sf100 each custkey group holds ~10k
    # orders and the double-sum reduce-order ulp started crossing
    # round()'s half-cent boundaries (sf100 sweep find); decimal sums
    # are reduce-order-exact, the final output casts to DOUBLE on both
    # sides (the r8 output contract)
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F')              AS n_finished,
           count(*) FILTER (WHERE o_orderstatus = 'O')              AS n_open,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o_totalprice > 50000), 2)
                AS DOUBLE)                                          AS big_spend
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DECIMAL sufficient stats: a double sum over 15M+ rows (~1e12) is
    # reduce-order-dependent past the 2nd decimal; summing exact cents
    # makes the result identical at every scale (sf10 sweep find)
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_totalprice") > 50000,
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            ),
            2,
        ).cast("double").alias("big_spend"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*)               AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "qty")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus)   AS g_status,
           grouping(o_orderpriority) AS g_prio,
           count(*)                  AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-cents sum — see agg_filter_clause (sf10 scale discipline)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           round(max(o_totalprice), 2)       AS max_price,
           round(min(o_totalprice), 2)       AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sort_array(collect_list(..)) gives the deterministic ordered
    # concatenation DuckDB expresses with ORDER BY inside string_agg.
    return (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
        )
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.C "set ops")
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT k, v FROM (
      SELECT c_nationkey AS k, count(*) AS v FROM customer GROUP BY 1
      UNION ALL
      SELECT s_nationkey AS k, count(*) AS v FROM supplier GROUP BY 1
    ) u
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("v"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return c.unionAll(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "set_union_by_name",
    oracle="""
    SELECT k, side FROM (
      SELECT 'cust' AS side, c_custkey AS k FROM customer WHERE c_custkey <= 50
      UNION ALL
      SELECT 'supp' AS side, s_suppkey AS k FROM supplier WHERE s_suppkey <= 50
    ) u
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(F.lit("cust").alias("side"), F.col("c_custkey").alias("k"))
    )
    # columns deliberately in the other order — unionByName matches by name
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 50)
        .select(F.col("s_suppkey").alias("k"), F.lit("supp").alias("side"))
    )
    return c.unionByName(s).select("k", "side")


# ---------------------------------------------------------------------------
# Subqueries & CTEs (SURVEY §2.C "subqueries/CTEs")
# ---------------------------------------------------------------------------


@query(
    "subquery_scalar",
    oracle="""
    SELECT count(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT count(*) AS n_above_avg
        FROM sq_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM sq_orders)
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT count(*) AS n_lines
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("sq_part")
    return spark.sql(
        """
        SELECT count(*) AS n_lines
        FROM sq_lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM sq_part WHERE p_size > 40)
        """
    )


@query(
    "subquery_exists_correlated",
    oracle="""
    SELECT s_nationkey, count(*) AS n_suppliers
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity > 49)
    GROUP BY s_nationkey
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "supplier").createOrReplaceTempView("sq_supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    return spark.sql(
        """
        SELECT s_nationkey, count(*) AS n_suppliers
        FROM sq_supplier
        WHERE EXISTS (SELECT 1 FROM sq_lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity > 49)
        GROUP BY s_nationkey
        """
    )


@query(
    "cte_top_nations",
    oracle="""
    WITH nation_rev AS (
      SELECT c_nationkey,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    )
    SELECT n_name, rev
    FROM nation_rev JOIN nation ON c_nationkey = n_nationkey
    WHERE rev > (SELECT avg(rev) FROM nation_rev)
    """,
)
def cte_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r9 (guide §2.4): Spark inlines WITH-CTEs per reference, so the
    # scalar-avg subquery replayed the whole orders⋈customer aggregation
    # (2 orders + 2 customer scans).  The cut is now an avg() OVER ()
    # window on the nation-sized (25-row) CTE output — one derivation,
    # one scan per table, same CTE + scalar-threshold topology and
    # bit-identical values (same 25 rev doubles into the same avg).
    load(spark, sf_dir, "orders").createOrReplaceTempView("cte_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("cte_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("cte_nation")
    return spark.sql(
        """
        WITH nation_rev AS (
          SELECT c_nationkey,
                 CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS rev
          FROM cte_orders JOIN cte_customer ON o_custkey = c_custkey
          GROUP BY c_nationkey
        ),
        cut AS (
          SELECT c_nationkey, rev, avg(rev) OVER () AS avg_rev
          FROM nation_rev
        )
        SELECT n_name, rev
        FROM cut JOIN cte_nation ON c_nationkey = n_nationkey
        WHERE rev > avg_rev
        """
    )


# ---------------------------------------------------------------------------
# Sort / limit / distinct / pivot / percentiles / sampling
# ---------------------------------------------------------------------------


@query(
    "orderby_limit_offset",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 25 OFFSET 10
    """,
)
def orderby_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .offset(10)
        .limit(25)
        .select("p_partkey", "p_name", "p_retailprice")
    )


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_O,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
        )
    )


@query(
    "unpivot_metrics",
    oracle="""
    SELECT o_orderstatus, metric, round(val, 2) AS val FROM (
      SELECT o_orderstatus, 'total' AS metric,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS val
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderstatus, 'maximum' AS metric, max(o_totalprice) AS val
      FROM orders GROUP BY o_orderstatus
    ) u
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
            F.max("o_totalprice").alias("maximum"),
        )
    )
    return agg.unpivot(
        ["o_orderstatus"], ["total", "maximum"], "metric", "val_raw"
    ).select("o_orderstatus", "metric", F.round("val_raw", 2).alias("val"))


def quantile_cont_hist(
    df: DataFrame, group: str, value: str, qs: dict[str, float]
) -> DataFrame:
    """EXACT ``quantile_cont`` from the compressed value distribution.

    One map-side-combined groupBy compresses N raw rows to the per-group
    distinct-value histogram; a window over those (far smaller) partitions
    assigns cumulative position ranges; each quantile is two positional
    lookups + linear interpolation — the textbook quantile_cont definition
    reproduced bit-for-bit.  Nothing buffers raw values: at 100 TB the
    shuffle moves |groups|x|distinct values| rows, not N.  (For a measure
    that is nearly unique per row the histogram degrades to ~N compressed
    rows and the right scale tool becomes approx_percentile — see
    approx_distinct_parts for the sketch-vs-exact pattern.)
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(group, value).agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        W.partitionBy(group).orderBy(value).rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy(group)
    hist = (
        counts.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        .withColumn("total", F.sum("cnt").over(wall))
    )
    aggs = []
    for alias, q in qs.items():
        h = (F.col("total") - 1) * F.lit(q)
        lo = F.floor(h)
        hi = F.least(lo + 1, F.col("total") - 1)
        frac = h - lo
        v_lo = F.max(
            F.when((F.col("prev") <= lo) & (lo < F.col("cum")), F.col(value))
        )
        v_hi = F.max(
            F.when((F.col("prev") <= hi) & (hi < F.col("cum")), F.col(value))
        )
        aggs.append(F.round(v_lo + F.first(frac) * (v_hi - v_lo), 4).alias(alias))
    return hist.groupBy(group).agg(*aggs)


@query(
    "percentile_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.50), 4) AS q50,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact quantiles via the compressed-histogram formulation
    (quantile_cont_hist) rather than F.percentile's per-group value
    buffer — the buffer variant materializes every raw value inside an
    ObjectHashAggregate, which is both the local bottleneck and the
    100 TB memory hazard.

    r9 optimization (guide §2.4 / §1.2): the two measures (l_quantity
    quartiles, l_extendedprice median) each ran their own
    quantile_cont_hist pipeline from a separate lineitem scan, joined
    at the end — 2 corpus scans, 4 exchanges.  Both measures now
    unpivot into one (group, measure, value) stream in a single scan;
    the histogram groupBy/windows key on (group, measure) and the
    final aggregation selects each quantile's rows by measure flag.
    The explode doubles pre-aggregation rows, but the map-side partial
    aggregate compresses them before the exchange, so shuffle bytes
    are unchanged — while the corpus is read ONCE.  1 scan / 3
    exchanges / no join; values bit-identical (same per-measure math
    over the same histograms), verified exact vs the unchanged oracle
    at sf0.001/0.01/0.1/sf1.  sf1 warm 0.078 -> 0.061 s."""
    li = load(spark, sf_dir, "lineitem")
    group = "l_returnflag"
    mv = F.explode(
        F.array(
            F.struct(F.lit("q").alias("m"), F.col("l_quantity").alias("v")),
            F.struct(F.lit("p").alias("m"), F.col("l_extendedprice").alias("v")),
        )
    ).alias("mv")
    li2 = li.select(group, mv).select(
        group, F.col("mv.m").alias("m"), F.col("mv.v").alias("v")
    )
    counts = li2.groupBy(group, "m", "v").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        W.partitionBy(group, "m")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy(group, "m")
    hist = (
        counts.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("prev", F.col("cum") - F.col("cnt"))
        .withColumn("total", F.sum("cnt").over(wall))
    )
    aggs = []
    for alias, mk, q in [
        ("q25", "q", 0.25),
        ("q50", "q", 0.50),
        ("q75", "q", 0.75),
        ("median_price", "p", 0.5),
    ]:
        h = (F.col("total") - 1) * F.lit(q)
        lo = F.floor(h)
        hi = F.least(lo + 1, F.col("total") - 1)
        frac = h - lo
        ism = F.col("m") == mk
        v_lo = F.max(
            F.when(ism & (F.col("prev") <= lo) & (lo < F.col("cum")), F.col("v"))
        )
        v_hi = F.max(
            F.when(ism & (F.col("prev") <= hi) & (hi < F.col("cum")), F.col("v"))
        )
        fr = F.max(F.when(ism, frac))
        aggs.append(F.round(v_lo + fr * (v_hi - v_lo), 4).alias(alias))
    return hist.groupBy(group).agg(*aggs)


@query(
    "sample_deterministic",
    oracle="""
    SELECT count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sampled_spend
    FROM orders
    WHERE o_orderkey % 10 = 3
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # df.sample() is engine-specific; the portable deterministic sample is a
    # key-modulo predicate, which also pushes down to the scan.
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").alias("sampled_spend"),
        )
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE                      AS sketch_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch AUDITED against the exact distinct count.
    The sketch value itself is engine-specific (not portable to an
    oracle), so the registered output is the exact count plus a bound
    check: the sketch (default rsd 0.05) must land within 10% of truth,
    or the row fails the oracle's literal TRUE.  At 100 TB the sketch
    side is the production path — fixed-size state, one narrow shuffle;
    the exact side here is the audit."""
    li = load(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    bound = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= 0.10 * F.col("exact_parts")
    )
    return both.select(
        "l_returnflag", "exact_parts", bound.alias("sketch_within_10pct")
    )


@query(
    "percentile_histogram",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.50), 4) AS q50,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantile_cont from the compressed value distribution — the
    scale path for low-cardinality measures (l_quantity has ~50 distinct
    values regardless of row count): this shuffles ~150 rows at ANY
    scale.  Shares quantile_cont_hist with percentile_quantiles."""
    li = load(spark, sf_dir, "lineitem")
    return quantile_cont_hist(
        li, "l_returnflag", "l_quantity", {"q25": 0.25, "q50": 0.50, "q75": 0.75}
    )


@query(
    "join_copartition_reuse",
    oracle="""
    WITH totals AS (
      SELECT user_id,
             CAST(round(sum(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)
               AS total_value
      FROM events GROUP BY user_id
    ),
    diversity AS (
      SELECT user_id, count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id
    )
    SELECT t.user_id, t.total_value, d.n_types
    FROM totals t JOIN diversity d ON t.user_id = d.user_id
    WHERE d.n_types >= 4
    """,
)
def join_copartition_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning reuse across stages — the 100 TB pattern of keying
    every stage on the SAME column so the join step is free: both
    aggregations shuffle on user_id (their own required distribution),
    and the join then adds ZERO exchanges because both inputs already
    arrive hash-partitioned on the join key (verified in the plan guard:
    no Exchange sits between the aggregates and the join).  At fixture
    scale AQE further converts the join to broadcast; at cluster scale
    the same plan runs as a shuffle-free SortMergeJoin."""
    e = load(spark, sf_dir, "events")
    # exact-cents sum (see agg_having): the hot user's 30%-of-events
    # group makes a raw double sum reduce-order-sensitive at sf100
    totals = e.groupBy("user_id").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 4)
        .cast("double")
        .alias("total_value")
    )
    diversity = e.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )
    return (
        totals.join(diversity, "user_id")
        .filter(F.col("n_types") >= 4)
        .select("user_id", "total_value", "n_types")
    )
