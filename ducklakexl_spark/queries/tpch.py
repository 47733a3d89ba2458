"""TPC-H-pattern queries 6/7/9/14/15/18/19 adapted to the driver fixtures
(SURVEY §2.C rows "projection/filter", "joins", "aggregation",
"subqueries/CTEs" — all inherited through the reference's dispatch point
ducklakexl.py:394).

The fixture star schema trims some TPC-H columns (no partsupp table, no
l_shipmode/l_commitdate), so each query keeps its canonical *shape* —
the join topology, predicate structure, and aggregation pattern that make
it a meaningful plan-coverage case — with predicates over the columns
that exist (nations are NATION_n, p_type is a single word, etc.).

Scale notes are per-query; the common theme: dimension sides broadcast,
fact-side filters reach the parquet scan (PushedFilters), and every
aggregation partial-aggregates map-side before its single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import broadcast_if_small, load, query


@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-agg: every predicate pushes to the parquet reader,
    zero shuffles (single global agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ), 2
            ).cast("double").alias("revenue")
        )
    )


@query(
    "q07_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation,
                 n2.n_name AS cust_nation,
                 CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
                 CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
         ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-pair trade volume by year.  supplier/customer/nation are
    broadcast dims; lineitem↔orders is the only big join, and the
    nation-pair disjunction is applied after the cheap dim joins."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date")
        )
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(broadcast_if_small(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).cast("double").alias("revenue"))
    )


@query(
    "q09_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amount
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year for parts matching a name
    pattern.  part is filtered before its join (semi-join pruning of the
    fact side), dims broadcast."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(broadcast_if_small(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1996-04-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio: promo share of revenue.  part
    broadcasts; one global agg, no shuffle of lineitem."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (CTE + scalar subquery on max).
    Revenue is rounded to 2 dp *before* the max-equality so Spark and the
    oracle compare identical doubles.

    r9 (guide §2.4/§5): the scalar-max branch used to re-derive the
    whole revenue CTE (2 lineitem scans — each reference replayed the
    shipdate-filtered groupBy); the supplier-sized revenue frame is now
    materialized once (q11's localCheckpoint discipline) and both the
    1-row max and the equality filter read it."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))), 2)
        .cast("double")
        .alias("total_revenue")
    ).localCheckpoint(eager=True)
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(broadcast_if_small(supp, sf_dir, "supplier"), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE)  AS orderdate,
           round(o_totalprice, 2)     AS totalprice,
           round(sum(l_quantity), 2)  AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, orderdate, o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-quantity orders (IN + HAVING subquery).  o_orderkey is
    unique per order, so the query's outer GROUP BY collapses into the
    HAVING aggregate itself: aggregate lineitem ONCE (map-side partials
    absorb any hot orderkey), keep the few >250 orders, and broadcast
    that key set to orders — one lineitem scan, zero sort-merge joins,
    no per-row fact join at all.  (The previous semi-join shape
    re-scanned lineitem and SMJ'd twice across the skewed key — 5x
    slower on the sf1 hot-order corpus.)  At 100 TB the aggregated
    side stays orders-bounded; the broadcast hint is SIZE-GATED on the
    orders table (an explicit hint would otherwise override AQE
    demotion), so past the cap the hint drops and AQE plans the join
    from the reduced relation's runtime stats."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(broadcast_if_small(big, sf_dir, "orders"), orders.o_orderkey == big.l_orderkey)
        .join(broadcast_if_small(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sq", 2).alias("sum_qty"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive brand/size/quantity predicates over a broadcast part
    join — the canonical 'OR-of-ANDs' plan case (no pushdown of the
    cross-table disjunction, but part prunes to 3 brands before the
    join)."""
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    ).select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate <  DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (priority checking): quarter-filtered orders with a
    correlated EXISTS over the fact table.  The fixture has no
    l_commitdate/l_receiptdate, so "late" is l_shipdate > o_orderdate —
    the same semi-join topology.  Spark plans the EXISTS as a left-semi
    hash join with the orders-side filter pushed to its scan."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q08_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA'
            AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
            AND p_type = 'ECONOMY'
         ) all_nations
    GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): 8-table star join, conditional
    aggregation ratio.  Every dimension broadcasts; lineitem↔orders is
    the only shuffle join; the p_type filter prunes the part build side
    before broadcast."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date")
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(broadcast_if_small(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast_if_small(cust, sf_dir, "customer"), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region),
            F.col("n1_region") == F.col("r_regionkey"),
            "left_semi",
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    # exact-cents volume (see q01): decimal sums are reduce-order-exact;
    # the final ratio divides the two exact sums as doubles on both sides.
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).alias("volume")
    return (
        joined.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol,
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q13_customer_orders_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_orders_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count distribution): outer join then a
    double aggregation — the classic histogram-of-group-sizes plan.  The
    first groupBy keys on c_custkey (co-partitioned with the join), the
    second is over ~50 distinct counts."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (supplier count by part attributes).  The fixture has no
    partsupp table; the distinct (l_partkey, l_suppkey) projection of
    lineitem IS the observed part-supplier relation — same distinct-count
    aggregation over a filtered dimension join."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    return (
        ps.join(broadcast_if_small(part, sf_dir, "part"), ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (small-quantity-order revenue): correlated scalar
    subquery over the fact table, decorrelated per part.

    r9 (guide §2.4): a part belongs to exactly one brand, so the
    correlated average over ``l2.l_partkey = lineitem.l_partkey`` sees
    only Brand#3 parts' rows — i.e. the per-part cut can be an AVG
    window over the ALREADY brand-filtered fact rows.  The old shape
    aggregated the full unfiltered lineitem into a parts-sized cut table
    and shuffle-joined it back (2 lineitem scans); the window form scans
    lineitem once and keys its one exchange on the same l_partkey.
    Partition width = rows-per-part, bounded.  Quantities are integral
    so the avg is exact in any summation order (window vs groupBy agree
    bit-for-bit).

    exact-cents sum (see q01/q06): at sf100 the qualifying set is
    millions of rows and a DOUBLE sum diverges from DuckDB's reduce
    order past the cents digit (r8 sweep MISMATCH); the per-part avg
    cut stays DOUBLE."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    w = W.partitionBy("l_partkey")
    return (
        li.join(broadcast_if_small(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn("qty_cut", F.avg("l_quantity").over(w) * 0.2)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double") / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1','NATION_4','NATION_9','NATION_13','NATION_21')
      AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '2000-01-01')
    GROUP BY n_name
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (global sales opportunity): uncorrelated scalar average,
    anti-join against the fact table, grouped aggregate.  The fixture
    customer table has no phone column, so the country-code bucket
    becomes a nation-name set, and "idle" means no order since 2000
    (every fixture customer has SOME order) — the anti-join +
    scalar-subquery topology is unchanged.  The scalar average broadcasts as a literal-sized
    DataFrame; the anti-join shuffles on the customer key."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_1", "NATION_4", "NATION_9", "NATION_13", "NATION_21"
        )
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q02_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part, supplier, cost, nation, region
    WHERE p_partkey = cost.l_partkey AND s_suppkey = cost.l_suppkey
      AND p_size = 15
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND unit_cost = (
          SELECT min(c2.unit_cost)
          FROM cost c2, supplier s2, nation n2, region r2
          WHERE c2.l_partkey = p_partkey AND s2.s_suppkey = c2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier): correlated scalar-min subquery
    over a region-restricted supplier join.  The fixture has no partsupp
    table, so unit cost is each (part, supplier)'s best observed
    l_extendedprice / l_quantity — the join topology and the
    min-equality decorrelation are Q2's.  Spark plans it decorrelated:
    one narrow groupBy builds the cost table and the regional per-part
    floor is a min WINDOW over the (part, supplier)-grain cost rows —
    partition width is suppliers-per-part, bounded, never corpus-sized.
    nation/region/part broadcast; the only big shuffle is the one
    lineitem-grain groupBy, with map-side partial aggregation.

    r9 (guide §2.4): the floor was previously a groupBy + equality
    self-join on cost_eu, which replayed the whole cost pipeline per
    reference — 2 lineitem scans, 8 scans total.  The window form scans
    lineitem once and needs no join back; the l_partkey window exchange
    replaces the floor-side groupBy exchange one for one."""
    li = load(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eu = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    cost_eu = cost.join(
        broadcast_if_small(
            supp_eu.select("s_suppkey", "s_acctbal", "s_name", "n_name"),
            sf_dir,
            "supplier",
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    from pyspark.sql import Window as W

    floor_cost = F.min("unit_cost").over(W.partitionBy("l_partkey"))
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        cost_eu.withColumn("floor_cost", floor_cost)
        .filter(F.col("unit_cost") == F.col("floor_cost"))
        .join(broadcast_if_small(part, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
    )


@query(
    "q11_important_parts",
    oracle="""
    SELECT l_partkey AS ps_partkey,
           round(sum(l_extendedprice), 2) AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_nationkey < 13
    GROUP BY l_partkey
    HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 1500 > (
        SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_nationkey < 13)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): grouped value per part HAVING more
    than a fixed fraction of the uncorrelated global total.  No partsupp
    in the fixture, so value is lineitem revenue from the two nations'
    suppliers.  The threshold comparison runs in DECIMAL so the
    boundary is exact — double sums are order-dependent and Spark/DuckDB
    would disagree on rows sitting exactly at the cut.  Spark computes
    the fact join once, aggregates per part (partial agg map-side), and
    broadcasts the single-row total for the filter; at 100 TB the only
    full shuffle is the per-part groupBy."""
    nation = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            broadcast_if_small(
                load(spark, sf_dir, "supplier").join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ),
                sf_dir,
                "supplier",
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_partkey", "l_extendedprice")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("raw_value"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("dec_value"),
    )
    # r9 (guide §2.4): the global total re-aggregates the PER-PART
    # decimal sums instead of re-running the fact join — DECIMAL
    # addition is associative so the value is bit-identical.  per_part
    # is referenced twice (total + HAVING probe), so it is materialized
    # once (part-sized: ~20k rows/SF) — without this the whole
    # scan+join+groupBy pipeline replays per reference and the "shared"
    # exchange never reuses (verified: 0 ReusedExchange, 2 lineitem
    # scans in the unmaterialized plan).
    per_part = per_part.localCheckpoint(eager=True)
    total = per_part.agg(F.sum("dec_value").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("dec_value") * 1500 > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("raw_value", 2).alias("part_value"),
        )
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus AS shipmode,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping modes & priority): fact-fact join with a
    non-equi residual predicate and two CASE-conditional counts.  The
    fixture has no l_shipmode/commitdate/receiptdate, so the mode is
    l_linestatus and "late" is shipped after the order date.  The
    l_shipdate range pushes to the lineitem scan; the join is the one
    o_orderkey shuffle; both conditional counts fold into a single
    partial-aggregated groupBy."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q20_part_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l1.l_suppkey FROM lineitem l1
        WHERE l1.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
          AND l1.l_shipdate >= DATE '1996-01-01'
          AND l1.l_shipdate <  DATE '1997-01-01'
        GROUP BY l1.l_suppkey, l1.l_partkey
        HAVING sum(l1.l_quantity) > 0.05 * (
            SELECT sum(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey))
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (potential part promotion): nested IN subqueries with a
    correlated per-part threshold.  No partsupp availqty, so a supplier
    qualifies when its 1996 shipments of a 'blue%' part exceed 5% of
    that part's all-time shipped quantity.  l_quantity is
    integer-valued, so the double sums are exact and order-independent —
    the 0.3 threshold is deterministic across engines.  Spark
    decorrelates: ONE conditional aggregate at (supplier, part) grain
    computes the 1996 window sum and the group's all-time sum in the
    same pass, and the per-part total is a sum window over those
    already-aggregated rows (exact: integer-valued doubles) — the
    pre-r9 shape ran separate recent/total aggregations whose join
    replayed the blue-part scan pipeline twice.  The final IN is a
    left-semi join; part and supplier broadcast."""
    blue = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        broadcast_if_small(blue, sf_dir, "part"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    in_1996 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("date")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    per_sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(in_1996, F.col("l_quantity"))).alias("qty_1996"),
        F.sum("l_quantity").alias("qty_all"),
    )
    from pyspark.sql import Window as W

    total_qty = F.sum("qty_all").over(W.partitionBy("l_partkey"))
    qualifying = (
        per_sp.withColumn("total_qty", total_qty)
        .filter(F.col("qty_1996") > 0.05 * F.col("total_qty"))
        .select("l_suppkey")
    )
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q21_waiting_suppliers",
    # Decorrelated formulation of the classic EXISTS / NOT-EXISTS text:
    # a late l1 row qualifies iff its order has >=2 distinct suppliers
    # (the EXISTS: some other supplier in the order) and exactly 1
    # distinct LATE supplier (the NOT EXISTS: nobody else late — l1
    # itself is late, so nlate=1 means l1's supplier is the only one).
    # Value-identical to the correlated text (verified old==new at
    # sf0.01/sf0.1); the correlated original drove DuckDB into nested
    # RIGHT_DELIM_JOINs over the full fact table, a multi-hour oracle
    # at sf100, while this aggregates lineitem by order linearly —
    # the same shape the Spark plan below uses.
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ),
    ord_supp AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsupp
      FROM lineitem GROUP BY l_orderkey
    ),
    late_supp AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS nlate
      FROM late GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN ord_supp os ON os.l_orderkey = l1.l_orderkey AND os.nsupp >= 2
    JOIN late_supp ls ON ls.l_orderkey = l1.l_orderkey AND ls.nlate = 1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_4'
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): the EXISTS /
    NOT EXISTS double-correlation on the same fact table.  "Late" is
    shipped >60 days after the order date (no receipt/commit dates in
    the fixture).

    r9 optimization (guide §2.4): the semi/anti formulation referenced
    the fact table three times (late probe + EXISTS side + NOT-EXISTS
    side) — 3 lineitem scans, 2 orders scans, and two extra l_orderkey
    shuffles.  The decorrelated identity the ORACLE already uses (a
    late row qualifies iff its order has nsupp >= 2 distinct suppliers
    and exactly nlate = 1 distinct late supplier — that one supplier is
    the row's own) collapses everything into ONE li⋈orders pass and one
    per-order conditional aggregate: the join's hash partitioning on
    l_orderkey is reused by the groupBy (no second exchange), and for
    qualifying orders the unique late supplier (max over the 1-element
    late set) carries count(late rows) = numwait contribution."""
    orders_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    late_supp = F.when(is_late, F.col("l_suppkey"))
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(late_supp).alias("nlate"),
        F.max(late_supp).alias("late_suppkey"),
        F.count(late_supp).alias("n_late_rows"),
    )
    qual = per_order.filter(
        (F.col("nsupp") >= 2) & (F.col("nlate") == 1)
    ).select("late_suppkey", "n_late_rows")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    return (
        qual.join(
            broadcast_if_small(
                load(spark, sf_dir, "supplier").join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ),
                sf_dir,
                "supplier",
            ),
            F.col("late_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
    )
