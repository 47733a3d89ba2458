"""Composite join queries (SURVEY §2.C "joins" row: AS-OF / POSITIONAL /
range joins are composite patterns in Spark; DuckDB has native keywords
for the first two, which makes these the strongest possible oracles —
our composition vs the engine's built-in operator).

Reference dispatch point: ducklakexl.py:394 (all joins delegated to
DuckDB's dialect, which includes ASOF JOIN and POSITIONAL JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.operators.joins import asof_join, positional_join, range_join
from ducklakexl_spark.queries import load, query


@query(
    "asof_purchase_attribution",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           round(p.value, 2)  AS purchase_value,
           round(c.value, 2)  AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the value of the same user's latest click at or
    before the purchase — the canonical as-of join.  One shuffle on
    user_id, no range cross-product (operators/joins.py:asof_join)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round(F.col("value"), 2).alias("purchase_value"),
        F.round(F.col("click_value"), 2).alias("last_click_value"),
    )


@query(
    "asof_forward",
    oracle="""
    SELECT c.event_id,
           c.user_id,
           round(c.value, 2)  AS click_value,
           round(p.value, 2)  AS next_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward (``<=``) as-of join: for every click, the value of the
    same user's EARLIEST purchase at or after the click.  Same
    union + carry plan as the backward direction, mirrored — a
    following-frame ``first`` instead of a preceding-frame ``last``
    (operators/joins.py:asof_join direction='forward'), one shuffle on
    user_id, no range cross-product.  VERDICT r5 task 4."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["purchase_value"], direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round(F.col("value"), 2).alias("click_value"),
        F.round(F.col("purchase_value"), 2).alias("next_purchase_value"),
    )


@query(
    "positional_region_nation",
    oracle="""
    SELECT r.r_regionkey, r.r_name, n.n_nationkey, n.n_name
    FROM (SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey) r
    POSITIONAL JOIN
         (SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 7) n
    """,
)
def positional_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-by-row zip of the 5 regions against the first 7 nations — the
    longer side NULL-pads the shorter, matching DuckDB POSITIONAL JOIN.
    Distributed engines have no physical row order, so the zip is defined
    under explicit total orders (operators/joins.py:positional_join)."""
    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation = (
        load(spark, sf_dir, "nation")
        .orderBy("n_nationkey")
        .limit(7)
        .select("n_nationkey", "n_name")
    )
    return positional_join(
        region, nation, left_order=["r_regionkey"], right_order=["n_nationkey"]
    )


@query(
    "join_lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) t
    WHERE c.c_custkey <= 50
    """,
)
def join_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer).  Spark SQL
    supports LATERAL joins natively since 3.2 — Catalyst decorrelates the
    limit-per-key into a partitioned window, so this plans as one shuffle
    on o_custkey, not a per-row subquery."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               round(t.o_totalprice, 2) AS price
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        WHERE c.c_custkey <= 50
        """
    )


@query(
    "range_join_value_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('low',   0.0,   50.0),
               ('mid',   50.0,  150.0),
               ('high',  150.0, 300.0),
               ('xhigh', 300.0, 1000000.0)
    )
    SELECT b.band,
           count(*)                 AS n,
           CAST(round(sum(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE)
                                    AS total_value
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: band every event's value into [lo, hi)
    buckets.  The band table is broadcast, so the plan is a
    BroadcastNestedLoopJoin — zero shuffle of the fact side
    (operators/joins.py:range_join)."""
    ev = load(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [
            ("low", 0.0, 50.0),
            ("mid", 50.0, 150.0),
            ("high", 150.0, 300.0),
            ("xhigh", 300.0, 1_000_000.0),
        ],
        "band string, lo double, hi double",
    )
    joined = range_join(
        ev, bands, value=F.col("value"), lo=F.col("lo"), hi=F.col("hi")
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        # exact-cents sum (see agg_having): up-to-100M-row bands at sf100
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_value"),
    )
