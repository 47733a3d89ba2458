"""Skew-mitigation query demos (operators/skew.py): identical results to
the plain formulations — that is the point, and what the oracles check —
with physical plans that survive a single hot key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.operators.skew import salted_agg, salted_join
from ducklakexl_spark.queries import load, query


@query(
    "skew_salted_event_totals",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)  AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2)
                AS DOUBLE)           AS total_value,
           round(max(value), 2)      AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the hot event_type key (a
    handful of distinct values across every row — the worst-case agg
    skew shape).  Result is identical to the one-stage groupBy; the plan
    fans the hot keys over 16 reducers first."""
    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": F.count(F.lit(1)),
            # exact-cents sum: value is 2-decimal by construction; at
            # sf100 a 20M-row hot group's double-sum reduce-order ulp
            # crosses round()'s half-cent boundaries (see agg_having)
            "total_value": F.sum(F.col("value").cast("decimal(18,2)")),
            "max_value": (F.max("value"), "max"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("total_value", 2).cast("double").alias("total_value"),
        F.round("max_value", 2).alias("max_value"),
    )


@query(
    "skew_salted_join_totals",
    oracle="""
    SELECT n_name,
           CAST(count(*) AS BIGINT)   AS n_customers,
           round(sum(c_acctbal), 2)   AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def skew_salted_join_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join on the customer→nation key (25 nations over
    every customer row = hot join keys).  Same result as the plain join;
    the big side's hot keys spread over 8 salt buckets while nation
    replicates 8x — the strategy for when the small side exceeds the
    broadcast threshold."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"), "c_acctbal"
    )
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    joined = salted_join(cust, nation, key="nk", n_salts=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )
