"""Scalar-function family coverage: string, date/time, math, conditional,
and cast/try_cast expressions (SURVEY.md §2.C rows "scalar: string",
"scalar: date/time", "scalar: math/misc").

All expressions stay inside whole-stage codegen (built-in
``pyspark.sql.functions`` only — no Python UDFs on this path).

Cross-engine gotchas handled here:
- DuckDB ``ceil/floor`` return DECIMAL/DOUBLE, Spark LONG → cast both to BIGINT;
- DuckDB CAST(double AS INT) rounds, Spark truncates → avoided entirely;
- Spark ``weekday`` is 0=Monday, DuckDB ``isodow`` is 1=Monday → isodow-1;
- extraction functions return INT in Spark, BIGINT in DuckDB → cast to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment)                                   AS seg_upper,
           lower(c_name)                                         AS name_lower,
           substr(c_name, 1, 8)                                  AS name_prefix,
           replace(c_name, 'Customer', 'Cust')                   AS name_short,
           CAST(length(c_name) AS BIGINT)                        AS name_len,
           concat(c_mktsegment, '-', c_name)                     AS seg_name,
           trim(concat('  ', c_mktsegment, ' '))                 AS seg_trim,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')             AS key_pad,
           regexp_extract(c_name, '([0-9]+)', 1)                 AS key_digits,
           c_name LIKE 'Customer#%'                              AS is_customer,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building,
           reverse(c_mktsegment)                                 AS seg_rev,
           split_part(c_name, '#', 2)                            AS after_hash
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trim"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("key_digits"),
        F.col("c_name").like("Customer#%").alias("is_customer"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING"))
        .cast("long")
        .alias("lev_building"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(year  FROM o_orderdate) AS BIGINT)  AS yr,
           CAST(extract(month FROM o_orderdate) AS BIGINT)  AS mo,
           CAST(extract(day   FROM o_orderdate) AS BIGINT)  AS dy,
           CAST(isodow(o_orderdate) - 1 AS BIGINT)          AS wd,
           CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE)   AS month_start,
           last_day(o_orderdate)                            AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)     AS plus3m,
           CAST(o_orderdate + INTERVAL 10 DAY AS DATE)      AS plus10d,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.weekday(d).cast("long").alias("wd"),
        F.quarter(d).cast("long").alias("qtr"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus3m"),
        F.date_add(d.cast("date"), 10).alias("plus10d"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT p_partkey,
           round(abs(p_retailprice - 1000), 4)          AS abs_diff,
           round(sqrt(p_retailprice), 6)                AS sqrt_price,
           round(ln(p_retailprice + 1), 6)              AS ln_price,
           round(log10(p_retailprice + 1), 6)           AS log10_price,
           round(pow(p_size, 2), 2)                     AS size_sq,
           CAST(floor(p_retailprice) AS BIGINT)         AS price_floor,
           CAST(ceil(p_retailprice)  AS BIGINT)         AS price_ceil,
           CAST(p_size % 7 AS BIGINT)                   AS size_mod7,
           CAST(sign(p_retailprice - 1000) AS BIGINT)   AS price_sign,
           round(greatest(p_retailprice, 500.0), 2)     AS at_least_500,
           round(least(p_retailprice, 1500.0), 2)       AS at_most_1500
    FROM part
    WHERE p_partkey <= 500 AND p_retailprice > 0
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_partkey") <= 500) & (F.col("p_retailprice") > 0)
    )
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(F.abs(price - 1000), 4).alias("abs_diff"),
        F.round(F.sqrt(price), 6).alias("sqrt_price"),
        F.round(F.log(price + 1), 6).alias("ln_price"),
        F.round(F.log10(price + 1), 6).alias("log10_price"),
        F.round(F.pow("p_size", F.lit(2)), 2).alias("size_sq"),
        F.floor(price).cast("long").alias("price_floor"),
        F.ceil(price).cast("long").alias("price_ceil"),
        (F.col("p_size") % 7).cast("long").alias("size_mod7"),
        F.signum(price - 1000).cast("long").alias("price_sign"),
        F.round(F.greatest(price, F.lit(500.0)), 2).alias("at_least_500"),
        F.round(F.least(price, F.lit(1500.0)), 2).alias("at_most_1500"),
    )


@query(
    "case_coalesce_nullif",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000 THEN 'high'
                WHEN c_acctbal > 0    THEN 'mid'
                ELSE 'low' END                                  AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')  AS seg_masked,
           CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 ELSE 0 END AS is_auto
    FROM customer
    """,
)
def case_coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "high")
        .when(F.col("c_acctbal") > 0, "mid")
        .otherwise("low")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_masked"),
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
        .otherwise(0)
        .alias("is_auto"),
    )


@query(
    "cast_try_cast",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS parsed_key,
           try_cast(c_mktsegment AS BIGINT)                      AS seg_as_int,
           try_cast(split_part(c_name, '#', 2) AS BIGINT)        AS after_hash_int,
           c_acctbal < 0                                         AS is_negative
    FROM customer
    WHERE c_custkey <= 300
    """,
)
def cast_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).cast("long").alias("parsed_key"),
        F.col("c_mktsegment").try_cast("long").alias("seg_as_int"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2))
        .try_cast("long")
        .alias("after_hash_int"),
        (F.col("c_acctbal") < 0).alias("is_negative"),
    )


@query(
    "scalar_misc_funcs",
    oracle="""
    SELECT s_suppkey,
           round(exp(1.0 / (s_suppkey + 1)), 6)            AS e_x,
           round(ln(abs(s_acctbal) + 1), 6)                AS ln_bal,
           round(sin(s_suppkey) + cos(s_suppkey), 6)       AS trig,
           round(atan2(1.0, s_suppkey + 1), 6)             AS at2,
           translate(s_name, 'SUP', 'sup')                 AS translated,
           repeat(substr(s_name, 1, 2), 2)                 AS rep2,
           CAST(strpos(s_name, '_') AS BIGINT)             AS underscore_at,
           strftime(make_timestamp(CAST(1995 + s_nationkey % 10 AS BIGINT),
                                   CAST(1 + s_suppkey % 12 AS BIGINT),
                                   CAST(1 + s_suppkey % 28 AS BIGINT),
                                   CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0.0),
                    '%Y-%m-%d %H:%M:%S')                   AS made_ts
    FROM supplier
    """,
)
def scalar_misc_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math (exp/ln/trig/atan2), string (translate/repeat/position), and
    timestamp-construction (make_timestamp) families — all JVM built-ins
    inside whole-stage codegen."""
    s = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return s.select(
        "s_suppkey",
        F.round(F.exp(1.0 / (k + 1)), 6).alias("e_x"),
        F.round(F.log(F.abs(F.col("s_acctbal")) + 1), 6).alias("ln_bal"),
        F.round(F.sin(k) + F.cos(k), 6).alias("trig"),
        F.round(F.atan2(F.lit(1.0), (k + 1).cast("double")), 6).alias("at2"),
        F.translate("s_name", "SUP", "sup").alias("translated"),
        F.repeat(F.substring("s_name", 1, 2), 2).alias("rep2"),
        F.instr("s_name", "_").cast("long").alias("underscore_at"),
        F.date_format(
            F.make_timestamp(
                (F.lit(1995) + F.col("s_nationkey") % 10).cast("int"),
                (k % 12 + 1).cast("int"),
                (k % 28 + 1).cast("int"),
                F.lit(0), F.lit(0), F.lit(0.0),
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("made_ts"),
    )
