"""Nested-type coverage: arrays (higher-order functions), explode/unnest,
struct construction/access, and JSON extraction (SURVEY.md §2.C rows
"nested: list/array" and "nested: struct/map").

The embedding column (``array<float>``) is processed entirely with Spark's
higher-order functions (``transform``/``filter``/``aggregate``) — JVM-side,
no Python UDF — which is also the scale path for 100 TB: per-row array math
never shuffles.

Float→double casts happen element-wise *before* arithmetic on both engines
so the left-to-right fold accumulates identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT)                       AS dim,
           embedding[1]                                         AS first_val,
           embedding[64]                                        AS last_val,
           list_min(embedding)                                  AS min_val,
           list_max(embedding)                                  AS max_val,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).alias("first_val"),
        F.element_at(emb, 64).alias("last_val"),
        F.array_min(emb).alias("min_val"),
        F.array_max(emb).alias("max_val"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sq_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "array_explode_agg",
    oracle="""
    SELECT CAST((i - 1) % 8 AS BIGINT)      AS dim_bucket,
           label,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS avg_val,
           count(*)                          AS n
    FROM embeddings, generate_series(1, 64) t(i)
    GROUP BY dim_bucket, label
    """,
)
def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy(
            (F.col("pos") % 8).cast("long").alias("dim_bucket"),
            "label",
        )
        .agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("avg_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("dim_bucket", "label", "avg_val", "n")
    )


@query(
    "array_zip_dot",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))), 6)
             AS dot_q
    FROM embeddings e, q
    WHERE e.vec_id < 100
    """,
)
def array_zip_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    # broadcast the 1-row query vector; zip_with keeps the dot product JVM-side
    return (
        e.filter(F.col("vec_id") < 100)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        "qv",
                        lambda a, b: a.cast("double") * b.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("dot_q"),
        )
    )


@query(
    "struct_ops",
    oracle="""
    SELECT o_orderkey,
           struct_pack(status := o_orderstatus, prio := o_orderpriority).status
             AS status_from_struct,
           struct_pack(k := o_orderkey, price := round(o_totalprice, 2)).price
             AS price_from_struct
    FROM orders
    WHERE o_orderkey <= 200
    """,
)
def struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    s1 = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("prio")
    )
    s2 = F.struct(
        F.col("o_orderkey").alias("k"), F.round("o_totalprice", 2).alias("price")
    )
    return o.select(
        "o_orderkey",
        s1.getField("status").alias("status_from_struct"),
        s2.getField("price").alias("price_from_struct"),
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS total_k,
           count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50)
             AS n_big_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("total_k"),
        F.count(F.when(k > 50, 1)).alias("n_big_k"),
    )


@query(
    "json_schema_parse",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE event_id <= 300
    """,
)
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # from_json with an explicit schema — the scale path for typed JSON
    # columns (one parse, typed struct out, prunable).
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    parsed = F.from_json("props", "struct<k:bigint>")
    return ev.select("event_id", parsed.getField("k").alias("k_val"))
