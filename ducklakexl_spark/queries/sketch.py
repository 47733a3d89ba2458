"""Sketch operators: sublinear-memory approximate structures for
streaming/100 TB aggregation, built from deterministic md5-derived
hashes so the DuckDB oracle reproduces them bit-for-bit.

Count-Min Sketch: d independent hash rows x w buckets of counters.
Point estimate = min over rows of the addressed counter — never an
underestimate; error <= N * e/w with probability 1 - e^-d.  The sketch
is (d*w) counters regardless of corpus size, so at 100 TB it lives in a
broadcast while the exact per-key groupBy it replaces would shuffle the
full keyspace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklakexl_spark.queries import load, query

CMS_D = 4  # hash rows
CMS_W = 256  # buckets per row
CMS_PROBES = 20  # keys to point-estimate


def _bucket_sql(row: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({row} AS VARCHAR) || ':' || "
        f"CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {CMS_W} AS BIGINT)"
    )


def _bucket_col(row, key) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        row.cast("string"), F.lit(":"), key.cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


@query(
    "sketch_countmin_users",
    oracle=f"""
    WITH rows_ AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j),
    cells AS (
      SELECT j, {_bucket_sql("j", "e.user_id")} AS b, count(*) AS c
      FROM events e CROSS JOIN rows_
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT user_id, count(*) AS exact_n
      FROM events WHERE user_id < {CMS_PROBES} GROUP BY user_id
    ),
    est AS (
      SELECT p.user_id, p.exact_n, min(c.c) AS cms_n
      FROM probes p
      JOIN rows_ r ON TRUE
      JOIN cells c ON c.j = r.j
                  AND c.b = {_bucket_sql("r.j", "p.user_id")}
      GROUP BY p.user_id, p.exact_n
    )
    SELECT user_id, exact_n, cms_n,
           (cms_n >= exact_n) AS never_underestimates
    FROM est
    """,
)
def sketch_countmin_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch over event user_ids: build the {CMS_D}x{CMS_W}
    counter grid in ONE corpus pass (explode to d cells per event,
    partial-aggregated groupBy — the only shuffle moves d rows per
    event, coalescing to <= d*w cells), then point-estimate the first
    {CMS_PROBES} users by broadcast-joining the probe set against the
    grid and taking the per-key min.  The oracle recomputes the same
    md5-addressed grid exactly; the never_underestimates column is the
    CMS guarantee, asserted per key."""
    ev = load(spark, sf_dir, "events").select("user_id")
    cells = (
        ev.select(
            F.explode(
                F.array(*[F.lit(j) for j in range(CMS_D)])
            ).alias("j"),
            "user_id",
        )
        .select("j", _bucket_col(F.col("j"), F.col("user_id")).alias("b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        ev.filter(F.col("user_id") < CMS_PROBES)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    # d lookup addresses per probe key
    addr = probes.select(
        "user_id",
        "exact_n",
        F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j"),
    ).select(
        "user_id",
        "exact_n",
        "j",
        _bucket_col(F.col("j"), F.col("user_id")).alias("b"),
    )
    est = (
        addr.join(F.broadcast(cells), ["j", "b"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_n"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_n",
        (F.col("cms_n") >= F.col("exact_n")).alias("never_underestimates"),
    )
