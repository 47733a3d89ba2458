"""Query registry: every implemented operator from SURVEY.md §2 registers a
(PySpark callable, DuckDB oracle SQL) pair here.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` is the
ANSI-SQL equivalent DuckDB runs on the same parquet tables.  The driver
compares row count + schema + order-insensitive value hash, so every
computed column is aliased identically on both sides, double-typed
aggregates are rounded identically on both sides, and timestamps are cast
to DATE or formatted strings where they appear in outputs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def query(name: str, oracle: str | None = None):
    """Decorator registering a query (and optionally its DuckDB oracle)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # the driver may hand us a vanilla session; events.parquet carries
    # TIMESTAMP(NANOS) which Spark only reads with this legacy conf on
    # (runtime-settable, verified on Spark 4.1)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # events.ts is TIMESTAMP(NANOS) in the fixture parquet; with
    # nanosAsLong it arrives as a long — integer-divide (no double
    # round-trip: ns epochs exceed 2^53) down to microseconds.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register the fixture tables as temp views for SQL-form queries."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from ducklakexl_spark.queries import (  # noqa: F401
        dedup,
        joins,
        lakehouse,
        multimodal,
        nested,
        relational,
        scalars,
        similarity,
        skew,
        text,
        tpch,
        windows,
    )
