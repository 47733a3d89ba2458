"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``ducklakexl_spark.queries.*`` — one registered
(PySpark callable, DuckDB oracle SQL) pair per operator from
SURVEY.md §2; this module just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ducklakexl_spark import queries as _q

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-style join/agg/top-k) on sf0.001."""
    return _q.QUERIES["q03_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
