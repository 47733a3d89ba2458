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


def _cost_tier(name: str) -> int:
    """Order the registry cheap-first so a time-budgeted sweep covers
    the maximum number of queries before any cutoff: pure single-scan
    and relational plans (sub-second warm) ahead of lakehouse flows
    (each builds a fresh catalog + several writes) ahead of streaming
    drives (each runs a real micro-batch stream to completion)."""
    if name.startswith("stream_"):
        return 3
    if name.startswith(("lakehouse_", "mm_")):
        return 2
    if name.startswith(
        ("dedup_clusters", "dedup_survivors", "dedup_lsh_recall",
         "sim_ivf", "sim_semantic", "sim_mmr")
    ):
        return 1  # iterative / multi-stage but still batch
    return 0


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    names = sorted(_q.QUERIES, key=lambda n: (_cost_tier(n), n))
    return {n: _q.QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
