"""SparkSession factory tuned for this engine.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions sized to cores (not the 200 default), AQE on for runtime
re-planning and skew-join handling, Arrow on for any pandas interchange,
session timezone pinned to UTC so timestamp semantics match the DuckDB
oracle (DuckDB timestamps are UTC-naive).

On a real cluster the same builder applies — only ``master`` and the
memory knobs change; shuffle partitions should scale to ~2-3x total
executor cores and AQE coalescing handles the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ducklakexl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # write int64 micros, not the deprecated INT96: INT96 columns
        # carry no usable footer min/max, which silently disables both
        # parquet row-group pruning and catalog-level file skipping on
        # timestamp predicates
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # some fixtures carry TIMESTAMP(NANOS) parquet columns, which Spark
        # rejects natively; read them as long and convert at load time
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # no-tz timestamp[us] parquet reads as TIMESTAMP, not NTZ: the UTC
        # session tz makes it the same wall-clock, and scan-level min/max
        # pushdown on timestamp columns survives (NTZ + cast would not)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # collect() of a large declared-query result (the bench/driver
        # contract materializes every query via collect) trips the 1 GiB
        # default at sf100 — dedup_minhash_lsh's 25M-pair result is
        # ~1.1 GiB serialized.  8g stays far under the driver heap; this
        # is the §5 "raise it only if the driver truly has the memory"
        # case, not a license to collect corpus-sized frames.
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
