"""Spark-side standalone probe for sweep rows whose DuckDB ORACLE
cannot run at sf100 on this box (OOM at the 48 GB cap / >55 GB spill
vs ~60 GB free disk).

The sweep's compare() evaluates the oracle FIRST, so an oracle-resource
failure aborts the row before the Spark plan ever executes.  This probe
runs ONLY the engine side of each named query at the given SF and
records (rows, seconds).  Output lines are sweep-state compatible:

  <name> SKIP(oracle-resource: DuckDB <failure>; Spark-side standalone
         OK, <rows> rows, <t>s)

The value claim for these rows rests on the strict oracle parity that
PASSED at every SF the oracle can evaluate (sf0.01 / sf0.1 / sf1 /
sf10 committed sweeps); sf100 adds capability evidence, not a value
check — stated honestly in the artifact line.

Usage: python tests/spark_probe_sf100.py name[,name...] [sf_dir] [state]
Env: PROBE_FAILURE_NOTE — text describing the oracle failure per run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = [s for s in sys.argv[1].split(",") if s]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scale_sf100"
    state = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sweep100_probe.txt"
    note = os.environ.get("PROBE_FAILURE_NOTE", "OOM at the 48GB cap")

    from pyspark.sql import SparkSession

    from ducklakexl_spark import queries as qmod

    qmod.load_all()
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SWEEP_CPUS', '12')}]"
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SWEEP_CPUS", "12"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "12g")
        )
        .getOrCreate()
    )
    with open(state, "a") as out:
        for n in names:
            t0 = time.time()
            try:
                rows = qmod.QUERIES[n](spark, sf_dir).count()
                dt = time.time() - t0
                line = (
                    f"{n} SKIP(oracle-resource: DuckDB {note}; "
                    f"Spark-side standalone OK, {rows} rows, {dt:.0f}s; "
                    f"value parity pinned at sf<=10)"
                )
            except Exception as exc:  # noqa: BLE001
                line = f"{n} ERROR {type(exc).__name__} (spark-side probe)"
            out.write(line + "\n")
            out.flush()
            print(line, flush=True)
            qmod.clear_plan_caches(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
