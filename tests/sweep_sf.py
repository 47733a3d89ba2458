"""Resumable full-registry oracle sweep at an arbitrary SF.

Usage: python tests/sweep_sf.py [sf_dir] [state_file]
Runs every PURE registered query against its DuckDB oracle with the
driver's compare semantics, appending one line per query to the state
file; a rerun skips names already recorded, so a wall-clock-limited
harness can finish the sweep across invocations.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_state.txt"
    import os

    done = set()
    if os.path.exists(state):
        done = {
            line.split(" ", 1)[0] for line in open(state) if line.strip()
        }

    import duckdb
    from pyspark.sql import SparkSession

    from ducklakexl_spark import queries as qmod

    qmod.load_all()
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in qmod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    names = [
        n
        for n in sorted(qmod.ORACLES)
        if not n.startswith(("lakehouse_", "stream_"))
    ]
    todo = [n for n in names if n not in done]
    print(f"{len(done)} done, {len(todo)} to go", flush=True)
    fails = 0
    with open(state, "a") as out:
        for n in todo:
            try:
                from tests.compare import compare

                compare(
                    qmod.QUERIES[n](spark, sf_dir), con, qmod.ORACLES[n], n
                )
                status = "OK"
            except AssertionError:
                status = "MISMATCH"
                fails += 1
            except Exception as exc:  # noqa: BLE001
                status = f"ERROR {type(exc).__name__}"
                fails += 1
            out.write(f"{n} {status}\n")
            out.flush()
            print(n, status, flush=True)
    print(f"sweep chunk complete, {fails} failures", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
