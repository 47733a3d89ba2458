"""Staged sf100 run of the three dedup siblings (VERDICT-r8 task 7).

The r8 sweep skipped dedup_clusters / dedup_canonical_pick /
dedup_survivors at sf100 as disk-bound (~100 GB scratch vs the box's
~60 GB).  The scratch was NOT the queries themselves — it was the
evaluation harness re-running the ~1B-row shingle→LSH pipeline FOUR
times per sibling compare (DuckDB recomputes the `edges` CTE inside
each oracle; the sweep's clear_plan_caches() between queries also
dropped Spark's persisted dedup index between siblings).  This runner
stages the pipeline so each engine pays for the LSH exactly once:

  * DuckDB: materialize `edges` once (CREATE TEMP TABLE edges_mat AS
    <the verbatim _minhash_lsh_oracle() text>), then run each sibling's
    oracle with its embedded LSH subquery swapped for
    `SELECT * FROM edges_mat` — a pure evaluation staging of IDENTICAL
    SQL text, values unchanged.
  * Spark: run the three siblings in ONE session back-to-back with no
    cache clearing, so shingle_rows/minhash_signatures persist across
    them (the per-corpus-snapshot index model they are built on).

Usage: python tests/run_dedup_siblings_sf100.py [sf_dir] [state_file]
Appends OK/MISMATCH/ERROR rows compatible with the sweep artifact.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIBLINGS = ("dedup_clusters", "dedup_canonical_pick", "dedup_survivors")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_sf100"
    state = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dedup_siblings_sf100.txt"

    import duckdb
    from pyspark.sql import SparkSession

    from ducklakexl_spark import queries as qmod
    from ducklakexl_spark.queries.dedup import _minhash_lsh_oracle

    qmod.load_all()
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SWEEP_CPUS', '24')}]"
        )
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SWEEP_CPUS", "24"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SWEEP_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    con = duckdb.connect()
    # per-pid spill dir — see tests/sweep_sf.py: the cwd-relative
    # default collides across concurrent DuckDB processes
    tmpdir = os.environ.get(
        "SWEEP_DUCK_TEMP_DIR", f"/root/repo/.tmp/siblings_{os.getpid()}"
    )
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory = '{tmpdir}'")
    con.execute(
        "SET memory_limit = '"
        + os.environ.get("SWEEP_DUCK_MEM", "24GB")
        + "'"
    )
    con.execute("SET threads TO 8")
    for t in qmod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    lsh_sql = _minhash_lsh_oracle()
    t0 = time.time()
    print("materializing edges (DuckDB LSH, one pass)...", flush=True)
    con.execute(f"CREATE TEMP TABLE edges_mat AS {lsh_sql}")
    n_edges = con.execute("SELECT count(*) FROM edges_mat").fetchone()[0]
    print(f"edges_mat: {n_edges} pairs in {time.time() - t0:.0f}s", flush=True)

    from tests.compare import compare

    with open(state, "a") as out:
        for name in SIBLINGS:
            oracle = qmod.ORACLES[name]
            assert lsh_sql in oracle, name
            staged = oracle.replace(lsh_sql, "SELECT * FROM edges_mat", 1)
            t1 = time.time()
            try:
                compare(qmod.QUERIES[name](spark, sf_dir), con, staged, name)
                status = f"OK {time.time() - t1:.0f}s (staged edges_mat)"
            except AssertionError as exc:
                status = f"MISMATCH {exc}"
            except Exception as exc:  # noqa: BLE001
                status = f"ERROR {type(exc).__name__}"
            out.write(f"{name} {status}\n")
            out.flush()
            print(name, status, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
