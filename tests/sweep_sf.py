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
        # only OK/SKIP lines count as done — ERROR lines (e.g. from a
        # killed JVM cascading ConnectionRefused) are retried on resume
        done = {
            line.split(" ", 1)[0]
            for line in open(state)
            if line.strip()
            and (" OK" in line or " SKIP" in line)
        }

    import duckdb
    from pyspark.sql import SparkSession

    from ducklakexl_spark import queries as qmod

    qmod.load_all()
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SWEEP_CPUS', '16')}]"
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SWEEP_CPUS", "16"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the default 1g driver heap OOM-kills the JVM on the heavier
        # graph/dedup queries at sf>=0.1, poisoning the whole chunk
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    con = duckdb.connect()
    # ISOLATE the oracle's spill dir per process: concurrent in-memory
    # DuckDBs default to the cwd-relative ".tmp" and SHARE
    # duckdb_temp_storage-0.tmp — observed crash (r9): one worker's
    # cleanup removed the file under another worker mid-spill and that
    # process terminate()d on duckdb::IOException (SIGABRT).  A
    # same-path collision could also silently cross-read spill blocks,
    # so per-pid isolation is a correctness guard, not just uptime.
    tmpdir = os.environ.get(
        "SWEEP_DUCK_TEMP_DIR", f"/root/repo/.tmp/sweep_{os.getpid()}"
    )
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory = '{tmpdir}'")
    # cap the in-process oracle's memory: at sf10 the shingle/list
    # pipelines otherwise balloon to DuckDB's default 80%-of-RAM and,
    # with two sweep slices + two Spark drivers on one box, the kernel
    # OOM-kills a JVM mid-chunk
    con.execute(
        "SET memory_limit = '"
        + os.environ.get("SWEEP_DUCK_MEM", "18GB")
        + "'"
    )
    con.execute("SET threads TO " + os.environ.get("SWEEP_DUCK_THREADS", "8"))
    # retry knobs for the oracle-side disk-exhaustion class (r9: four
    # sf100 rows IOException'd when DuckDB's spill outgrew the box —
    # 55 GB observed for mm_phash_dedup): cap the temp dir so a doomed
    # oracle fails fast instead of starving the box, and drop
    # insertion-order preservation to shrink aggregate/join state
    cap = os.environ.get("SWEEP_DUCK_TEMP_CAP")
    if cap:
        con.execute(f"SET max_temp_directory_size = '{cap}'")
    if os.environ.get("SWEEP_DUCK_NO_ORDER"):
        con.execute("SET preserve_insertion_order = false")
    for t in qmod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # default tier excludes the stateful prefixes (each lakehouse_ row
    # builds a fresh catalog + several writes; each stream_ row drives a
    # real micro-batch stream to completion) — SWEEP_ALL=1 includes them
    # for the all-registry sf0.01 tier (VERDICT-r8 task 6: the strict
    # gate found 8 latent oracle drifts exactly in that blind spot)
    if os.environ.get("SWEEP_ALL"):
        names = sorted(qmod.ORACLES)
    else:
        names = [
            n
            for n in sorted(qmod.ORACLES)
            if not n.startswith(("lakehouse_", "stream_"))
        ]
    # SWEEP_SLICE=k/m: process only every m-th name starting at k-1 —
    # lets two+ processes split one sweep across disjoint subsets
    # (each with its own state file; concatenate for the artifact)
    slice_spec = os.environ.get("SWEEP_SLICE", "")
    if slice_spec:
        k, m = (int(x) for x in slice_spec.split("/"))
        names = [n for i, n in enumerate(names) if i % m == k - 1]
    # SWEEP_ONLY: explicit comma-separated name list — used to
    # rebalance uneven slices mid-sweep (each worker gets its own state
    # file; the assembler merges last-wins)
    only = {
        s.strip()
        for s in os.environ.get("SWEEP_ONLY", "").split(",")
        if s.strip()
    }
    if only:
        names = [n for n in names if n in only]
    todo = [n for n in names if n not in done]
    # SWEEP_SKIP: quadratic-by-design correctness audits (all-pairs
    # n-gram Jaccard and its dependents) are intractable past sf0.1 —
    # 50k docs = 1.25e9 set-Jaccard pairs on BOTH engines.  They stay
    # out of the bench for the same reason (bench.py HEADLINE note);
    # a skip line documents the exclusion in the sweep artifact.
    skips = {
        s.strip()
        for s in os.environ.get("SWEEP_SKIP", "").split(",")
        if s.strip()
    }
    print(f"{len(done)} done, {len(todo)} to go", flush=True)
    fails = 0
    with open(state, "a") as out:
        for n in todo:
            if n in skips:
                out.write(f"{n} SKIP(quadratic-by-design at this SF)\n")
                out.flush()
                print(n, "SKIP", flush=True)
                continue
            try:
                from tests.compare import compare, compare_via_parquet

                # SWEEP_PARQUET_COMPARE: rows whose output is
                # corpus-sized (window_lag_lead at sf100 = 100M rows —
                # unfetchable as driver-Python tuples) verify via the
                # parquet-materialized multiset compare instead; the
                # artifact line records the mode
                if n in {
                    s.strip()
                    for s in os.environ.get(
                        "SWEEP_PARQUET_COMPARE", ""
                    ).split(",")
                    if s.strip()
                }:
                    compare_via_parquet(
                        qmod.QUERIES[n](spark, sf_dir),
                        con,
                        qmod.ORACLES[n],
                        n,
                        os.environ.get(
                            "SWEEP_SCRATCH", "/root/repo/.sweep_scratch"
                        ),
                    )
                    status = "OK(parquet-multiset compare)"
                else:
                    compare(
                        qmod.QUERIES[n](spark, sf_dir),
                        con,
                        qmod.ORACLES[n],
                        n,
                    )
                    status = "OK"
            except AssertionError:
                status = "MISMATCH"
                fails += 1
            except Exception as exc:  # noqa: BLE001
                status = f"ERROR {type(exc).__name__}"
                fails += 1
                if isinstance(exc, ConnectionRefusedError) or (
                    "Answer from Java side is empty" in str(exc)
                ):
                    # the JVM is gone — abort the chunk instead of
                    # writing a cascade of bogus failures
                    print(f"{n}: JVM lost, aborting chunk", flush=True)
                    out.write(f"{n} {status}\n")
                    return 1
            out.write(f"{n} {status}\n")
            out.flush()
            # release the memoized plan: a held DataFrame pins its JVM
            # Dataset and the ContextCleaner then never deletes its
            # shuffle files — at sf100 a full sweep accumulated 30+ GB
            # of blockmgr spill per session and filled the disk
            qmod.clear_plan_caches(spark)
            print(n, status, flush=True)
    print(f"sweep chunk complete, {fails} failures", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
