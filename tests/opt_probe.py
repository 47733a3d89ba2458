"""Round-9 decomposition probe (guide §1): for each headline query, in one
warm session, measure steady-state collect time (min of N), the number of
Spark JOBS the collect launches (job-floor accounting: this box's minimum
job cost is ~30-70 ms, so a query that fires k jobs has a k-floor), and
the collected row count (py4j materialization is proportional to rows).

excess = warm_min - n_jobs * floor_est  is the optimizable compute.

Usage: python tests/opt_probe.py [query ...]   (default: bench HEADLINE)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_passes = int(os.environ.get("OPT_PASSES", "5"))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import HEADLINE

    from ducklakexl_spark import queries as qmod
    from ducklakexl_spark.session import get_spark

    qmod.load_all()
    names = sys.argv[1:] or list(HEADLINE)
    spark = get_spark(app_name="opt_probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # job floor: a prepared single-stage scan-limit plan, min of 7
    floor_df = spark.range(0, 1000).selectExpr("sum(id) as s")
    floor_df.collect()
    floor = min(
        _timed(floor_df.collect) for _ in range(7)
    )

    out: dict[str, dict] = {"_floor_sec": round(floor, 4)}
    for name in names:
        fn = qmod.QUERIES.get(name)
        if fn is None:
            continue
        try:
            df = fn(spark, sf_dir)
            rows = df.collect()  # cold pass: plan + codegen paid here
            df = fn(spark, sf_dir)  # memoized prepared plan
            sc.setJobGroup(f"probe_{name}", name)
            before_jobs = set(tracker.getJobIdsForGroup(f"probe_{name}"))
            t = min(_timed(df.collect) for _ in range(n_passes))
            n_jobs = len(
                set(tracker.getJobIdsForGroup(f"probe_{name}")) - before_jobs
            ) // n_passes
            sc.setJobGroup("", "")
            out[name] = {
                "warm_min": round(t, 4),
                "n_jobs": n_jobs,
                "n_rows": len(rows),
                "excess": round(t - n_jobs * floor, 4),
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
    print(json.dumps(out, indent=1))
    spark.stop()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
