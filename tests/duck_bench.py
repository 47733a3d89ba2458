"""DuckDB baseline for the headline bench: runs the SAME 28 oracle
SQLs bench.py times on Spark, against the same parquet directory, warm
min-of-3, and prints one JSON line.  Used for the sfN scale
comparisons in SURVEY §8 (the judge runs its own copy of this
methodology at sf0.1 — this script just makes the same measurement
reproducible at other SFs on the same box).

Usage: python tests/duck_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import duckdb

    from bench import HEADLINE
    from ducklakexl_spark import queries as qmod

    qmod.load_all()
    # same sf100 knobs as bench.py so the pair stays symmetric
    excluded = [
        s for s in os.environ.get("BENCH_EXCLUDE", "").split(",") if s
    ]
    headline = [n for n in HEADLINE if n not in excluded]
    n_warm = int(os.environ.get("BENCH_WARM_PASSES", "3"))
    con = duckdb.connect()
    if os.environ.get("BENCH_DUCK_MEM"):
        con.execute(
            f"SET memory_limit = '{os.environ['BENCH_DUCK_MEM']}'"
        )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    errors: dict[str, str] = {}

    def run_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in headline:
            sql = qmod.ORACLES.get(name)
            if sql is None or name in errors:
                continue
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except Exception as exc:  # noqa: BLE001 — keep benching
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                continue
            timings[name] = round(time.perf_counter() - t0, 4)
        return timings

    cold = run_pass()
    passes = [run_pass() for _ in range(n_warm)]
    warm = {
        name: round(min(p[name] for p in passes if name in p), 4)
        for name in passes[0]
    }
    out = {
        "metric": "duckdb_headline_total_wall",
        "value": round(sum(warm.values()), 4),
        "unit": "sec",
        "queries": warm,
        "cold_total_sec": round(sum(cold.values()), 4),
        "sf_dir": sf_dir,
    }
    if excluded:
        out["excluded"] = excluded
    if n_warm != 3:
        out["warm_passes"] = n_warm
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
