"""Targeted oracle-parity check for optimization work: run the named
queries against their DuckDB oracles with the driver's compare semantics
at one or more SF dirs.

Usage: python tests/opt_verify.py q1 [q2 ...] [--sf sf0.001,sf0.01,sf0.1]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = []
    sfs = ["sf0.001", "sf0.01", "sf0.1"]
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sfs = args[i + 1].split(",")
            i += 2
        else:
            names.append(args[i])
            i += 1

    import duckdb

    from ducklakexl_spark import queries as qmod
    from ducklakexl_spark.session import get_spark
    from tests.compare import compare

    qmod.load_all()
    spark = get_spark(app_name="opt_verify")
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            sf_dir = sf  # allow full paths like /root/scale/sf1
            if not os.path.isdir(sf_dir):
                print(f"{sf}: missing, skipped")
                continue
        con = duckdb.connect()
        con.execute(f"SET temp_directory='/tmp/duckspill_{os.getpid()}'")
        for t in qmod.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            fn = qmod.QUERIES.get(name)
            osql = qmod.ORACLES.get(name)
            if fn is None or osql is None:
                print(f"{name}: NOT REGISTERED")
                bad += 1
                continue
            try:
                compare(fn(spark, sf_dir), con, osql, name=name)
                ok, msg = True, ""
            except Exception as exc:  # noqa: BLE001
                ok, msg = False, f"{type(exc).__name__}: {exc}"[:300]
            print(f"{sf} {name}: {'EXACT' if ok else 'FAIL ' + str(msg)}")
            bad += 0 if ok else 1
            qmod.clear_plan_caches()
        con.close()
    print(f"{'ALL EXACT' if bad == 0 else f'{bad} FAILURES'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
