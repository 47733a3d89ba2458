"""Exploratory (randomized) differential fuzz sweep.

Not collected by pytest — run by hand per work session:

    python tests/fuzz_explore.py [n_per_family] [seed]

Reuses test_fuzz_differential's grammars but draws FRESH random
examples (the CI tests are derandomized for determinism; this is the
search half of the loop).  Divergences print with their statement and
both result sets; every find should be fixed in the engine and pinned
into REGRESSION_STATEMENTS.
"""

from __future__ import annotations

import random
import sys
import tempfile

import duckdb

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import test_fuzz_differential as fz  # noqa: E402
from ducklakexl_spark.engine import DuckLakeSpark  # noqa: E402
from ducklakexl_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else random.randrange(1 << 30)
    print(f"seed={seed} n_per_family={n}")
    rng = random.Random(seed)

    spark = get_spark(app_name="fuzz_explore", master="local[8]",
                      shuffle_partitions=8)
    tmp = tempfile.mkdtemp(prefix="lake_fuzzx_")
    lake = DuckLakeSpark(
        spark=spark, data_path=f"{tmp}/d", local_catalog=f"{tmp}/c"
    )
    con = duckdb.connect()

    families = {
        "expr": lambda: f"SELECT k, {draw(fz._EXPR)} AS r {fz._FROM} ORDER BY k",
        "agg": lambda: (
            f"SELECT {draw(fz._AGGS)} AS r {fz._FROM} "
            f"WHERE coalesce({draw(fz._bool_exprs(1))}, TRUE)"
        ),
        "window": lambda: f"SELECT k, {draw(fz._WINDOWS)} AS r {fz._FROM} ORDER BY k",
        "list": lambda: f"SELECT k, {draw(fz._LIST_EXPRS)} AS r {fz._FROM} ORDER BY k",
        "date": lambda: f"SELECT k, {draw(fz._DATE_EXPRS)} AS r {fz._FROM} ORDER BY k",
    }

    def draw(strategy):
        # hypothesis strategies support .example(); randomize via its
        # internal entropy by reseeding the global Random hypothesis uses
        return strategy.example()

    import hypothesis

    finds: list[str] = []
    checked = 0
    for fam, gen in families.items():
        for i in range(n):
            hypothesis.seed(rng.randrange(1 << 62))
            try:
                stmt = gen()
            except Exception:
                continue
            checked += 1
            try:
                fz._run_both(lake, con, stmt)
            except AssertionError as e:
                finds.append(str(e))
                print(f"\n=== DIVERGENCE [{fam}] ===\n{e}\n")
            except Exception as e:
                # both-engine errors are fine; one-engine errors are finds
                try:
                    con.execute(stmt).fetchall()
                    finds.append(f"spark-only error on: {stmt}\n  {e}")
                    print(f"\n=== SPARK-ONLY ERROR [{fam}] ===\n{stmt}\n{str(e)[:300]}\n")
                except Exception:
                    pass  # duckdb rejects it too — grammar artifact
        print(f"family {fam} done ({checked} total checked, {len(finds)} finds)")
    print(f"\nTOTAL: {checked} checked, {len(finds)} finds")
    return 1 if finds else 0


if __name__ == "__main__":
    sys.exit(main())
