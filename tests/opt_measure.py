"""Round-9 optimization measurement harness (guide §1).

For each named registry query (default: the bench HEADLINE set) this
captures, in ONE session at $SPARK_GRAFT_SF_DIR:

- the ``explain("formatted")`` plan text -> plans/r09/<name>_<tag>.txt
  (tag = argv, "before"/"after"), so plan-shape claims are auditable;
- noop-sink execution time (guide §1.4: computes every column of every
  row, no collect/py4j materialization cost) — min/median of N passes;
- collect() time (the bench methodology) for comparability.

Usage: python tests/opt_measure.py <tag> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), OPT_PASSES (default 5),
       OPT_NO_PLANS=1 to skip plan dumps.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_passes = int(os.environ.get("OPT_PASSES", "5"))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import HEADLINE

    from ducklakexl_spark import queries as qmod
    from ducklakexl_spark.session import get_spark

    qmod.load_all()
    names = sys.argv[2:] or list(HEADLINE)
    spark = get_spark(app_name=f"opt_measure_{tag}")

    plans_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r09")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        fn = qmod.QUERIES.get(name)
        if fn is None:
            out[name] = {"err": "not registered"}
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — keep measuring
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            continue
        if not os.environ.get("OPT_NO_PLANS"):
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"{tag}:{name}")
        rec: dict = {}
        try:
            # pass 0 pays codegen/JIT; not recorded
            df.write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(n_passes):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            rec["noop_min"] = round(ts[0], 4)
            rec["noop_med"] = round(ts[len(ts) // 2], 4)
            cs = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.collect()
                cs.append(time.perf_counter() - t0)
            rec["collect_min"] = round(min(cs), 4)
        except Exception as exc:  # noqa: BLE001 — keep measuring
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
