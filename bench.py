"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the scale-representative queries (scans, joins, aggs,
windows, dedup-LSH, similarity) — intentionally excluding the
quadratic-by-design correctness baselines (dedup_ngram_jaccard,
dedup_simhash pairing, sim_near_dup_pairs at full width).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q10_returned_items",
    "join_inner_agg",
    "agg_count_distinct",
    "agg_rollup",
    "window_topk_per_group",
    "window_running_sum",
    "sessionize_events",
    "subquery_exists_correlated",
    "percentile_quantiles",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "sim_bruteforce_topk",
    "sim_lsh_buckets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ducklakexl_spark import queries as qmod
    from ducklakexl_spark.session import get_spark

    qmod.load_all()
    spark = get_spark(app_name="ducklakexl_spark_bench")

    # warm the JVM/codegen path once so per-query numbers measure the
    # engine, not JIT warmup (one SparkSession for the whole run —
    # BASELINE.md's guidance for the 2x envelope)
    qmod.QUERIES["q01_pricing_summary"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qmod.QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
