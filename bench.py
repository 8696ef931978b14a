#!/usr/bin/env python
"""BENCH harness (driver-run per round; BASELINE.md is the 2x target).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], one shared SparkSession, one warm-up run + one
timed run per query (BASELINE.md protocol), and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline queries = the BASELINE.md set (SURVEY.md §6), by registry id
HEADLINE = [
    "q_agg_group",      # pricing_summary
    "q_join_multi",     # join3_topk
    "q_win_rank",       # window_rank
    "q_stream_tumble",  # events_tumbling
    "q_agg_global",     # linreg_suffstats
    "q_llm_dedup_exact",  # dedup_exact
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mrml-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_machine_learning_spark.registry import all_queries

    queries = all_queries()
    active = [n for n in HEADLINE if n in queries]
    # full warm-up pass first: JVM JIT tiers + IO cache + codegen cache are
    # session-global, so per-query-only warmups leave the first timed query
    # paying residual compilation cost
    for name in active:
        queries[name](spark, sf_dir).collect()
    timings: dict[str, float] = {}
    for name in active:
        queries[name](spark, sf_dir).collect()  # per-query warm run
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    # LLM-pipeline chain timings (VERDICT r1 #7): the dedup chain and the
    # similarity-search pair, timed COLD each run — the session memo
    # (_materialize) is cleared first so a timing covers the full
    # signature→banding→verify pipeline, not a cached 1000-row sort.
    # Reported separately from the headline set so `value` stays the
    # BASELINE.md-comparable 6-query total.
    from mapreduce_machine_learning_spark import runtime as engine_runtime

    llm_chain = [
        "q_llm_minhash",
        "q_llm_neardup_pairs",
        "q_ml_knn",
        "q_llm_ann_knn",
        "q_llm_ann_ivf_knn",
        "q_llm_dedup_incremental",
    ]
    def reset_memo() -> None:
        # actually frees the cached blocks (persist-backed — see
        # runtime.py) so cold timings don't run under leftover storage
        # pressure from the previous chain query
        engine_runtime.release_all()

    extra: dict[str, float] = {}
    for name in llm_chain:
        if name not in queries:
            continue
        reset_memo()
        queries[name](spark, sf_dir).collect()  # warm (JIT/IO), then cold-time
        reset_memo()
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        extra[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_warm",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "llm_pipeline": extra,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
