#!/usr/bin/env python
"""Time every registered query at a given scale factor (default sf0.1) and
print the slowest first — the scale-sanity loop: a query that is 10× slower
than its peers at sf0.1 has a plan problem that 100 TB will amplify.

    python tools/time_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    from pyspark.sql import SparkSession

    from mapreduce_machine_learning_spark.registry import all_queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # session warm-up so the alphabetically-first query doesn't absorb JVM
    # spin-up, codegen-compiler and parquet-footer costs in its number
    qs[sorted(qs)[0]](spark, sf_dir).collect()
    times: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        times[name] = time.perf_counter() - t0
    total = sum(times.values())
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{dt * 1000:9.1f} ms  {name}")
    print(f"{total:9.1f} s   total ({len(times)} queries, {sf_dir})")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
