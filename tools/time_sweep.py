#!/usr/bin/env python
"""Time every registered query at a given scale factor (default sf0.1) and
print the slowest first — the scale-sanity loop: a query that is 10× slower
than its peers at sf0.1 has a plan problem that 100 TB will amplify.

Memo-fill attribution (VERDICT r13 #7): several queries share session-memo
intermediates (the MinHash band table, ANN signatures — runtime.py), and the
alphabetically-first consumer used to absorb the whole fill in its number
(q_graph_components read 15.9 s in-sweep vs 0.55 s warm). Now, when a query's
run GROWS the session memo, it is re-run immediately with the memo warm: the
second run is the query's OWN ranked cost, and the first-minus-second delta
is charged to a separate `memo_fill` line (the delta also contains that
query's JIT/codegen warm-up — acceptable for a ranking tool, stated here so
nobody reads the fill line as pure cache cost). Queries that fill nothing
run once, exactly as before.

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

    from mapreduce_machine_learning_spark import runtime
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
    fills: list[tuple[str, float, int]] = []  # (query, fill_s, new keys)
    for name in sorted(qs):
        n0 = runtime.memo_count()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        first = time.perf_counter() - t0
        new_keys = runtime.memo_count() - n0
        if new_keys:
            # this run filled shared memo entries: re-run with them warm
            # and rank the query by its OWN cost
            t1 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            own = time.perf_counter() - t1
            times[name] = own
            fills.append((name, max(0.0, first - own), new_keys))
        else:
            times[name] = first
    memo_fill_s = sum(f for _, f, _ in fills)
    total = sum(times.values()) + memo_fill_s
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{dt * 1000:9.1f} ms  {name}")
    print(
        f"{memo_fill_s * 1000:9.1f} ms  memo_fill"
        f" (shared session-memo fill + first-touch JIT, charged separately)"
    )
    for name, fill, keys in sorted(fills, key=lambda kv: -kv[1]):
        print(f"    fill {fill * 1000:9.1f} ms  via {name} ({keys} memo keys)")
    print(f"{total:9.1f} s   total ({len(times)} queries, {sf_dir})")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
