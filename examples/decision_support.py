#!/usr/bin/env python
"""Decision-support example: run the adapted TPC-H pack end to end and print
each query's row count and wall time — the "switching user's" smoke test for
the classic multi-join analytics surface.

    python examples/decision_support.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.registry import all_queries  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("decision-support")
    qs = all_queries()
    total = 0.0
    for name in sorted(n for n in qs if n.startswith("q_tpch")):
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name:14s} {len(rows):6d} rows  {dt * 1000:8.1f} ms")
    print(f"{'total':14s} {'':6s}       {total * 1000:8.1f} ms")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
