#!/usr/bin/env python
"""OLAP example: the flagship TPC-H-Q1-style pricing summary plus a couple of
neighboring analyses, printed to stdout.

    python examples/pricing_summary.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.registry import all_queries  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("pricing-summary")
    qs = all_queries()
    for name in ("q_agg_group", "q_join_multi", "q_win_rank"):
        print(f"\n=== {name} ===")
        qs[name](spark, sf_dir).show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
