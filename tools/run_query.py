#!/usr/bin/env python
"""Run any registered query by name — the engine's ad-hoc CLI.

    python tools/run_query.py q_agg_group
    python tools/run_query.py q_join_multi --sf /root/testdata/sf0.1 --explain
    python tools/run_query.py --list
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query id (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001", help="sf dir")
    ap.add_argument("--explain", action="store_true", help="print the plan")
    ap.add_argument("--oracle", action="store_true", help="also run DuckDB twin")
    ap.add_argument("--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--list", action="store_true", help="list query ids")
    args = ap.parse_args()

    from mapreduce_machine_learning_spark.registry import all_oracles, all_queries

    qs, oracles = all_queries(), all_oracles()
    if args.list or not args.name:
        for n in sorted(qs):
            print(f"{n}  [{'oracle' if n in oracles else 'rows-only'}]")
        return
    if args.name not in qs:
        sys.exit(f"unknown query {args.name!r} — try --list")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    t0 = time.perf_counter()
    df.show(args.rows, truncate=False)
    print(f"[{args.name}] {time.perf_counter() - t0:.3f}s at {args.sf}")
    if args.oracle and args.name in oracles:
        from mapreduce_machine_learning_spark.io import duckdb_connect

        con = duckdb_connect(args.sf)
        print("--- DuckDB oracle ---")
        print(con.execute(oracles[args.name]).fetchdf().head(args.rows))
    spark.stop()


if __name__ == "__main__":
    main()
