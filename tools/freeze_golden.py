#!/usr/bin/env python
"""Freeze per-query golden hashes at sf0.01 (SURVEY §5.2 item 7) into
tests/golden.json — regression detection without DuckDB in the loop.

Run after a green differential-oracle sweep:  python tools/freeze_golden.py

Incremental mode (merge new/changed queries into the existing file without
re-running all of them):  python tools/freeze_golden.py --only q_a q_b
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import SparkSession

    from mapreduce_machine_learning_spark.registry import all_queries
    from tests.parity import result_hash, fingerprint_testdata

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    argv = sys.argv[1:]
    if argv and argv[0] == "--only":
        only = set(argv[1:])
        if not only:
            raise SystemExit("--only requires at least one query id")
    elif argv:
        raise SystemExit(f"unexpected arguments {argv!r}; usage: "
                         "freeze_golden.py [--only q_a q_b ...]")
    else:
        only = None
    out = os.path.join(ROOT, "tests", "golden.json")
    golden = {}
    if only is not None and os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
        # Refuse to mix hashes frozen on different datasets: the untouched
        # entries' fingerprint must match the data we are about to hash.
        current_fp = fingerprint_testdata(SF_DIR)
        if existing.get("fingerprint") != current_fp:
            raise SystemExit(
                "testdata fingerprint changed since golden.json was frozen "
                f"({existing.get('fingerprint')!r} != {current_fp!r}); "
                "run a full refreeze instead of --only"
            )
        golden = existing["queries"]
        unknown = only - set(all_queries())
        if unknown:
            raise SystemExit(f"unknown query ids: {sorted(unknown)}")
    for name, fn in sorted(all_queries().items()):
        if only is not None and name not in only:
            continue
        df = fn(spark, SF_DIR)
        n, h = result_hash(df.columns, [tuple(r) for r in df.collect()])
        golden[name] = {"rows": n, "hash": h}
        print(f"{name}: rows={n} hash={h[:12]}")
    payload = {"fingerprint": fingerprint_testdata(SF_DIR), "queries": golden}
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {out} ({len(golden)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
