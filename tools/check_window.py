"""Pre-flight the next driver correctness window.

Replays the driver's t2 differential-oracle compare (tests/parity.py) at
sf0.01 for exactly the queries the driver will check this round: the first
N entries of the registry's driver order. The registry already sorts
never-green queries first and — once the tail drained (round 7) — the
recheck buckets (RECHECK_PRIORITY flagships, then contract queries in §2
order), so the head of the order IS the window in both eras; filtering to
never-green entries here (the pre-round-8 logic) would leave an empty
window forever.

Usage: python tools/check_window.py [N]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from mapreduce_machine_learning_spark import registry
from mapreduce_machine_learning_spark.io import duckdb_connect
from tests.parity import assert_parity

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    window = list(queries)[:n]
    print(f"window of {len(window)}: {window[0]} .. {window[-1]}", flush=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("mrml-spark-check-window")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(SF_DIR)
    failed = []
    for i, name in enumerate(window):
        t0 = time.time()
        try:
            sql = oracles.get(name)
            if sql is None:
                rows = queries[name](spark, SF_DIR).collect()
                assert rows is not None
                status = "rows-only"
            else:
                assert_parity(spark, name, queries[name], sql, SF_DIR, con)
                status = "ok"
        except Exception as exc:  # noqa: BLE001 — report and continue
            status = f"FAIL {type(exc).__name__}: {exc}"
            failed.append(name)
        print(f"[{i + 1:2d}/{len(window)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"done: {len(window) - len(failed)}/{len(window)} ok; failed={failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
