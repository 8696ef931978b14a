"""Round-end verify: drive the full __spark_entry__ contract against the
DuckDB oracle at sf0.01 (the driver's t2 protocol), optionally under the
adversarial partition layout (7 shuffle partitions, AQE off) that scrambles
FP addition order relative to both the default session and DuckDB — the
partition-robustness check .claude/skills/verify/SKILL.md requires before
shipping any rounding-policy change.

The third mode, `localcluster`, runs the same sweep under
`local-cluster[2,4,4096]` — two REAL executor JVMs with serialized task
dispatch, network shuffle fetch, and per-executor memory, the closest a
single box gets to multi-machine deployment. It upgrades the
"multi-executor behavior is a design argument" gap to a measured result:
every oracle answer must be identical when the shuffle actually crosses
process boundaries.

The fourth mode, `arrowbatch`, fragments every Arrow transfer into 7-row
batches (`spark.sql.execution.arrow.maxRecordsPerBatch=7`) — the
adversarial axis for Python kernels: `mapInPandas` surfaces must not
assume one batch spans a partition. (`applyInPandas` groups arrive whole
by contract either way.)

Usage: python tools/verify_sweep.py [default|adversarial|localcluster|arrowbatch]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SF = "/root/testdata/sf0.01"


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    if mode not in ("default", "adversarial", "localcluster", "arrowbatch"):
        raise SystemExit(f"unknown mode {mode!r}")
    from pyspark.sql import SparkSession

    if mode == "arrowbatch":
        b = (
            SparkSession.builder.master("local[16]")
            .appName("mrml-verify-arrowbatch")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
            .config("spark.ui.enabled", "false")
        )
    elif mode == "localcluster":
        b = (
            SparkSession.builder.master("local-cluster[2,4,4096]")
            .appName("mrml-verify-localcluster")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
        )
    elif mode == "adversarial":
        b = (
            SparkSession.builder.master("local[16]")
            .appName("mrml-verify-adversarial")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.sql.adaptive.enabled", "false")
            .config("spark.ui.enabled", "false")
        )
    else:
        # bare session: probes that io.prepare self-configures at runtime
        b = SparkSession.builder.master("local[8]").config(
            "spark.ui.enabled", "false"
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from mapreduce_machine_learning_spark.io import duckdb_connect
    from tests.parity import assert_parity

    con = duckdb_connect(SF)
    qs, oracles = e.queries(), e.oracle_sql()
    fails = []
    t_start = time.time()
    for i, (name, fn) in enumerate(sorted(qs.items())):
        t0 = time.time()
        try:
            if name not in oracles:
                n = len(fn(spark, SF).collect())
                status = f"rows-only: {n} rows"
            else:
                assert_parity(spark, name, fn, oracles[name], SF, con)
                status = "MATCH"
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            status = f"FAIL {type(ex).__name__}: {str(ex)[:300]}"
        print(
            f"[{i + 1}/{len(qs)}] {name}: {status} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    n_entry = len(e.entry(spark).collect())
    print(
        f"mode={mode} entry_rows={n_entry} fails={len(fails)} {fails} "
        f"total={time.time() - t_start:.0f}s",
        flush=True,
    )
    return 1 if fails or n_entry <= 0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
