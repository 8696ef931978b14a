"""Executor-loss resilience probe (round 7).

At 1000 executors, losing an executor mid-query is routine (preemption,
OOM-kills, hardware). Spark's contract is lineage-based recovery: lost
shuffle outputs are recomputed and the job completes with the same
answer. This probe exercises that contract for real instead of citing
it: under ``local-cluster[2,8,4096]`` (two separate executor JVMs) it
runs a flagship query, SIGKILLs one executor JVM mid-flight, lets the
job finish, and compares the post-kill result to the unperturbed run
row-for-row.

Output: one JSON artifact recording the kill timing (must land inside
the query window to count), the executor PIDs before/after (the
standalone worker respawns a replacement), and exact result equality.

Usage: python tools/fault_probe.py [--query q_llm_neardup_pairs]
         [--sf-dir /root/testdata/sf0.1] [--kill-after 1.5]
         [--out FAULT_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def executor_pids(app_id: str) -> list[int]:
    # scope to THIS application's executors (the --app-id flag in the
    # backend cmdline): an unscoped pgrep could SIGKILL an executor
    # belonging to a concurrently running Spark session
    out = subprocess.run(
        ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*{app_id}"],
        capture_output=True,
        text=True,
    ).stdout
    return sorted(int(p) for p in out.split())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="q_llm_neardup_pairs")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--kill-after", type=float, default=1.5)
    ap.add_argument("--out", default="FAULT_probe.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local-cluster[2,8,4096]")
        .appName("mrml-fault-probe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_machine_learning_spark import runtime
    from mapreduce_machine_learning_spark.registry import all_queries

    q = all_queries()[args.query]
    runtime.plan_audit_mode(True)  # caches off: the query recomputes fully
    try:
        t_base = time.time()
        baseline = sorted(tuple(r) for r in q(spark, args.sf_dir).collect())
        baseline_wall = time.time() - t_base
        app_id = spark.sparkContext.applicationId
        pids_before = executor_pids(app_id)

        state: dict = {}

        def _kill():
            time.sleep(args.kill_after)
            pids = executor_pids(app_id)
            if pids:
                state["killed_pid"] = pids[0]
                state["kill_t"] = time.time()
                os.kill(pids[0], signal.SIGKILL)

        killer = threading.Thread(target=_kill)
        killer.start()
        t0 = time.time()
        rows = sorted(tuple(r) for r in q(spark, args.sf_dir).collect())
        t1 = time.time()
        killer.join()
    finally:
        runtime.plan_audit_mode(False)

    kill_inside = (
        "kill_t" in state and t0 <= state["kill_t"] <= t1
    )
    rec = {
        "query": args.query,
        "sf_dir": args.sf_dir,
        "master": "local-cluster[2,8,4096]",
        "executor_pids_before": pids_before,
        "killed_pid": state.get("killed_pid"),
        "kill_landed_inside_query_window": kill_inside,
        "query_wall_s_with_kill": round(t1 - t0, 3),
        "baseline_wall_s": round(baseline_wall, 3),
        "n_rows": len(rows),
        "results_identical_to_unperturbed_run": rows == baseline,
        "executor_pids_after": executor_pids(app_id),
    }
    print(json.dumps(rec, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    spark.stop()
    raise SystemExit(
        0 if (rec["results_identical_to_unperturbed_run"] and kill_inside) else 1
    )


if __name__ == "__main__":
    main()
