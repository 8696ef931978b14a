"""Profile the q_llm_dedup_incremental cold-start spike (VERDICT r11 #2).

Three rounds of drift adjudication (r9/r10/r11) blamed the recurring
16-23 s first sample (vs ~4 s steady at sf0.1) on host/JIT state without
ever measuring WHERE the cold run spends its extra time. This tool does:
one fresh bench-matching JVM, four back-to-back runs of the query with
``release_all()`` between them (run 1 is the TRUE cold run — no warm-up),
and for every run records

  * wall seconds, and the per-run span start → first stage submission
    (driver-side analysis/optimization/codegen happens in that gap);
  * every stage's wall, executorRunTime, executorCpuTime, jvmGcTime and
    executorDeserializeTime from the UI REST API (stages are attributed
    to runs by stage-id watermark; names repeat across runs, so the
    cold-vs-steady delta aggregates by stage name);
  * the JVM's cumulative JIT compilation time and loaded-class count
    (java.lang.management MXBeans) sampled around each run — the direct
    evidence for (or against) the "cold = JIT/codegen" hypothesis.

Usage: python tools/profile_cold_incremental.py [--out FILE] [--runs N]
         [--query NAME] [--sf-dir DIR]

Writes PROFILE_incremental_r12.json by default; BASELINE.md's cold-start
note quotes its numbers.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

UI_PORT = 4049


def _ts(s: str) -> float:
    # REST timestamps render like '2026-08-16T16:27:32.955GMT'
    return _dt.datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


def _stages(app_id: str) -> list:
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url) as resp:
        return json.load(resp)


def _stage_row(s: dict) -> dict:
    wall = _ts(s["completionTime"]) - _ts(s["submissionTime"])
    return {
        "stage_id": s["stageId"],
        "name": s["name"].splitlines()[0][:80],
        "tasks": s["numTasks"],
        "wall_s": round(wall, 3),
        "run_time_s": round(s["executorRunTime"] / 1e3, 3),
        "cpu_time_s": round(s["executorCpuTime"] / 1e9, 3),
        "gc_s": round(s["jvmGcTime"] / 1e3, 3),
        "deser_s": round(s["executorDeserializeTime"] / 1e3, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE_incremental_r12.json")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--query", default="q_llm_dedup_incremental")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")  # REST API is the profiler
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from mapreduce_machine_learning_spark.registry import all_queries
    from mapreduce_machine_learning_spark import runtime as engine_runtime

    fn = all_queries()[args.query]
    mgmt = spark._jvm.java.lang.management.ManagementFactory
    jit = mgmt.getCompilationMXBean()
    cls = mgmt.getClassLoadingMXBean()

    runs = []
    seen_stage_max = -1
    for i in range(args.runs):
        engine_runtime.release_all()
        spark.sparkContext.setJobDescription(f"profile run {i}")
        jit0, cls0 = jit.getTotalCompilationTime(), cls.getLoadedClassCount()
        t0 = time.perf_counter()
        wall0 = time.time()
        fn(spark, args.sf_dir).collect()
        wall = time.perf_counter() - t0
        jit1, cls1 = jit.getTotalCompilationTime(), cls.getLoadedClassCount()
        # stage attribution by id watermark: every stage first seen after
        # this run's collect belongs to it (the session runs nothing else)
        time.sleep(0.5)  # let the status store settle
        mine = [
            s for s in _stages(app_id) if s["stageId"] > seen_stage_max
        ]
        if mine:
            seen_stage_max = max(s["stageId"] for s in mine)
        rows = sorted(
            (_stage_row(s) for s in mine), key=lambda r: -r["wall_s"]
        )
        first_sub = min((_ts(s["submissionTime"]) for s in mine), default=wall0)
        runs.append(
            {
                "run": i,
                "kind": "cold" if i == 0 else "steady",
                "wall_s": round(wall, 3),
                "pre_stage_gap_s": round(max(0.0, first_sub - wall0), 3),
                "jit_compile_ms": jit1 - jit0,
                "classes_loaded": cls1 - cls0,
                "n_stages": len(rows),
                "stage_wall_sum_s": round(sum(r["wall_s"] for r in rows), 3),
                "run_time_sum_s": round(sum(r["run_time_s"] for r in rows), 3),
                "gc_sum_s": round(sum(r["gc_s"] for r in rows), 3),
                "deser_sum_s": round(sum(r["deser_s"] for r in rows), 3),
                "stages": rows,
            }
        )
        print(
            f"run {i}: wall {wall:.2f}s  gap {runs[-1]['pre_stage_gap_s']:.2f}s  "
            f"jit {jit1 - jit0}ms  classes +{cls1 - cls0}  "
            f"stage-wall {runs[-1]['stage_wall_sum_s']:.2f}s",
            file=sys.stderr,
        )

    # cold-vs-steady per-stage-name delta: where did the extra wall go?
    def by_name(run):
        acc: dict = {}
        for r in run["stages"]:
            acc[r["name"]] = acc.get(r["name"], 0.0) + r["wall_s"]
        return acc

    cold, last = by_name(runs[0]), by_name(runs[-1])
    deltas = sorted(
        (
            {
                "stage": k,
                "cold_wall_s": round(v, 3),
                "steady_wall_s": round(last.get(k, 0.0), 3),
                "delta_s": round(v - last.get(k, 0.0), 3),
            }
            for k, v in cold.items()
        ),
        key=lambda d: -d["delta_s"],
    )
    out = {
        "query": args.query,
        "sf_dir": args.sf_dir,
        "master": f"local[{cpus}]",
        "runs": runs,
        "cold_vs_last_by_stage": deltas[:20],
        "summary": {
            "cold_wall_s": runs[0]["wall_s"],
            "steady_wall_s": [r["wall_s"] for r in runs[1:]],
            "cold_jit_ms": runs[0]["jit_compile_ms"],
            "steady_jit_ms": [r["jit_compile_ms"] for r in runs[1:]],
            "cold_classes": runs[0]["classes_loaded"],
            "cold_pre_stage_gap_s": runs[0]["pre_stage_gap_s"],
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"]))
    spark.stop()


if __name__ == "__main__":
    main()
