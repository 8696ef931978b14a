"""Executor-loss resilience probe (round 7; multi-scenario since round 8).

At 1000 executors, losing an executor mid-query is routine (preemption,
OOM-kills, hardware). Spark's contract is lineage-based recovery: lost
shuffle outputs are recomputed and the job completes with the same
answer. This probe exercises that contract for real instead of citing
it: under ``local-cluster[2,8,4096]`` (two separate executor JVMs) it
runs a query, SIGKILLs one executor JVM mid-flight, lets the job finish,
and compares the post-kill result to the unperturbed run row-for-row.

Round-8 extension (VERDICT r7 #7): one kill per failure surface, all in
one invocation —

  * ``q_llm_neardup_pairs`` at a fixed early offset (the round-7 case:
    kill during the signature/banding map stages);
  * ``q_join_multi`` at ~half its measured baseline wall, aiming at a
    REDUCE stage mid shuffle-fetch (losing the executor also loses its
    map outputs, forcing Spark to re-run map tasks, not just the dead
    reducer — the expensive recovery path);
  * ``q_llm_sim_threshold`` at ~half baseline, aiming at the Arrow
    ``applyInPandas`` stage (a Python worker dies WITH its executor; the
    retry must re-ship the serialized UDF and re-spawn workers).

Aim is attributed, not assumed: the killer thread samples
``statusTracker().getActiveStageIds()`` + per-stage task counts
immediately before the SIGKILL and the artifact records them, so a kill
that landed outside the intended stage is visible in the row.

Output: one JSON artifact with one row per scenario — kill timing (must
land inside the query window to count), active stages at kill, executor
PIDs before/after (the standalone worker respawns a replacement), and
exact result equality. Exit 0 only if EVERY scenario's kill landed
in-window and returned rows identical to its unperturbed baseline.

Usage: python tools/fault_probe.py [--scenarios q1:1.5,q2:auto,...]
         [--sf-dir /root/testdata/sf0.1] [--out FAULT_probe.json]
       (``auto`` = 0.5 x that query's measured baseline wall)
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

# scenario spec: name[:kill_after[:sf_dir[:min_tasks[:all]]]] — kill_after
# "auto" = 0.5 x measured warm baseline wall; min_tasks restricts the
# busy-poll to stages with at least that many tasks (16 selects the
# spark.sql.shuffle.partitions-wide REDUCE stage of q_join_multi — mid
# shuffle-fetch — over its 9-task x16 parquet scan). The two short
# flagships run on the x16 scaling corpus (tools/gen_scaling_corpus.py):
# at sf0.1 their reduce/Arrow stages complete in sub-50 ms task waves the
# poll cannot catch, so a "while tasks active" kill needs stages that
# last whole seconds. q_llm_sim_threshold gets a FIXED early offset: its
# wall keeps dropping across warm runs (Arrow-kernel tiering), so a
# half-of-baseline offset can overshoot the killed run entirely.
# the Arrow scenario kills EVERY live executor (5th field "all"): with two
# executors a single kill has even odds of hitting the idle one, but
# killing both guarantees the in-flight Arrow task (and its Python worker)
# dies with its executor — the stage must be resubmitted onto respawned
# executors with the UDF re-shipped.
# media_extract_features (round 9) is a PSEUDO-query over the codec-real
# synthetic media table: a mapInPandas stage whose Python workers decode
# BMP/PNG/JPEG/WAV/AVI payloads — killing every executor mid-stage proves
# the new codec path recovers like any other Arrow stage (workers die with
# their executors, the stage resubmits onto respawned ones, features are
# per-payload-deterministic so the recomputed rows must match exactly).
DEFAULT_SCENARIOS = (
    "q_llm_neardup_pairs:1.5,"
    "q_join_multi:auto:.scaling/x16:16,"
    "q_llm_sim_threshold:1.0:.scaling/x16:1:all,"
    "media_extract_features:0.6::1:all"
)


def _media_extract_features(spark, sf_dir):
    """Pseudo-query for the media fault scenario: 6k codec-real payloads
    (ignores sf_dir — the table is synthesized, like the tests')."""
    from mapreduce_machine_learning_spark.sources.multimodal import (
        extract_features,
        synth_media_real,
    )

    return extract_features(synth_media_real(spark, 6000).repartition(16))


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


def wait_for_executors(app_id: str, n: int, timeout_s: float = 60.0) -> list[int]:
    """Block until the standalone worker has respawned to >= n live
    executor JVMs — scenario k+1 must not start one-armed because
    scenario k's kill is still being replaced."""
    deadline = time.time() + timeout_s
    pids = executor_pids(app_id)
    while len(pids) < n and time.time() < deadline:
        time.sleep(0.5)
        pids = executor_pids(app_id)
    return pids


def active_stages(sc) -> list[dict]:
    tracker = sc.statusTracker()
    out = []
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info is None:
            continue
        out.append(
            {
                "stage_id": sid,
                "name": info.name,
                "num_tasks": info.numTasks,
                "active_tasks": info.numActiveTasks,
                "completed_tasks": info.numCompletedTasks,
            }
        )
    return out


def run_scenario(
    spark,
    q,
    name: str,
    sf_dir: str,
    kill_after,
    app_id: str,
    min_tasks: int = 1,
    kill_all: bool = False,
) -> dict:
    from mapreduce_machine_learning_spark import runtime

    # two baseline passes: the first warms JIT/codegen (measured 2.3x on
    # the Arrow pipeline), the SECOND gives the wall the killed run will
    # actually have — an auto kill offset computed from a cold wall can
    # land after the warm killed run already finished
    runtime.release_all()
    q(spark, sf_dir).collect()
    runtime.release_all()
    t_base = time.time()
    baseline = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    baseline_wall = time.time() - t_base
    delay = (
        max(0.3, 0.5 * baseline_wall) if kill_after == "auto" else float(kill_after)
    )
    runtime.release_all()
    pids_before = wait_for_executors(app_id, 2)

    state: dict = {}
    sc = spark.sparkContext
    done = threading.Event()

    def _kill():
        # after the offset, WAIT for a stage with actively-running tasks
        # (poll 50 ms, up to 10 s): a fixed-delay kill can land in the gap
        # between stages, which recovers trivially and attributes nothing.
        # Killing while tasks run is the claim the artifact makes — for
        # the reduce-side scenarios the busy stage's task count equals
        # spark.sql.shuffle.partitions, distinguishing it from the 1-2
        # task parquet scan stages. If the query finishes first, ABORT:
        # killing an idle executor between queries proves nothing and the
        # row must show the miss, not mask it.
        time.sleep(delay)
        deadline = time.time() + 10.0
        stages = active_stages(sc)
        while time.time() < deadline and not done.is_set():
            if any(
                s["active_tasks"] > 0 and s["num_tasks"] >= min_tasks
                for s in stages
            ):
                break
            time.sleep(0.05)
            stages = active_stages(sc)
        if done.is_set():
            state["kill_skipped_query_finished"] = True
            return
        pids = executor_pids(app_id)
        if pids:
            targets = pids if kill_all else pids[:1]
            state["stages_at_kill"] = stages
            state["tasks_active"] = any(s["active_tasks"] > 0 for s in stages)
            state["killed_pids"] = targets
            state["kill_t"] = time.time()
            for pid in targets:
                try:
                    os.kill(pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass

    killer = threading.Thread(target=_kill)
    killer.start()
    t0 = time.time()
    rows = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    t1 = time.time()
    done.set()
    killer.join()

    kill_inside = "kill_t" in state and t0 <= state["kill_t"] <= t1
    return {
        "query": name,
        "sf_dir": sf_dir,
        "kill_after_s": round(delay, 3),
        "min_tasks_target": min_tasks,
        "kill_all_executors": kill_all,
        "executor_pids_before": pids_before,
        "killed_pids": state.get("killed_pids", []),
        "kill_landed_inside_query_window": kill_inside,
        "kill_landed_while_tasks_active": state.get("tasks_active", False),
        "stages_active_at_kill": state.get("stages_at_kill", []),
        "query_wall_s_with_kill": round(t1 - t0, 3),
        "baseline_wall_s": round(baseline_wall, 3),
        "n_rows": len(rows),
        "results_identical_to_unperturbed_run": rows == baseline,
        "executor_pids_after": executor_pids(app_id),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", default=DEFAULT_SCENARIOS)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
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

    qs = dict(all_queries())
    qs["media_extract_features"] = _media_extract_features
    scenarios = []
    for spec in args.scenarios.split(","):
        parts = spec.strip().split(":")
        name = parts[0]
        if name not in qs:
            ap.error(f"unknown query {name!r}")
        kill_after = parts[1] if len(parts) > 1 and parts[1] else "auto"
        sf_dir = parts[2] if len(parts) > 2 and parts[2] else args.sf_dir
        min_tasks = int(parts[3]) if len(parts) > 3 and parts[3] else 1
        kill_all = len(parts) > 4 and parts[4] == "all"
        scenarios.append((name, kill_after, sf_dir, min_tasks, kill_all))

    app_id = spark.sparkContext.applicationId
    rows = []
    runtime.plan_audit_mode(True)  # caches off: every run recomputes fully
    try:
        for name, kill_after, sf_dir, min_tasks, kill_all in scenarios:
            rec = run_scenario(
                spark, qs[name], name, sf_dir, kill_after, app_id, min_tasks, kill_all
            )
            rows.append(rec)
            print(json.dumps(rec, indent=1), flush=True)
    finally:
        runtime.plan_audit_mode(False)

    ok = all(
        r["results_identical_to_unperturbed_run"]
        and r["kill_landed_inside_query_window"]
        for r in rows
    )
    result = {"master": "local-cluster[2,8,4096]", "all_ok": ok, "scenarios": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out} all_ok={ok}", flush=True)
    spark.stop()
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
