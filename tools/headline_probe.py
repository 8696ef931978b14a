"""Fresh-JVM probe of the six BASELINE.md headline queries (VERDICT r5 #3).

Purpose: settle bench-level attribution across rounds. bench.py times all six
queries inside ONE shared session, so a cross-round level shift can be either
a real plan regression or host drift (BASELINE.md "Machine-variance note
(round 5)" documents a 1.6x same-code session-to-session swing). This tool
applies the SCALING protocol instead — one fresh JVM subprocess per query,
one warm run, four cold-timed runs, MEDIAN carries the number, every sample
recorded — which removes the two measured confounders on this box
(cross-query JIT/code-cache/heap accumulation within a session, and
spike-hostage single samples).

Run it at the start and end of a round and record both dated rows in
BASELINE.md's variance note: if the fresh-JVM medians sit at the historical
level while bench.py's shared-session number moved, the shift is host/session
state, not the plans.

Usage:
  python tools/headline_probe.py [--out HEADLINE_probe.json]
  python tools/headline_probe.py --inner --query q_agg_group   (one JVM)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

# import the bench module's canonical list so the probe can never drift from
# the judge-facing set (pinned by tests/test_bench_config.py)
from bench import HEADLINE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def inner(name: str) -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_PROBE_MASTER overrides the master (e.g.
    # local-cluster[2,16,8192] to time the same fresh-JVM protocol under
    # two real executor JVMs — the serialization/shuffle-fetch tax A/B)
    master = os.environ.get("SPARK_GRAFT_PROBE_MASTER", f"local[{cpus}]")
    spark = (
        SparkSession.builder.master(master)
        .appName(f"mrml-headline-probe-{name}")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_machine_learning_spark import runtime
    from mapreduce_machine_learning_spark.registry import all_queries

    q = all_queries()[name]
    q(spark, SF_DIR).collect()  # warm: JIT tiers, codegen, parquet footers
    samples = []
    for _ in range(4):
        # headline queries are timed warm-cache in bench.py; match that —
        # do NOT release between runs, only before the warm run above
        t0 = time.perf_counter()
        q(spark, SF_DIR).collect()
        samples.append(round(time.perf_counter() - t0, 4))
    runtime.release_all()
    print(
        "RESULT "
        + json.dumps(
            {
                "query": name,
                "median_s": round(statistics.median(samples), 4),
                "samples_s": samples,
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--query", default=None)
    ap.add_argument("--out", default="HEADLINE_probe.json")
    args = ap.parse_args()

    if args.inner:
        inner(args.query)
        return

    results = []
    for name in HEADLINE:
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--inner", "--query", name],
                capture_output=True,
                text=True,
                timeout=900,
            )
        except subprocess.TimeoutExpired as exc:
            # record the failure and keep the already-collected points
            # (ADVICE r5: a raised timeout must not lose the whole sweep)
            results.append({"query": name, "error": f"timeout: {exc}"})
            _write(args.out, results)
            continue
        recs = [
            json.loads(l[len("RESULT ") :])
            for l in proc.stdout.splitlines()
            if l.startswith("RESULT ")
        ]
        if not recs:
            results.append(
                {"query": name, "error": proc.stderr[-1000:] or "no output"}
            )
        else:
            results.extend(recs)
            print(json.dumps(recs[-1]), flush=True)
        _write(args.out, results)  # incremental: partial runs keep their data
    total, incomplete = summarize(results)
    if incomplete:
        print("fresh-JVM headline total: INCOMPLETE (errored query)", flush=True)
    else:
        print(f"fresh-JVM headline total (sum of medians): {total} s", flush=True)
    _write(args.out, results, total, incomplete)


def summarize(results: list) -> tuple[float | None, bool]:
    """(total_s, incomplete). A probe with an errored/timed-out query must
    not report a smaller "fresh-JVM total" that reads as a fast host state
    (ADVICE r6): the total is only meaningful when every headline query
    contributed, so any error row nulls it and flags the run. Completeness
    is POSITIVE, not just absence-of-error rows (ADVICE r7): an empty or
    partial results list — a probe that never recorded some query at all —
    must read incomplete too, or it reports an impossibly fast 0 s host."""
    measured = {r.get("query") for r in results if "median_s" in r}
    incomplete = any("error" in r for r in results) or measured != set(HEADLINE)
    if incomplete:
        return None, True
    return round(sum(r["median_s"] for r in results if "median_s" in r), 4), False


def _write(
    out: str, results: list, total: float | None = None, incomplete: bool = True
) -> None:
    with open(out, "w") as f:
        json.dump(
            {"total_s": total, "incomplete": incomplete, "results": results},
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
