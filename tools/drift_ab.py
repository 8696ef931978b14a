"""Paired code-A/B: adjudicate a bench flag as HOST DRIFT or CODE REGRESSION.

This box's throughput drifts 1.5-1.9x between sessions on identical code
(BASELINE.md machine-variance notes), and the JVM-side and Python-side
levels drift INDEPENDENTLY (round 7: headline read faster than round 6
while the Arrow-kernel LLM set read ~1.5x slower — on code that a paired
replay proved equivalent). So when bench.py's min-of-steady gate trips,
the flag alone cannot distinguish a plan regression from the host. This
tool settles it the only way that works on a drifting host: run the
flagged queries on the CURRENT tree and on a REFERENCE commit
back-to-back in the same host state, alternated (A,B,B,A) to cancel
linear drift, fresh JVM per pass, and compare paired medians.

Reading the verdict: ratio ~1.0 -> the flag was host state (record it,
don't chase it); ratio >> 1 on the same host minutes apart -> a real
regression introduced since the reference commit.

Usage: python tools/drift_ab.py --ref <commit> [--queries a,b,c]
         [--sf-dir /root/testdata/sf0.1] [--out DRIFT_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from bench import LLM_BASELINE_SF01  # noqa: E402

_INNER = r"""
import time, sys, json
sys.path.insert(0, {tree!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from mapreduce_machine_learning_spark import runtime
from mapreduce_machine_learning_spark.registry import all_queries
qs = all_queries()
out = {{}}
for name in {queries!r}:
    samples = []
    for _ in range(4):
        runtime.release_all()  # cold per sample, like bench's LLM protocol
        t0 = time.perf_counter()
        qs[name](spark, {sf_dir!r}).collect()
        samples.append(round(time.perf_counter() - t0, 4))
    out[name] = samples
print("AB_RESULT " + json.dumps(out), flush=True)
spark.stop()
"""


def run_tree(tree: str, queries: list[str], sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _INNER.format(tree=tree, queries=queries, sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=tree,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise SystemExit(
        f"inner run produced no result for {tree}: {proc.stderr[-2000:]}"
    )


def verdict_for(median_ratio: float | None) -> str:
    """Three-way adjudication verdict (ADVICE r7): a run with NO computable
    ratio (ref steady 0, or every per-query entry None) is a broken
    MEASUREMENT, not evidence of a regression — conflating the two would
    let an empty replay "confirm" a bench flag. Pure so
    tests/test_tools_cli.py can pin all three branches without a JVM."""
    if median_ratio is None:
        return "inconclusive (no valid ratios)"
    if median_ratio <= 1.15:
        return "code_equivalent (flag was host state)"
    return "possible regression since ref"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help="reference commit to compare against")
    ap.add_argument("--queries", default=",".join(LLM_BASELINE_SF01))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="DRIFT_ab.json")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]
    from mapreduce_machine_learning_spark.registry import all_queries

    unknown = [q for q in queries if q not in all_queries()]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    ref_tree = tempfile.mkdtemp(prefix="mrml_ab_ref_")
    subprocess.run(
        ["git", "worktree", "add", "--force", ref_tree, args.ref],
        check=True,
        capture_output=True,
    )
    try:
        # A,B,B,A: linear host drift cancels in the paired medians
        passes = []
        for tree, tag in ((REPO, "head"), (ref_tree, "ref"), (ref_tree, "ref"), (REPO, "head")):
            passes.append((tag, run_tree(tree, queries, args.sf_dir)))
            print(f"pass done: {tag}", flush=True)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", ref_tree],
            capture_output=True,
        )

    result = {"ref": args.ref, "sf_dir": args.sf_dir, "passes": passes, "queries": {}}
    for name in queries:
        # steady = min of samples[1:] per pass (bench's gate statistic)
        head = [min(s[name][1:]) for tag, s in passes if tag == "head"]
        ref = [min(s[name][1:]) for tag, s in passes if tag == "ref"]
        h, r = statistics.median(head), statistics.median(ref)
        result["queries"][name] = {
            "head_steady_s": h,
            "ref_steady_s": r,
            "head_over_ref": round(h / r, 3) if r else None,
        }
    ratios = [v["head_over_ref"] for v in result["queries"].values() if v["head_over_ref"]]
    result["median_ratio"] = round(statistics.median(ratios), 3) if ratios else None
    result["verdict"] = verdict_for(result["median_ratio"])
    print(json.dumps(result["queries"], indent=1))
    print("median head/ref ratio:", result["median_ratio"], "->", result["verdict"])
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}", flush=True)
    if result["median_ratio"] is None:
        sys.exit(2)


if __name__ == "__main__":
    main()
