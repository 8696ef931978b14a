"""Strong-scaling (cores) sweep for the flagship pipelines.

SCALING.md's data-scaling curves leave one honest gap: executor-count
scaling is argued from shuffle structure, not measured. This tool measures
it as far as a single machine allows: the SAME 16x realistic-vocabulary
corpus (tools/gen_scaling_corpus.py) run under local[2/4/8/16/32], one JVM
per core count (Spark's master is fixed per session, so each configuration
runs in a subprocess). shuffle.partitions tracks the core count (min 8) the
way bench.py sets it, so the sweep measures parallel speedup of the SAME
logical plan, not a partitioning change masquerading as one.

Pipelines timed (cold protocol identical to tools/scaling_curve.py: one
warm run, then four cold-timed runs with runtime.release_all() first;
the median carries the curve, all samples recorded):
  * neardup   — full q_llm_neardup_pairs pipeline;
  * ivf_build — _ivf_cells assignment over every vector;
  * join      — q_join_multi over the s× TPC-H-ish corpus (round 6:
    strong-scaling for the sort-merge-join regime; select with
    --pipelines join).

A pipeline whose work is map-side-dominated with one bounded shuffle should
show wall time falling with cores until fixed per-stage scheduling cost
floors it — that shape, measured, is the single-machine half of the
1000-executor argument (the other half stays structural: no shuffle in
either pipeline grows with executor count).

Usage:
  python tools/cores_sweep.py [--cpus 2,4,8,16,32] [--scale 16]
                              [--out CORES_runs.json]
Inner (one JVM, invoked by the outer loop):
  python tools/cores_sweep.py --inner --scale 16
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


def _dir_for(scale: int, pipelines: tuple[str, ...] = ("neardup", "ivf")) -> str:
    d = os.path.join(REPO, ".scaling", f"x{scale}")
    if "join" in pipelines and not all(
        os.path.exists(os.path.join(d, f"{t}.parquet"))
        for t in ("customer", "orders", "lineitem")
    ):
        from tools.gen_scaling_corpus import generate_tpch

        generate_tpch(scale, d)
    if {"neardup", "ivf"} & set(pipelines) and not (
        os.path.exists(os.path.join(d, "documents.parquet"))
        and os.path.exists(os.path.join(d, "embeddings.parquet"))
    ):
        from tools.gen_scaling_corpus import generate

        generate(scale, d)
    return d


def inner(scale: int, pipelines: tuple[str, ...]) -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    d = _dir_for(scale, pipelines)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"mrml-cores-sweep-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_machine_learning_spark import runtime
    from mapreduce_machine_learning_spark.operators import ann, llm

    def cold(fn):
        # warm once, then 4 cold-timed samples; the MEDIAN carries the
        # curve (single-JVM timing shows reproducible one-off 5-10x JIT
        # deopt/recompile spikes that two samples cannot outvote — the
        # 13-21 s first-cold artifact at >=16 threads documented in
        # SCALING.md); all samples are recorded so outliers stay visible.
        runtime.release_all()
        fn().collect()  # warm: JIT/codegen/IO
        ts = []
        for _ in range(4):
            runtime.release_all()
            t0 = time.perf_counter()
            fn().collect()
            ts.append(round(time.perf_counter() - t0, 3))
        return round(statistics.median(ts), 3), ts

    out = {"cpus": cpus, "scale": scale}
    if "neardup" in pipelines:
        out["neardup_s"], out["neardup_samples_s"] = cold(
            lambda: llm.q_llm_neardup_pairs(spark, d)
        )
    if "ivf" in pipelines:
        out["ivf_build_s"], out["ivf_build_samples_s"] = cold(
            lambda: ann._ivf_cells(spark, d)
        )
    if "join" in pipelines:
        from mapreduce_machine_learning_spark.operators import relational

        out["join_s"], out["join_samples_s"] = cold(
            lambda: relational.q_join_multi(spark, d)
        )
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--cpus", default="2,4,8,16,32")
    ap.add_argument("--scale", type=int, default=16)
    # default preserves the round-5 sweeps; the join strong-scaling run is
    # python tools/cores_sweep.py --pipelines join --cpus 8,16,32 --scale 64
    ap.add_argument("--pipelines", default="neardup,ivf")
    ap.add_argument("--out", default="CORES_runs.json")
    args = ap.parse_args()

    pipelines = tuple(p for p in args.pipelines.split(",") if p)
    # argparse error, not assert (ADVICE r6): asserts vanish under -O
    bad = [p for p in pipelines if p not in ("neardup", "ivf", "join")]
    if bad:
        ap.error(f"unknown pipeline(s) {bad}; choose from neardup,ivf,join")

    if args.inner:
        inner(args.scale, pipelines)
        return

    _dir_for(args.scale, pipelines)  # generate once, outside any timing
    results = []

    def _flush() -> None:
        # written after EVERY point (ADVICE round 5): a raised timeout or a
        # kill mid-sweep must not lose the hours of already-collected points
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    for cpus in [int(c) for c in args.cpus.split(",")]:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    __file__,
                    "--inner",
                    "--scale",
                    str(args.scale),
                    "--pipelines",
                    args.pipelines,
                ],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
        except subprocess.TimeoutExpired as exc:
            print(f"cpus={cpus}: TIMEOUT after {exc.timeout}s", flush=True)
            results.append({"cpus": cpus, "error": f"timeout {exc.timeout}s"})
            _flush()
            continue
        line = next(
            (
                l[len("RESULT ") :]
                for l in proc.stdout.splitlines()
                if l.startswith("RESULT ")
            ),
            None,
        )
        if line is None:
            print(
                f"cpus={cpus}: FAILED\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}",
                flush=True,
            )
            results.append({"cpus": cpus, "error": proc.stderr[-500:] or "no output"})
            _flush()
            continue
        rec = json.loads(line)
        results.append(rec)
        print(json.dumps(rec), flush=True)
        _flush()
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
