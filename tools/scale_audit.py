#!/usr/bin/env python
"""Repo-wide physical-plan audit → SCALE_AUDIT.md.

For every registered query, builds the executed plan (no execution — plan
shape only) and extracts the properties the 100 TB design depends on:
join strategies, exchange (shuffle) counts, Python/Arrow boundaries, and
scan pushdown. The report lists aggregate statistics plus ONLY the queries
that trip a smell rule — a clean run is a short report.

Smell rules:
- CartesianProduct anywhere → FAIL (exit 1).
- BroadcastNestedLoopJoin: allowed only for scalar/parameter broadcasts —
  counted, not failed (the registry-wide pytest pins the cartesian rule).
- Row-at-a-time Python UDF (BatchEvalPython) outside the declared §2.10
  UDF surface → FAIL.
- Exchange count ≥ 8 in one plan → listed for review (deep shuffle chains
  amortize poorly at scale).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.001"  # plan shape only — smallest data
UDF_SURFACE = {"q_udf_python"}  # the one contract-mandated row UDF
EXCHANGE_REVIEW_THRESHOLD = 8

# Why each known deep-shuffle plan is deep — reviewed per round; a query
# on the review list WITHOUT an entry here renders as UNEXPLAINED (and
# should either be fixed or justified). Two recurring structural reasons:
# (a) fixed-round iterative algorithms pay a constant number of shuffles
# PER ROUND (the rounds are the algorithm, not waste); (b) the audit runs
# with materialization disabled, so pipeline stages that production runs
# share through the session cache (signatures → bands → candidates) are
# counted once per consumer here.
DEEP_SHUFFLE_JUSTIFICATION = {
    "q_graph_components": "single-task union-find (r13 fast path) over the verified near-dup edge list; the depth is the unshared tokenize→signature→band→verify pipeline below it, which production shares via the session cache",
    "q_graph_pagerank": "two power iterations unrolled into one plan (join + node-keyed agg per iteration) on top of the lag-window transition-graph derivation — constant shuffles per iteration",
    "q_graph_sssp": "two Bellman-Ford relaxation rounds (frontier join + per-node MIN each) plus the shared transition-graph derivation — constant shuffles per round",
    "q_graph_triangles": "3-way self-join on rotated edge keys — each key rotation is one unavoidable shuffle",
    "q_graph_assortativity": "edge list joined to both endpoint degree tables + correlation aggs — one shuffle per distinct join/grouping key",
    "q_events_cooccur": "collect_set baskets (r14) + in-array pair explode, then pair/type/total aggs — counted unshared under audit (production persists the basket frame once)",
    "q_llm_neardup_pairs": "tokenize→signature→band→candidate→verify pipeline; audit counts unshared stages (production shares them via the session cache)",
    "q_llm_ann_pairs": "bucket-blocked BLAS rerank (r13): signature→band derivation + chunk-count/assignment joins of _blocked_cosine_pairs, counted unshared under audit (production shares the band table via the session cache)",
    "q_llm_dedup_incremental": "same pipeline over delta AND corpus sides plus exact-hash semi-join; persisted-state deployment (tests/test_incremental_state.py) replaces the corpus-side stages with bucketed reads",
    "q_llm_dedup_survivors": "survivor policy over components over the verified-pair stream — three stages of the same memoized dedup pipeline, each counted unshared under audit",
    "q_llm_dedup_semantic": "label-blocked cosine pairs + component labeling + survivor aggregation — multi-stage by definition",
    "q_llm_dedup_semantic_ann": "band-bucket-blocked BLAS verify (r13: chunk list + two assignment joins, counted unshared under audit) + edge dedup + component counts — the bucket, chunk-pair and edge keys are all distinct",
    "q_llm_dedup_sweep": "one histogram agg over the verified-pair stream; the depth is the unshared verify pipeline (audit mode disables the session cache that q_llm_neardup_pairs shares with it)",
    "q_llm_dup_sources": "verify pipeline + per-source-pair rollup on a different key than the pair stream",
    "q_llm_sim_threshold_ivf": "IVF assign (argmax over centroid broadcast) + chunk-pair scoring + threshold agg — cell key ≠ pair key ≠ output key",
    "q_ml_nb_multinomial": "per-class token likelihoods + vocabulary + priors: three grouping granularities unioned",
    "q_ml_kendall_tau": "concordant/discordant double-sum on the CONTINGENCY TABLE (cell×cell join of ~1k×1k aggregated cells), never row pairs",
    "q_ml_cov_offdiag": "covariance of every feature pair — one agg per pair family over an exploded feature frame",
    "q_ml_conformal": "calibration split quantile histogram (train-stats + calib-histogram passes; r13 removed the coverage re-scan, likely below threshold now — entry kept in case audit-mode re-derivation still counts deep)",
    "q_profile_fd": "functional-dependency profiling: one min/max group agg per candidate column pair (r14 — the countDistinct pre-exchange is gone; 2 exchanges per check × 5 checks)",
    "q_sketch_kmv_setops": "one groupBy(k) key pass (r14) feeding both sketches + the truth audit, then set-op estimates — counted unshared under audit (production persists the key frame once)",
    "q_text_kl": "two unigram distributions (one shuffle each) + join + divergence agg",
}

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_machine_learning_spark import runtime as engine_runtime
    from mapreduce_machine_learning_spark.registry import all_queries

    # disable materialization so every consumer's full operator tree is
    # visible (a persisted/checkpointed subtree would hide its internals
    # from the substring rules below) and nothing executes during the audit
    engine_runtime.plan_audit_mode(True)

    join_totals: Counter = Counter()
    py_totals: Counter = Counter()
    exchange_hist: Counter = Counter()
    cartesians: list[str] = []
    rogue_udfs: list[str] = []
    deep_shuffles: list[tuple[str, int]] = []
    bnlj_queries: list[str] = []
    errors: list[tuple[str, str]] = []

    queries = all_queries()
    for name, fn in sorted(queries.items()):
        try:
            plan = (
                fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # pragma: no cover - report, don't die
            errors.append((name, str(exc)[:120]))
            continue
        for node in JOIN_NODES:
            c = plan.count(node)
            if c:
                join_totals[node] += c
        for node in PY_NODES:
            c = plan.count(node)
            if c:
                py_totals[node] += c
        if "CartesianProduct" in plan:
            cartesians.append(name)
        if "BatchEvalPython" in plan and name not in UDF_SURFACE:
            rogue_udfs.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj_queries.append(name)
        # count real shuffles only: BroadcastExchange is not a shuffle and
        # ReusedExchange is exactly NOT an extra one
        n_ex = (
            plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition")
        )
        exchange_hist[min(n_ex, 10)] += 1
        if n_ex >= EXCHANGE_REVIEW_THRESHOLD:
            deep_shuffles.append((name, n_ex))

    lines = [
        "# SCALE_AUDIT — physical-plan audit "
        "(auto-generated by tools/scale_audit.py)",
        "",
        f"{len(queries)} queries audited at {SF_DIR} (plan shape only; "
        "data-size-dependent strategy picks — broadcast vs sort-merge — "
        "resolve differently at scale, which is the point of leaving them "
        "to Catalyst/AQE).",
        "",
        "## Join strategy totals",
        "",
        "| node | occurrences |",
        "|---|---|",
    ]
    for node in JOIN_NODES:
        lines.append(f"| {node} | {join_totals.get(node, 0)} |")
    lines += [
        "",
        "## Python/Arrow boundaries",
        "",
        "| node | occurrences |",
        "|---|---|",
    ]
    for node in PY_NODES:
        lines.append(f"| {node} | {py_totals.get(node, 0)} |")
    lines += [
        "",
        "`BatchEvalPython` (row-at-a-time Python) is allowed ONLY in the "
        "§2.10 contract surface "
        f"({', '.join(sorted(UDF_SURFACE))}); all other Python boundaries "
        "are Arrow-vectorized.",
        "",
        "## Shuffle depth (shuffle Exchange nodes per plan; broadcast/reused exchanges excluded)",
        "",
        "| exchanges | queries |",
        "|---|---|",
    ]
    for k in sorted(exchange_hist):
        label = f"{k}+" if k == 10 else str(k)
        lines.append(f"| {label} | {exchange_hist[k]} |")
    lines += ["", "## Flags", ""]
    lines.append(
        f"- CartesianProduct: {len(cartesians)}"
        + (f" — **FAIL**: {cartesians}" if cartesians else " (none)")
    )
    lines.append(
        f"- Row-Python UDF outside §2.10: {len(rogue_udfs)}"
        + (f" — **FAIL**: {rogue_udfs}" if rogue_udfs else " (none)")
    )
    lines.append(
        f"- BroadcastNestedLoopJoin plans: {len(bnlj_queries)} — all are "
        "scalar/parameter broadcasts (1-row aggregates, fixed literals, "
        "k-row model frames) by the registry-wide pytest cartesian rule."
    )
    if deep_shuffles:
        lines += [
            f"- Plans with ≥{EXCHANGE_REVIEW_THRESHOLD} exchanges "
            "(review list, with per-query justification — an UNEXPLAINED "
            "row means the map in tools/scale_audit.py was not updated "
            "for a new deep plan and it needs review):",
            "",
            "| query | exchanges | why the plan is deep |",
            "|---|---|---|",
        ]
        unexplained = []
        for n, c in sorted(deep_shuffles):
            why = DEEP_SHUFFLE_JUSTIFICATION.get(n)
            if why is None:
                unexplained.append(n)
                why = "**UNEXPLAINED**"
            lines.append(f"| {n} | {c} | {why} |")
        if unexplained:
            lines.append("")
            lines.append(
                f"- **UNEXPLAINED deep plans: {unexplained}** — review "
                "required."
            )
    else:
        lines.append(
            f"- Plans with ≥{EXCHANGE_REVIEW_THRESHOLD} exchanges: none"
        )
    if errors:
        lines.append(f"- Plan-build errors: {errors}")
    lines.append("")

    out = os.path.join(ROOT, "SCALE_AUDIT.md")
    # preserve the manually-maintained sweep log: the rounds append rows
    # to it (verify_sweep results), and a regeneration must not eat them
    sweep_header = "## Partition-robustness sweeps"
    tail = ""
    if os.path.exists(out):
        old = open(out).read()
        i = old.find(sweep_header)
        if i >= 0:
            tail = old[i:]
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
        if tail:
            fh.write("\n" + tail)
    print(f"wrote {out}")
    spark.stop()
    if cartesians or rogue_udfs or errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
