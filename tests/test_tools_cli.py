"""Pins for the ADVICE r6/r7 measurement-tool fixes — no SparkSession.

Each test pins one advisor finding so a regression reintroducing the
original defect fails loudly:
  * gate_llm on a 1-element sample list (bench.py, r6),
  * headline-probe totals nulled on errored queries AND on empty/partial
    results (headline_probe.py, r6 + r7),
  * shuffle-volume accumulator dedup under exchange reuse, in either
    graph-visit order (shuffle_audit.py, r6 + r7),
  * drift_ab inconclusive verdict when no ratio is computable (r7),
  * CLI part/pipeline validation surviving `python -O` (scaling_curve.py,
    cores_sweep.py, r6).
The ann.py strict-build finding is pinned in
tests/test_ann.py::test_assign_paths_agree_on_zero_norm_vector.
"""

from __future__ import annotations

import os
import subprocess
import sys

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_llm_single_sample_falls_back_to_extra():
    """A 1-element samples list has no steady window: gate_llm must not
    raise (min of an empty slice) and must read the `extra` fallback
    instead (ADVICE r6, bench.py:81)."""
    name = next(iter(bench.LLM_BASELINE_SF01))
    target = bench.LLM_BASELINE_SF01[name]
    bound = 2.0 * target + bench.LLM_GATE_JITTER_S
    # one sample only -> falls back to extra, which is over the bound
    regr, warns = bench.gate_llm(
        {name: [0.01]}, {name: bound + 1.0}, {}
    )
    assert name in regr and regr[name]["sec"] == bound + 1.0
    # one sample, no extra -> no crash, no verdict
    regr, warns = bench.gate_llm({name: [0.01]}, {}, {})
    assert name not in regr


def test_headline_probe_summarize_nulls_total_on_error():
    """An errored/timed-out probe query must null the fresh-JVM total and
    flag the run incomplete — a partial sum would read as a FAST host
    state in BASELINE.md variance rows (ADVICE r6). Completeness is
    POSITIVE (ADVICE r7): an empty results list, or one silently missing
    a headline query, must also read incomplete — summarize([]) used to
    report an impossibly fast 0 s complete probe."""
    from tools.headline_probe import summarize

    ok = [{"query": q, "median_s": 0.25} for q in bench.HEADLINE]
    total = round(0.25 * len(bench.HEADLINE), 4)
    assert summarize(ok) == (total, False)
    bad = ok[:-1] + [{"query": ok[-1]["query"], "error": "timeout"}]
    assert summarize(bad) == (None, True)
    # ADVICE r7 cases: empty and silently-partial runs are incomplete
    assert summarize([]) == (None, True)
    assert summarize(ok[:-1]) == (None, True)


def test_drift_ab_verdict_inconclusive_when_no_ratios():
    """drift_ab adjudication (ADVICE r7): None median_ratio (no computable
    per-query ratio) must yield a DISTINCT inconclusive verdict, never
    'possible regression' — an invalid measurement is not evidence."""
    from tools.drift_ab import verdict_for

    assert verdict_for(None) == "inconclusive (no valid ratios)"
    assert verdict_for(1.02).startswith("code_equivalent")
    assert verdict_for(1.5) == "possible regression since ref"


class _JIter:
    def __init__(self, items):
        self._items = list(items)

    def hasNext(self):
        return bool(self._items)

    def next(self):
        return self._items.pop(0)


class _JColl:
    def __init__(self, items):
        self._items = items

    def iterator(self):
        return _JIter(self._items)


class _Metric:
    def __init__(self, name, acc):
        self._name, self._acc = name, acc

    def name(self):
        return self._name

    def accumulatorId(self):
        return self._acc


class _Node:
    def __init__(self, name, metrics):
        self._name, self._metrics = name, metrics

    def name(self):
        return self._name

    def metrics(self):
        return _JColl(self._metrics)


class _Vals:
    def __init__(self, d):
        self._d = d

    def contains(self, k):
        return k in self._d

    def apply(self, k):
        return self._d[k]


class _Obj:
    """Attribute/call chain stub: every attribute is a callable returning
    the configured leaf or another _Obj."""

    def __init__(self, leaves=None):
        self._leaves = leaves or {}

    def __getattr__(self, item):
        leaf = self._leaves.get(item)
        if leaf is not None:
            return lambda *a, **k: leaf
        return lambda *a, **k: _Obj(self._leaves)


def _fake_spark(nodes, vals):
    class _Store:
        def executionMetrics(self, eid):
            return _Vals(vals)

        def planGraph(self, eid):
            return _Obj({"allNodes": _JColl(nodes)})

    class _Shared:
        def statusStore(self):
            return _Store()

    class _JSession:
        def sharedState(self):
            return _Shared()

    class _Spark:
        sparkContext = _Obj()  # listenerBus().waitUntilEmpty() no-ops
        _jsparkSession = _JSession()

    return _Spark()


def test_shuffle_audit_dedupes_reused_exchange_accumulators():
    """ReusedExchange nodes share accumulator IDs with the original
    Exchange; the byte sum must count each accumulator ONCE or plans with
    exchange reuse double-count shuffle volume (ADVICE r6,
    shuffle_audit.py:96)."""
    from tools.shuffle_audit import execution_volumes

    m = _Metric("shuffle bytes written", 7)
    nodes = [
        _Node("Exchange", [m]),
        _Node("ReusedExchange", [_Metric("shuffle bytes written", 7)]),
        _Node("Exchange", [_Metric("shuffle bytes written", 9)]),
        _Node(
            "BroadcastExchange",
            [_Metric("data size", 11), _Metric("data size", 11)],
        ),
    ]
    vals = {7: "100.0 B", 9: "50.0 B", 11: "8.0 B"}
    out = execution_volumes(_fake_spark(nodes, vals), 0)
    assert out["shuffle_bytes"] == 150  # 100 once + 50, NOT 250
    assert out["n_shuffle_writes"] == 2
    assert out["broadcast_bytes"] == 8
    assert out["n_broadcasts"] == 1


def test_shuffle_audit_reuse_node_first_still_counts_broadcast():
    """ADVICE r7: graph iteration order is not guaranteed — when the
    ReusedExchange node is visited BEFORE its BroadcastExchange, a
    yield-time dedup attributed the shared 'data size' accumulator to
    "ReusedExchange" and the broadcast classifier dropped it (the old
    double-count traded for an undercount). The walker must emit each
    accumulator once under its OWNING exchange's name regardless of
    visit order."""
    from tools.shuffle_audit import execution_volumes

    nodes = [
        _Node("ReusedExchange", [_Metric("data size", 11)]),
        _Node("BroadcastExchange", [_Metric("data size", 11)]),
        _Node("ReusedExchange", [_Metric("shuffle bytes written", 7)]),
        _Node("Exchange", [_Metric("shuffle bytes written", 7)]),
    ]
    vals = {7: "100.0 B", 11: "8.0 B"}
    out = execution_volumes(_fake_spark(nodes, vals), 0)
    assert out["broadcast_bytes"] == 8  # not dropped under the reuse name
    assert out["n_broadcasts"] == 1
    assert out["shuffle_bytes"] == 100  # still counted exactly once
    assert out["n_shuffle_writes"] == 1


def test_sweep_clis_reject_unknown_parts_under_dash_O():
    """CLI validation must survive `python -O` (ADVICE r6): bare asserts
    are stripped and a typo'd part name would KeyError deep in a timed
    inner() run. argparse.error exits 2 with a usage message instead."""
    for cmd in (
        ["tools/scaling_curve.py", "--parts", "bogus", "--scales", "1"],
        ["tools/cores_sweep.py", "--pipelines", "bogus"],
    ):
        proc = subprocess.run(
            [sys.executable, "-O", *cmd],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=120,
        )
        assert proc.returncode == 2, (cmd, proc.stderr[-500:])
        assert "unknown" in proc.stderr


def test_drift_ab_cli_validation():
    """tools/drift_ab.py: --ref is mandatory (there is nothing to pair
    against without it) and unknown query names must argparse-error
    before any worktree or JVM is created — both exit 2 under -O."""
    for cmd in (
        ["tools/drift_ab.py"],
        ["tools/drift_ab.py", "--ref", "HEAD", "--queries", "bogus"],
    ):
        proc = subprocess.run(
            [sys.executable, "-O", *cmd],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=120,
        )
        assert proc.returncode == 2, (cmd, proc.stderr[-500:])


def test_memory_audit_max_parser():
    """tools/memory_audit.py's MAX-entry parser: single-task values carry
    themselves; the two-line 'total (min, med, max)' format must yield
    the MAX task value (peak memory is a per-task maximum — summing task
    peaks would fabricate a bigger task); non-size strings are None."""
    from tools.memory_audit import parse_max_size

    assert parse_max_size("1312.0 B") == 1312
    two_line = (
        "total (min, med, max (stageId: taskId))\n"
        "212.0 B (58.0 B, 58.0 B, 96.0 B (stage 1.0: task 3))"
    )
    assert parse_max_size(two_line) == 96
    assert parse_max_size("64.2 MiB (16.0 MiB, 16.1 MiB, 16.4 MiB (stage 2.0: task 9))") == int(16.4 * 1024**2)
    assert parse_max_size("3 ms (1 ms, 1 ms, 1 ms)") is None
    assert parse_max_size("600,000") is None
