"""Every example script must run end-to-end at sf0.001 (fresh interpreter,
like a user would invoke it)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = [
    "pricing_summary.py",
    "train_models.py",
    "dedup_pipeline.py",
    "streaming_monitor.py",
    "decision_support.py",
    "behavior_analytics.py",
    "experiment_readout.py",
    "corpus_quality_report.py",
    "similarity_search.py",
]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
