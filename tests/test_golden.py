"""Golden-hash regression gate (SURVEY §5.2 item 7): every query's sf0.01
result must match the hash frozen by tools/freeze_golden.py after the last
green oracle sweep. Catches unintended result drift without DuckDB."""

import json
import os

import pytest

from mapreduce_machine_learning_spark.registry import all_queries
from tests.parity import result_hash, fingerprint_testdata

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden.json")
SF_DIR = "/root/testdata/sf0.01"

if os.path.exists(GOLDEN_PATH):
    with open(GOLDEN_PATH) as f:
        _payload = json.load(f)
    GOLDEN = _payload.get("queries", {})
    _FROZEN_FP = _payload.get("fingerprint")
else:  # pragma: no cover
    GOLDEN = {}
    _FROZEN_FP = None

_SKIP = None
if not GOLDEN:
    _SKIP = "tests/golden.json not frozen yet"
elif _FROZEN_FP and _FROZEN_FP != fingerprint_testdata(SF_DIR):
    _SKIP = (
        "testdata regenerated since golden freeze — run the oracle sweep, "
        "then `python tools/freeze_golden.py`"
    )

pytestmark = pytest.mark.skipif(_SKIP is not None, reason=str(_SKIP))


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden(spark, name):
    fn = all_queries()[name]
    df = fn(spark, SF_DIR)
    n, h = result_hash(df.columns, [tuple(r) for r in df.collect()])
    assert n == GOLDEN[name]["rows"], f"{name}: row count drifted"
    assert h == GOLDEN[name]["hash"], f"{name}: result hash drifted"
