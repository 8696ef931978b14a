"""Golden-hash regression gate (SURVEY §5.2 item 7): every query's sf0.01
result must match the hash frozen by tools/freeze_golden.py after the last
green oracle sweep. Catches unintended result drift without DuckDB."""

import json
import os

import pytest

from mapreduce_machine_learning_spark.registry import all_queries
from tests.parity import result_hash

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden.json")
SF_DIR = "/root/testdata/sf0.01"

if os.path.exists(GOLDEN_PATH):
    with open(GOLDEN_PATH) as f:
        GOLDEN = json.load(f)
else:  # pragma: no cover
    GOLDEN = {}

pytestmark = pytest.mark.skipif(
    not GOLDEN, reason="tests/golden.json not frozen yet"
)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden(spark, name):
    fn = all_queries()[name]
    df = fn(spark, SF_DIR)
    n, h = result_hash(df.columns, [tuple(r) for r in df.collect()])
    assert n == GOLDEN[name]["rows"], f"{name}: row count drifted"
    assert h == GOLDEN[name]["hash"], f"{name}: result hash drifted"
