"""Plan-inspection helpers: assert the physical plan Catalyst produced is the
one we'd want at 100 TB (filters pushed to the scan, columns pruned, small
sides broadcast, partial aggregation before the exchange, no cartesian
products). Used by tests/test_plans.py as executable documentation of the
§4 optimizer expectations."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> str:
    plan = explain_str(df)
    for n in needles:
        assert n in plan, f"expected {n!r} in plan:\n{plan}"
    return plan


def assert_not_in_plan(df: DataFrame, *needles: str) -> str:
    plan = explain_str(df)
    for n in needles:
        assert n not in plan, f"did not expect {n!r} in plan:\n{plan}"
    return plan
