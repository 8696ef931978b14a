"""Query registry backing the driver contract in ``__spark_entry__.py``.

Each operator module registers its queries with the ``@query`` decorator,
pairing the PySpark implementation with the DuckDB oracle SQL (or ``None``
for rows-only checks — approximate/nondeterministic ops, SURVEY.md §2.1).
Keeping the oracle SQL adjacent to the Spark code in each module makes the
parity contract reviewable side by side.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_operator_modules() -> None:
    # import for side effect: each module registers its queries
    from mapreduce_machine_learning_spark.operators import (  # noqa: F401
        aggregation,
        llm,
        ml,
        relational,
        setops_scalar,
        streaming_batch,
        text_analysis,
        udf,
        windows,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return dict(_ORACLES)
