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
        analytics,
        corpus_stats,
        distributions,
        experimentation,
        llm,
        ml,
        model_selection,
        quality_audits,
        relational,
        setops_scalar,
        sketches,
        stattests,
        streaming_batch,
        text_analysis,
        tpch,
        udf,
        windows,
    )


def all_queries() -> dict[str, QueryFn]:
    _load_operator_modules()
    return dict(_QUERIES)


_SQL_KEYWORDS = {
    "JOIN", "CROSS", "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "WHERE",
    "GROUP", "ORDER", "ON", "UNION", "LIMIT", "HAVING", "WINDOW", "USING",
    "AND", "OR", "SELECT", "FROM", "AS",
}

_EVENTS_WRAPPED = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)"


def _harden_events_ts(sql: str) -> str:
    """Wrap every ``events`` table reference in an inline ns→µs cast.

    The engine-side loader truncates events.ts to microseconds
    (``ts DIV 1000`` — SURVEY §1.2). The oracle must see the same instants,
    but whether the *driver's* pre-registered DuckDB view already casts
    ``ts::TIMESTAMP`` is outside our control: if it does, this wrapper is a
    no-op; if the view keeps TIMESTAMP_NS, the wrapper restores parity
    (sub-µs residue otherwise flips gap/range/session boundary
    comparisons). Applied uniformly at the oracle_sql() boundary so query
    modules stay readable."""
    import re

    def repl(m: re.Match) -> str:
        kw, alias = m.group(1), m.group(2)
        if alias and alias.upper() not in _SQL_KEYWORDS:
            return f"{kw} {_EVENTS_WRAPPED} AS {alias}"
        tail = f" {alias}" if alias else ""
        return f"{kw} {_EVENTS_WRAPPED} AS events{tail}"

    return re.sub(r"\b(FROM|JOIN)\s+events\b(?:\s+(?:AS\s+)?(\w+))?", repl, sql)


def all_oracles() -> dict[str, str]:
    _load_operator_modules()
    return {name: _harden_events_ts(sql) for name, sql in _ORACLES.items()}
