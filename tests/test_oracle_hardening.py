"""The oracle_sql() events-timestamp hardening must hold whether or not the
grader's pre-registered DuckDB events view casts ts from TIMESTAMP_NS —
sub-microsecond residue otherwise flips gap/session/range boundary
comparisons against Spark's µs-truncated loader."""

import duckdb
import pytest

from mapreduce_machine_learning_spark.io import TABLES
from mapreduce_machine_learning_spark.registry import (
    _harden_events_ts,
    all_oracles,
    all_queries,
)
from tests.conftest import SF_DIR
from tests.parity import _normalize_rows, run_oracle, run_spark


def test_transform_wraps_aliases_and_keywords():
    w = "(SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)"
    assert _harden_events_ts("SELECT * FROM events WHERE x") == (
        f"SELECT * FROM {w} AS events WHERE x"
    )
    assert _harden_events_ts("FROM events e1 JOIN events e2 ON a") == (
        f"FROM {w} AS e1 JOIN {w} AS e2 ON a"
    )
    assert _harden_events_ts("FROM events CROSS JOIN x") == (
        f"FROM {w} AS events CROSS JOIN x"
    )
    # other tables untouched
    assert _harden_events_ts("FROM documents d") == "FROM documents d"


@pytest.fixture(scope="module")
def uncast_con():
    con = duckdb.connect()
    for t in TABLES:  # plain views: events.ts stays TIMESTAMP_NS
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, sql in all_oracles().items() if "events" in sql)
)
def test_events_queries_match_under_uncast_view(spark, uncast_con, name):
    qs = all_queries()
    s_cols, s_rows = run_spark(spark, qs[name], SF_DIR)
    o_cols, o_rows = run_oracle(all_oracles()[name], SF_DIR, uncast_con)
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert _normalize_rows(s_cols, s_rows) == _normalize_rows(o_cols, o_rows)
