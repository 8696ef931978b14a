"""q_win_leaderboard data precondition (ADVICE r13): the sparse rewrite is
value-identical to the oracle's dense (user × day) grid only while every
target day has at least 3 users with a NONZERO cumulative count — a
zero-count user can hold a top-3 rank in the dense form but never appears
in the sparse form. The equivalence is data-dependent, not structural, so
this pins the precondition on every fixture scale factor: a future data
regression fails a test here instead of surfacing only as an oracle diff.

Pure DuckDB (no Spark session): the check is a property of the fixture
parquet, not of either engine's plan.
"""

import os

import duckdb
import pytest

FIXTURE_SFS = ["sf0.001", "sf0.01", "sf0.1"]
TOP_K = 3  # the leaderboard ranks top-3 per target day


@pytest.mark.parametrize("sf", FIXTURE_SFS)
def test_every_target_day_has_enough_nonzero_users(sf):
    path = f"/root/testdata/{sf}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"fixture {sf} not present")
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH ev AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM read_parquet('{path}')
        ),
        days AS (SELECT DISTINCT day FROM ev),
        tgt AS (
            SELECT day AS tgt_day FROM days
            WHERE day >= (SELECT MAX(day) FROM days) - INTERVAL 4 DAY
        )
        SELECT t.tgt_day,
               COUNT(DISTINCT e.user_id) AS nonzero_users
        FROM tgt t
        JOIN ev e ON e.day <= t.tgt_day
        GROUP BY t.tgt_day
        ORDER BY t.tgt_day
        """
    ).fetchall()
    assert rows, f"{sf}: no target days found"
    # the oracle window is the last 5 calendar days with events
    assert len(rows) <= 5
    for tgt_day, nonzero in rows:
        assert nonzero >= TOP_K, (
            f"{sf}: target day {tgt_day} has only {nonzero} users with a "
            f"nonzero cumulative count (< {TOP_K}) — the sparse "
            f"q_win_leaderboard rewrite no longer matches the dense-grid "
            f"oracle on this data"
        )
