"""np_r6 (the Arrow-kernel rounding used by the blocked-cosine threshold
cut, llm.py) must be the SAME function as the oracle's DuckDB ``ROUND(x,6)``
— half away from zero, not numpy's half-to-even — so an exact-midpoint
cosine cannot flip pair membership cross-engine (ADVICE round 3).

No Spark session needed: the kernel function is pure numpy and the oracle
side is DuckDB, which is exactly the pair that must agree."""

import duckdb
import numpy as np

from mapreduce_machine_learning_spark.determinism import np_r6


def _duck_round6(xs):
    con = duckdb.connect()
    try:
        rows = con.execute(
            "SELECT ROUND(x, 6) FROM (SELECT UNNEST(?::DOUBLE[]) AS x)",
            [list(map(float, xs))],
        ).fetchall()
    finally:
        con.close()
    return np.array([r[0] for r in rows], dtype="float64")


def test_np_r6_matches_duckdb_on_midpoints():
    # decimal-string midpoints at the 7th place, both signs: the exact
    # case where np.round (half-to-even) diverges from ROUND
    xs = []
    for k in range(0, 40):
        xs.append(k / 2 * 1e-6 + 5e-7)  # …5 midpoints near zero
        xs.append(float(f"0.123456{k % 10}5"))
        xs.append(float(f"{k}.0000005"))
    xs = np.array(xs + [-x for x in xs], dtype="float64")
    got = np_r6(xs)
    want = _duck_round6(xs)
    np.testing.assert_array_equal(got, want)


def test_np_r6_matches_duckdb_on_random_cosines():
    rng = np.random.default_rng(42)
    xs = rng.uniform(-1.0, 1.0, size=5000)
    np.testing.assert_array_equal(np_r6(xs), _duck_round6(xs))


def test_np_r6_diverges_from_np_round_where_it_matters():
    # sanity: the bug was real — on a tie that the shortest-decimal double
    # actually lands ON, np.round goes to even while np_r6 goes away from
    # zero. 0.5e-6 is exactly representable scaled: 0.5*1e-6*1e6 == 0.5.
    x = np.array([0.5e-6, 1.5e-6, -0.5e-6])
    assert list(np_r6(x)) == [1e-6, 2e-6, -1e-6]
    assert list(np.round(x, 6)) != list(np_r6(x))
