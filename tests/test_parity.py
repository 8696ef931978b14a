"""Differential-oracle parity for every registered full-oracle query, plus a
rows-only sanity run for the rest — the local twin of the driver's t2 gate.

Runs at sf0.001 by default (fast inner loop); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mirror t2 scale exactly.
"""

import pytest

from mapreduce_machine_learning_spark.io import duckdb_connect
from mapreduce_machine_learning_spark.registry import all_oracles, all_queries
from tests.conftest import SF_DIR
from tests.parity import assert_parity

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, oracle_con, name):
    fn = QUERIES[name]
    sql = ORACLES.get(name)
    if sql is None:
        rows = fn(spark, SF_DIR).collect()
        assert rows is not None  # rows-only contract: runs and returns
    else:
        assert_parity(spark, name, fn, sql, SF_DIR, oracle_con)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
