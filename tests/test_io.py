"""Loader contract: row counts match FIXTURES.md, the ns-timestamp recipe
yields proper timestamps, and prepare() is idempotent on any session."""

import pytest

from pyspark.sql.types import TimestampType

from mapreduce_machine_learning_spark.io import TABLES, load_table, prepare
from tests.conftest import SF_DIR

EXPECTED_SF0001 = {
    "region": 5,
    "nation": 25,
    "supplier": 10,
    "customer": 150,
    "part": 200,
    "orders": 1500,
    "lineitem": 6000,
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}


@pytest.mark.parametrize("table", TABLES)
def test_row_counts(spark, table):
    assert load_table(spark, SF_DIR, table).count() == EXPECTED_SF0001[table]


def test_events_ts_is_timestamp(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    lo, hi = ev.agg({"ts": "min"}).collect()[0][0], ev.agg({"ts": "max"}).collect()[0][0]
    assert lo.year == 2024 and hi.year == 2024  # FIXTURES: Jan 2024 span


def test_prepare_idempotent(spark):
    prepare(spark)
    prepare(spark)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
