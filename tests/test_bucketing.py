"""Bucketed layout: pre-shuffling fact tables by join key at write time buys
shuffle-free joins at read time (ARCHITECTURE.md's 100 TB layout lever).
Asserted by plan shape: the bucketed join has NO Exchange on either side."""

import pytest

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # saveAsTable writes under the session's warehouse dir
    # (./spark-warehouse, gitignored) — warehouse.dir is a static conf
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ob, lb = bucketed_tables
    # disable broadcast so the join strategy is the bucket-aware sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(ob)
            .join(spark.table(lb), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        j.collect()
        final = j._jdf.queryExecution().executedPlan().toString()
        join_part = final.split("HashAggregate")[-1]  # below the agg exchange
        assert "SortMergeJoin" in final
        # neither join input re-shuffles: bucket layout IS the partitioning
        assert "Exchange hashpartitioning(o_orderkey" not in final
        assert "Exchange hashpartitioning(l_orderkey" not in final
        del join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    ob, lb = bucketed_tables
    bucketed = (
        spark.table(ob)
        .join(spark.table(lb), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plain = (
        load_table(spark, SF_DIR, "orders")
        .join(
            load_table(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
