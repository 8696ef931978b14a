"""Salted aggregation equals plain aggregation (algebraic aggregates are
decomposable), including on a deliberately skewed frame."""

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.functions.skew import salted_sum_count
from mapreduce_machine_learning_spark.io import load_table
from tests.conftest import SF_DIR


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_equals_plain_on_lineitem(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count(F.lit(1)).alias("cnt"),
    )
    salted = salted_sum_count(li, "l_returnflag", "l_quantity")
    assert _canon(salted) == _canon(plain)


def test_salted_on_hot_key(spark):
    # 90% of rows share one key — the shape salting exists for
    rows = [("hot", float(i % 7)) for i in range(9000)] + [
        (f"k{i % 50}", float(i)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(32)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("cnt")
    )
    salted = salted_sum_count(df, "k", "v")
    assert _canon(salted) == _canon(plain)
