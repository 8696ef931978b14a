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


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's documented 100 TB answer for skewed JOIN keys is AQE's
    skew-join split (salting covers skewed AGGREGATION keys above): with a
    90%-hot key and sort-merge forced, the executed plan must carry the
    SortMergeJoin(skew=true) marker — AQE subdivided the hot partition at
    runtime instead of letting one task own 90% of the rows. Thresholds
    are lowered to make test-scale partitions 'large'; at production
    defaults the same rule fires at 256 MB."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias(
                "payload"
            ),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("attr")
        )
        j = fact.join(dim, "k").select(
            F.length("payload").alias("plen"), "attr"
        )
        assert len(j.collect()) == 200_000  # inner join keeps every row
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
