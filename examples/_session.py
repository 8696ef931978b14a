"""Shared SparkSession builder for the examples."""

from pyspark.sql import SparkSession


def example_session(name: str) -> SparkSession:
    spark = (
        SparkSession.builder.master("local[*]")
        .appName(f"mrml-example-{name}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark
