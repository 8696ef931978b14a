"""Source/sink surface: parquet / CSV / JSON readers and writers.

The reference consumed line-oriented text (CSV / JSON-per-line) from HDFS and
wrote reducer output the same way (SURVEY §1.1); this module is that surface,
Spark-native. Parquet is the at-rest norm (columnar, predicate pushdown);
CSV/JSON exist for interchange. Round-trip fidelity is pytest-asserted
(tests/test_sources.py) rather than oracle-declared — the driver contract
only consumes DataFrames (SURVEY §2.2 note on sinks).

Scale notes: writers partition output one file per task — repartition before
writing to control file count; `partitionBy` columns give directory-level
partition pruning on re-read (the 100 TB layout lever: e.g. events
partitioned by day). CSV/JSON carry no types — re-read uses an explicit
schema, never inference, so the round trip is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "csv", "json", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        return r.option("header", "true").csv(path)
    if fmt == "json":
        return r.json(path)
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "orc":
        return r.orc(path)
    raise ValueError(f"unsupported format {fmt!r}")


def write_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a single-string-column frame as raw lines — the reference's
    native sink (reducer output = lines on HDFS). The column is renamed to
    ``value`` as the text writer requires."""
    (col,) = df.columns
    df.withColumnRenamed(col, "value").write.mode(mode).text(path)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw line-oriented input (one ``value: string`` column) — the
    reference's native source; parse with split/from_json/from_csv
    expressions downstream, all JVM-side."""
    return spark.read.text(path)
