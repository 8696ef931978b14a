"""Loaders for the driver-provided parquet testdata (FIXTURES.md).

Scale design: every table comes in through ``spark.read.parquet`` so the plan
bottoms out in a vectorized ``FileSourceScanExec`` with predicate pushdown and
column pruning — at 100 TB these scans are partition-pruned by the layout and
never read columns a query didn't ask for. No RDD ingestion paths.

Load-bearing recipe (SURVEY.md §1.2, verified): ``events.ts`` is parquet
``timestamp[ns]`` which Spark 4 refuses natively. We set
``spark.sql.legacy.parquet.nanosAsLong=true`` (runtime-settable) so the column
arrives as a long, then truncate to microseconds with **integer** division
(``ts DIV 1000``) — float division drifts ±1 µs from the DuckDB oracle's
``ts::TIMESTAMP`` truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def prepare(spark: SparkSession) -> SparkSession:
    """Set session confs this engine depends on. All runtime-settable, so this
    is safe on a driver-owned session we didn't build."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


# ``spark.read.parquet`` pays ~150 ms of driver-side file listing + footer
# schema inference PER CALL (measured at sf0.1) — pure plan-building overhead,
# re-paid by every query invocation. DataFrames are immutable, so handing every
# caller the same base relation is semantics-free; this is the moral equivalent
# of resolving a catalog table once instead of re-inferring an anonymous path.
# Keyed by applicationId so a new session (new JVM state, new confs) never sees
# a stale handle.
_TABLE_MEMO: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table with schema fixes applied (events.ts ns→µs)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _TABLE_MEMO.get(key)
    if df is None:
        prepare(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            # integer DIV is mandatory — see module docstring
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        _TABLE_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (names match the DuckDB oracle's) so
    SQL-expressed queries read identical relations on both engines."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def duckdb_connect(sf_dir: str):
    """A DuckDB connection with the same 10 views the driver registers
    (``__spark_entry__.py`` contract): table-named views over the parquet
    files, with ``events.ts`` cast ns→µs to mirror the Spark loader."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if t == "events":
            con.execute(
                f"CREATE OR REPLACE VIEW events AS "
                f"SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM read_parquet('{path}')"
            )
        else:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con
