"""Python-side execution paths not declared as t2 queries (SURVEY §2.10):
the Spark 4 @udtf (vs its posexplode twin) and the grouped-agg pandas UDF."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from tests.conftest import SF_DIR


def test_python_udtf_matches_posexplode(spark):
    try:
        from pyspark.sql.functions import udtf
    except ImportError:  # pragma: no cover
        pytest.skip("@udtf unavailable in this PySpark build")

    @udtf(returnType="token string, pos int")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield tok, i + 1

    spark.udtf.register("split_tokens", SplitTokens)
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    docs.createOrReplaceTempView("docs_u")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, s.token, s.pos
        FROM docs_u d, LATERAL split_tokens(d.text) s
        """
    )
    via_builtin = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", "token", (F.col("pos0") + 1).alias("pos"))
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, via_builtin.collect())
    )


def test_grouped_agg_pandas_udf(spark):
    @F.pandas_udf("double")
    def mean_udf(v: pd.Series) -> float:
        return v.mean()

    df = load_table(spark, SF_DIR, "events")
    got = {
        r["event_type"]: r["m"]
        for r in df.groupBy("event_type").agg(mean_udf("value").alias("m")).collect()
    }
    want = {
        r["event_type"]: r["m"]
        for r in df.groupBy("event_type").agg(F.avg("value").alias("m")).collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9
