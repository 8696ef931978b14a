"""Coverage for the DataFrame utility surfaces a switching user expects
beyond operators: the Observation metrics API (free pipeline telemetry —
aggregates collected during a job's existing pass, no extra scan),
DataFrameStatFunctions (crosstab / freqItems / sampleBy / approxQuantile),
and the Arrow batch iterator (mapInArrow)."""

import pyarrow as pa

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from tests.conftest import SF_DIR


def test_observation_metrics_match_separate_agg(spark):
    ev = load_table(spark, SF_DIR, "events")
    obs = Observation("ev_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    # the action that triggers the observed plan also does real work
    n_purchases = observed.filter(
        F.col("event_type") == "purchase"
    ).count()
    got = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    ).collect()[0]
    assert got["n"] == direct["n"]
    assert abs(got["total_value"] - direct["total_value"]) < 1e-6
    assert n_purchases > 0


def test_crosstab_matches_groupby(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    )
    ct = ev.stat.crosstab("event_type", "dow").collect()
    direct = {
        (r["event_type"], str(r["dow"])): r["cnt"]
        for r in ev.groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for row in ct:
        key = row["event_type_dow"]
        for dow_col in row.asDict():
            if dow_col == "event_type_dow":
                continue
            expected = direct.get((key, dow_col), 0)
            assert row[dow_col] == expected, (key, dow_col)


def test_freq_items_superset_of_true_heavy_hitters(spark):
    docs = load_table(spark, SF_DIR, "documents")
    fi = docs.stat.freqItems(["lang"], support=0.15).collect()[0][
        "lang_freqItems"
    ]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    total = sum(r["c"] for r in counts)
    truly_frequent = {r["lang"] for r in counts if r["c"] / total >= 0.15}
    # freqItems guarantees a SUPERSET of the truly frequent values
    assert truly_frequent <= set(fi)


def test_sample_by_deterministic_with_seed(spark):
    ev = load_table(spark, SF_DIR, "events")
    fracs = {"purchase": 0.5, "click": 0.1}
    s1 = ev.stat.sampleBy("event_type", fracs, seed=42)
    s2 = ev.stat.sampleBy("event_type", fracs, seed=42)
    ids1 = sorted(r["event_id"] for r in s1.select("event_id").collect())
    ids2 = sorted(r["event_id"] for r in s2.select("event_id").collect())
    assert ids1 == ids2 and len(ids1) > 0
    kinds = {
        r["event_type"] for r in s1.select("event_type").distinct().collect()
    }
    assert kinds <= {"purchase", "click"}


def test_approx_quantile_brackets_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    lo, med, hi = ev.stat.approxQuantile(
        "value", [0.1, 0.5, 0.9], 0.01
    )
    exact = sorted(r["value"] for r in ev.select("value").collect())
    n = len(exact)
    # relativeError 0.01 → rank within ±n/100 of the target
    for q, got in ((0.1, lo), (0.5, med), (0.9, hi)):
        lo_rank = max(0, int(q * n) - max(2, n // 50))
        hi_rank = min(n - 1, int(q * n) + max(2, n // 50))
        assert exact[lo_rank] <= got <= exact[hi_rank], (q, got)


def test_map_in_arrow_partial_sums(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_quantity")

    def batch_sums(batches):
        for batch in batches:
            total = pa.compute.sum(batch.column("l_quantity")).as_py()
            yield pa.RecordBatch.from_pydict({"partial": [float(total)]})

    partials = li.mapInArrow(batch_sums, "partial double")
    merged = partials.agg(F.round(F.sum("partial"), 4).alias("s")).collect()[
        0
    ]["s"]
    direct = li.agg(F.round(F.sum("l_quantity"), 4).alias("s")).collect()[0][
        "s"
    ]
    assert abs(merged - direct) < 1e-3
