"""Hand-computed edge-case semantics on tiny literal frames (SURVEY §5.2
item 2): outer-join null propagation, null-skipping counts, rollup subtotal
vs data-null disambiguation, session-window gap boundary, explode of empty
arrays."""

from pyspark.sql import functions as F


def test_left_join_null_propagation(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, l string")
    right = spark.createDataFrame([(1, 10.0), (1, 20.0)], "id int, r double")
    out = {
        (r["id"], r["l"], r["r"])
        for r in left.join(right, "id", "left").collect()
    }
    assert out == {(1, "a", 10.0), (1, "a", 20.0), (2, "b", None), (3, "c", None)}


def test_count_col_skips_nulls_count_star_does_not(spark):
    df = spark.createDataFrame([(1, None), (1, 2.0), (2, None)], "k int, v double")
    r = {
        row["k"]: (row["c_star"], row["c_v"])
        for row in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c_star"), F.count("v").alias("c_v"))
        .collect()
    }
    assert r == {1: (2, 1), 2: (1, 0)}


def test_rollup_grouping_flag_disambiguates_data_nulls(spark):
    # a data row whose key IS null must be distinguishable from the subtotal
    df = spark.createDataFrame([("x", 1), (None, 2), ("x", 3)], "k string, v int")
    rows = (
        df.rollup("k")
        .agg(F.sum("v").alias("s"), F.grouping("k").alias("g"))
        .collect()
    )
    by = {(r["k"], r["g"]): r["s"] for r in rows}
    assert by[("x", 0)] == 4
    assert by[(None, 0)] == 2  # genuine null key, g=0
    assert by[(None, 1)] == 6  # rollup total, g=1


def test_session_window_gap_boundary(spark):
    # events 29m59s apart chain into ONE session; >30m gap splits.
    base = 1_700_000_000
    df = spark.createDataFrame(
        [(1, base), (1, base + 1799), (1, base + 1799 + 1801)],
        "user_id int, epoch long",
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    n = df.groupBy(F.session_window("ts", "30 minutes"), "user_id").count().count()
    assert n == 2


def test_explode_drops_empty_posexplode_outer_keeps(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, [])], "id int, xs array<string>")
    assert df.select(F.explode("xs")).count() == 2
    kept = df.select("id", F.explode_outer("xs").alias("x")).collect()
    assert {(r["id"], r["x"]) for r in kept} == {(1, "a"), (1, "b"), (2, None)}


def test_intersect_is_set_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    b = spark.createDataFrame([(1,), (1,), (3,)], "v int")
    assert [r["v"] for r in a.intersect(b).collect()] == [1]
    assert a.intersectAll(b).count() == 2  # bag semantics keeps the pair


def test_approx_count_distinct_within_rsd(spark):
    """The rows-only HLL query must land within the sketch's documented
    relative standard deviation of the exact distinct count (default rsd
    0.05 → assert a generous 4σ = 20% envelope)."""
    from mapreduce_machine_learning_spark.io import load_table
    from mapreduce_machine_learning_spark.registry import all_queries
    from tests.conftest import SF_DIR

    qs = all_queries()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in qs["q_agg_approx"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(2, 0.2 * e), (k, approx[k], e)


def test_approx_percentile_within_rank_error(spark):
    """percentile_approx(accuracy=1000) guarantees rank error ≤ n/1000;
    assert the approximate p50 sits between the exact p45 and p55."""
    from mapreduce_machine_learning_spark.io import load_table
    from mapreduce_machine_learning_spark.registry import all_queries
    from tests.conftest import SF_DIR

    qs = all_queries()
    approx = {
        r["o_orderstatus"]: r["p50_approx"]
        for r in qs["q_agg_approx_percentile"](spark, SF_DIR).collect()
    }
    bounds = {
        r["o_orderstatus"]: (r["lo"], r["hi"])
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.45)).alias("lo"),
            F.percentile("o_totalprice", F.lit(0.55)).alias("hi"),
        )
        .collect()
    }
    for k, (lo, hi) in bounds.items():
        assert lo <= approx[k] <= hi, (k, approx[k], lo, hi)
