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


def test_sweep_line_half_open_boundary_no_double_count(spark):
    """An interval closing at the exact instant another opens must not
    overlap under the [s, s+d) half-open rule: the (t, delta) tie-break
    (close = -1 sorts before open = +1) keeps peak concurrency at 1."""
    from pyspark.sql import Window

    pts = spark.createDataFrame(
        [(0, 1), (10, -1), (10, 1), (20, -1)], "t int, delta int"
    )
    w = Window.orderBy("t", "delta")
    peak = (
        pts.select(F.sum("delta").over(w).alias("live"))
        .agg(F.max("live"))
        .collect()[0][0]
    )
    assert peak == 1


def test_sweep_line_equal_time_peers_share_post_group_sum(spark):
    """Two intervals opening at the same instant: the default RANGE frame
    gives every peer row the post-peer-group running sum, so the peak is 2
    regardless of intra-tie row order."""
    from pyspark.sql import Window

    pts = spark.createDataFrame(
        [(0, 1), (0, 1), (5, -1), (5, -1)], "t int, delta int"
    )
    w = Window.orderBy("t", "delta")
    rows = sorted(
        r["live"]
        for r in pts.select(F.sum("delta").over(w).alias("live")).collect()
    )
    assert rows == [0, 0, 2, 2]


def test_min_by_composite_string_key_breaks_timestamp_ties(spark):
    """OHLC open/close determinism: with identical timestamps, the
    zero-padded epoch‖id string key picks the lower id for open and the
    higher for close."""
    df = spark.createDataFrame(
        [(100, 1, 10.0), (100, 2, 20.0), (200, 3, 30.0)],
        "ts_us long, event_id int, value double",
    )
    keyed = df.select(
        "value",
        F.concat(
            F.lpad(F.col("ts_us").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("ord"),
    )
    r = keyed.agg(
        F.min_by("value", "ord").alias("open"),
        F.max_by("value", "ord").alias("close"),
    ).collect()[0]
    assert r["open"] == 10.0 and r["close"] == 30.0


def test_merge_classification_exhaustive_on_literals(spark):
    """MERGE classification on a 3-user literal frame: one user only
    before the cutoff, one only after, one on both sides."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [
            (1, 5, "a", 1.0),   # retained
            (2, 15, "b", 2.0),  # updated (old)
            (2, 25, "c", 3.0),  # updated (new wins)
            (3, 30, "d", 4.0),  # inserted
        ],
        "user_id int, t int, state string, value double",
    )
    cutoff = 20
    w = Window.partitionBy("user_id").orderBy(F.desc("t"))

    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("user_id", "state", "value")
        )

    old = latest(ev.filter(F.col("t") <= cutoff))
    new = latest(ev.filter(F.col("t") > cutoff))
    merged = {
        r["user_id"]: (r["action"], r["fv"])
        for r in old.alias("o")
        .join(new.alias("n"), F.col("o.user_id") == F.col("n.user_id"), "full")
        .select(
            F.coalesce(F.col("o.user_id"), F.col("n.user_id")).alias("user_id"),
            F.when(F.col("o.user_id").isNull(), "inserted")
            .when(F.col("n.user_id").isNull(), "retained")
            .otherwise("updated")
            .alias("action"),
            F.coalesce(F.col("n.value"), F.col("o.value")).alias("fv"),
        )
        .collect()
    }
    assert merged == {
        1: ("retained", 1.0),
        2: ("updated", 3.0),
        3: ("inserted", 4.0),
    }


def test_symspell_deletion_blocking_has_full_recall(spark):
    """Every levenshtein-distance-≤1 pair over a small vocab must be
    reachable through a shared deletion variant (the SymSpell recall
    guarantee the q_text_symspell join relies on)."""
    vocab = ["cat", "cut", "cats", "at", "dog", "dogs", "cot", "coat"]
    df = spark.createDataFrame([(t,) for t in vocab], "tok string")
    deletions = df.select(
        "tok",
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok)),"
                " i -> concat(substr(tok, 1, i - 1),"
                " substr(tok, i + 1, length(tok))))"
            )
        ).alias("v"),
    )
    variants = (
        df.select("tok", F.col("tok").alias("v"))
        .unionByName(deletions)
        .distinct()
    )
    a, b = variants.alias("a"), variants.alias("b")
    got = {
        (r["ta"], r["tb"])
        for r in a.join(
            b,
            (F.col("a.v") == F.col("b.v")) & (F.col("a.tok") < F.col("b.tok")),
        )
        .select(F.col("a.tok").alias("ta"), F.col("b.tok").alias("tb"))
        .distinct()
        .filter(F.levenshtein("ta", "tb") <= 1)
        .collect()
    }

    def lev1(x, y):
        if x == y:
            return True
        if abs(len(x) - len(y)) > 1:
            return False
        if len(x) == len(y):
            return sum(a != b for a, b in zip(x, y)) == 1
        s, l = (x, y) if len(x) < len(y) else (y, x)
        return any(l[:i] + l[i + 1:] == s for i in range(len(l)))

    expected = {
        (min(x, y), max(x, y))
        for i, x in enumerate(vocab)
        for y in vocab[i + 1:]
        if lev1(x, y)
    }
    assert got == expected
