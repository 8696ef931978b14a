"""Window-function surface (SURVEY.md §2.4): ranking, lag/lead, running and
moving frames, RANGE frames, ntile, first/last, top-k.

Every window here orders on a deterministic total order (unique-key
tie-breaks, §2.1 rule 4). Scale notes: a window partitioned by a key is one
shuffle on that key and then a per-partition sort — the partition key choice
IS the partitioning strategy (user_id/custkey give millions of small groups,
which scale linearly). The two global windows (ntile, topk_global) note their
100 TB strategy inline.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 3
    """,
)
def q_win_rank(spark, sf_dir):
    """Top-3 orders per customer with all three ranking flavors. One shuffle
    on custkey; the rn<=3 filter is applied before any further stage, so only
    3 rows per customer move on."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_lag",
    oracle="""
    WITH g AS (
        SELECT user_id,
               date_diff('microsecond',
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) / 1000000.0 AS gap_s,
               date_diff('microsecond', ts,
                         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         ) / 1000000.0 AS next_s
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS events,
           CAST(COUNT(gap_s) AS BIGINT) AS gaps,
           ROUND(AVG(gap_s), 6) AS avg_gap_s,
           ROUND(AVG(next_s), 6) AS avg_next_s
    FROM g GROUP BY user_id
    """,
)
def q_win_lag(spark, sf_dir):
    """lag()/lead(): per-user gap to the previous and next event; the first
    event of each user has a NULL lag gap (counted via the events-vs-gaps
    difference), the last a NULL lead gap."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    ) / 1000000.0
    next_s = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    ) / 1000000.0
    return (
        T(spark, sf_dir, "events")
        .select("user_id", gap_s.alias("gap_s"), next_s.alias("next_s"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.count("gap_s").alias("gaps"),
            r6(F.avg("gap_s")).alias("avg_gap_s"),
            r6(F.avg("next_s")).alias("avg_next_s"),
        )
    )


@query(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_total
    FROM orders
    """,
)
def q_win_running(spark, sf_dir):
    """Running total per customer. The ORDER BY fixes the FP addition order
    identically on both engines, so the sums are bit-reproducible and r6 is
    safe even though magnitudes reach 1e6."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        r6(F.sum("o_totalprice").over(w)).alias("run_total"),
    )


@query(
    "q_win_moving",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
    FROM events
    """,
)
def q_win_moving(spark, sf_dir):
    """3-row moving average of event value per user (ROWS 2 PRECEDING)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return T(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        r6(F.avg("value").over(w)).alias("mavg"),
    )


@query(
    "q_win_range",
    oracle="""
    SELECT o_orderkey,
           CAST(COUNT(*) OVER (
               PARTITION BY o_orderstatus ORDER BY o_totalprice
               RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS nearby
    FROM orders
    """,
)
def q_win_range(spark, sf_dir):
    """RANGE frame keyed on a value offset: orders within 100.0 of the
    current price (peers included — identical semantics both engines).
    Expressed via SQL window syntax: the PySpark ``rangeBetween`` Python API
    only accepts long offsets, while the SQL form supports value-typed
    frame bounds."""
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice "
            "RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)"
        ).alias("nearby"),
    )


@query(
    "q_win_ntile",
    oracle="""
    WITH q AS (
        SELECT c_acctbal,
               CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
                   AS quartile
        FROM customer
    )
    SELECT quartile, CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(c_acctbal), 6) AS avg_bal
    FROM q GROUP BY quartile
    """,
)
def q_win_ntile(spark, sf_dir):
    """ntile(4) — an unpartitioned window, i.e. a single-partition global
    sort. Fine for a dimension table; for a 100 TB fact you'd switch to
    approxQuantile/percentile_approx cut-points + a broadcast bucketizer
    instead of forcing one sorted partition."""
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        T(spark, sf_dir, "customer")
        .select("c_acctbal", F.ntile(4).over(w).cast("bigint").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r6(F.avg("c_acctbal")).alias("avg_bal"),
        )
    )


@query(
    "q_win_firstlast",
    oracle="""
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER w AS last_key
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_firstlast(spark, sf_dir):
    """first/last over the full-partition frame (explicit UNBOUNDED BOTH —
    the default frame would make last_value degenerate to current row)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
        )
        .distinct()
    )


@query(
    "q_win_pctrank",
    oracle="""
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
    """,
)
def q_win_pctrank(spark, sf_dir):
    """percent_rank / cume_dist within order status. Ties on o_totalprice get
    identical ranks on both engines, so no tie-break column is needed."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        r6(F.percent_rank().over(w)).alias("pr"),
        r6(F.cume_dist().over(w)).alias("cd"),
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk_global(spark, sf_dir):
    """Global top-10: orderBy().limit() compiles to TakeOrderedAndProject —
    per-partition heaps of size k merged on the driver, never a full sort.
    This is already the two-stage top-k you'd hand-write at 100 TB."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_topk_pergroup",
    oracle="""
    SELECT * FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)
def q_topk_pergroup(spark, sf_dir):
    """Top-3 per market segment via rank-filter — the distributed per-group
    top-k idiom (window + filter), one shuffle on the group key."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_nth",
    oracle="""
    SELECT DISTINCT o_custkey,
           nth_value(o_orderkey, 2) OVER w AS second_key,
           LAG(o_orderkey, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
               AS lag2_key
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_nth(spark, sf_dir):
    """nth_value over the full-partition frame (the 2nd-biggest order per
    customer) alongside an offset lag — DISTINCT folds the per-row window
    results to one row per (custkey, second, lag2) combination."""
    order = (F.desc("o_totalprice"), "o_orderkey")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy(*order)
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
            F.lag("o_orderkey", 2).over(w_seq).alias("lag2_key"),
        )
        .distinct()
    )


@query(
    "q_win_range_time",
    oracle="""
    SELECT event_id,
           COUNT(*) OVER w AS n_10min,
           ROUND(SUM(value) OVER w, 6) AS sum_10min
    FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_time(spark, sf_dir):
    """Time-based RANGE frame: per user, count and value-sum of their events
    in the trailing 10 minutes — the sliding-lookback primitive behind rate
    limiting and burst detection. Ordering key is epoch MICROSECONDS as a
    long on BOTH engines (Spark `unix_micros` ↔ DuckDB `epoch_us`) so the
    frame boundary is bit-identical; ordering by the raw timestamp would pit
    Spark's second-cast against DuckDB's µs-precise INTERVAL arithmetic and
    disagree on boundary events. One shuffle on user_id; per-user partitions
    are bounded, and at 100 TB the same query becomes the watermarked
    sliding-window aggregate (q_stream_sliding) instead of a sort."""
    ev = T(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    frame = (
        "OVER (PARTITION BY user_id ORDER BY us "
        "RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "event_id",
        F.expr(f"count(*) {frame}").alias("n_10min"),
        r6(F.expr(f"sum(value) {frame}")).alias("sum_10min"),
    )


@query(
    "q_part_skyline",
    oracle="""
    WITH per_price AS (
        SELECT p_retailprice AS price, MAX(p_size) AS best_size
        FROM part GROUP BY p_retailprice
    ),
    frontier AS (
        SELECT price, best_size,
               MAX(best_size) OVER (ORDER BY price
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS best_cheaper
        FROM per_price
    ),
    sky AS (
        SELECT price, best_size FROM frontier
        WHERE best_cheaper IS NULL OR best_size > best_cheaper
    )
    SELECT p.p_partkey, ROUND(p.p_retailprice, 6) AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p JOIN sky s
      ON p.p_retailprice = s.price AND p.p_size = s.best_size
    """,
)
def q_part_skyline(spark, sf_dir):
    """Skyline (Pareto frontier) operator: parts not strictly dominated on
    (minimize p_retailprice, maximize p_size). Computed without the naive
    O(n²) dominance self-join: collapse to the max size per distinct price
    (same-price smaller parts are dominated), then a single running-max
    window ordered by price — a row survives iff its size beats every
    strictly-cheaper price's best. Equal (price, size) duplicates are
    mutually non-dominating and all kept. At 100 TB the same plan
    parallelizes by the standard skyline identity
    skyline(S) = skyline(∪ᵢ skyline(Sᵢ)): per-partition local frontiers
    shrink the window input to O(frontier) rows."""
    part = T(spark, sf_dir, "part")
    per_price = part.groupBy(
        F.col("p_retailprice").alias("price")
    ).agg(F.max("p_size").alias("best_size"))
    w = Window.orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        per_price.withColumn(
            "best_cheaper", F.max("best_size").over(w)
        )
        .filter(
            F.col("best_cheaper").isNull()
            | (F.col("best_size") > F.col("best_cheaper"))
        )
        .select("price", "best_size")
    )
    return part.join(
        F.broadcast(sky),
        (F.col("p_retailprice") == F.col("price"))
        & (F.col("p_size") == F.col("best_size")),
    ).select(
        "p_partkey",
        r6("p_retailprice").alias("price"),
        F.col("p_size").cast("bigint").alias("size"),
    )


@query(
    "q_win_moving_median",
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate)::DATE AS month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT month, n_orders,
           ROUND(quantile_cont(rev, 0.5) OVER (
               ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 0) AS moving_median_rev
    FROM monthly
    """,
)
def q_win_moving_median(spark, sf_dir):
    """3-month moving MEDIAN of monthly order revenue — the robust trend
    smoother (a moving mean chases outlier months; the median does not).
    Spark's `percentile` aggregate runs as a window function with linear
    interpolation, matching DuckDB's quantile_cont: a full 3-row frame
    picks the middle element exactly, the 1–2-row warm-up frames
    interpolate identically. The heavy lifting is the monthly pre-
    aggregate (one fact shuffle to O(months) rows); the window then costs
    nothing. Median rounded to integer (r0): monthly sums are ~1e8, where
    cross-engine FP noise exceeds the round-6 grid but is ~1e-5 of r0's."""
    o = T(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("rev"),
    )
    w = Window.orderBy("month").rowsBetween(-2, 0)
    return monthly.select(
        "month",
        "n_orders",
        F.round(F.expr("percentile(rev, 0.5)").over(w), 0).alias(
            "moving_median_rev"
        ),
    )


@query(
    "q_win_share",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment,
               SUM(o_totalprice) AS rev,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_orders,
           ROUND(rev, 0) AS revenue,
           ROUND(rev / SUM(rev) OVER (), 6) AS share
    FROM seg
    """,
)
def q_win_share(spark, sf_dir):
    """Ratio-to-report: each market segment's share of total order revenue
    via an unpartitioned window sum over the pre-aggregated 5-row frame —
    the percent-of-total idiom. The global window is safe exactly because
    it runs AFTER the groupBy collapsed the join to O(segments) rows; at
    100 TB the anti-pattern is windowing the raw fact table, the pattern
    is aggregate-then-window. Revenue r0 (1e9-scale sum), share r6 (a
    bounded ratio)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    seg = (
        c.select("c_custkey", "c_mktsegment")
        .join(o.select("o_custkey", "o_totalprice"),
              F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum("o_totalprice").alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy()
    return seg.select(
        "c_mktsegment",
        "n_orders",
        F.round("rev", 0).alias("revenue"),
        r6(F.col("rev") / F.sum("rev").over(w)).alias("share"),
    )


@query(
    "q_topk_withties",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY c_mktsegment
                            ORDER BY ROUND(o_totalprice, 2) DESC) AS rnk
        FROM customer JOIN orders ON c_custkey = o_custkey
    )
    SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk,
           o_orderkey, o_totalprice
    FROM ranked WHERE rnk <= 3
    """,
)
def q_topk_withties(spark, sf_dir):
    """Top-3 orders per segment WITH TIES — rank() keeps every row that
    ties the third price, where q_topk_pergroup's row_number() arbitrarily
    breaks the tie (the FETCH FIRST ... WITH TIES semantics). Because the
    kept SET is defined by the ordering value itself, ties make the result
    deterministic without a unique-key tie-break — the rank is computed on
    the ROUND-2 price so a cross-engine ULP wiggle cannot split a tie
    group. Same single window shuffle on the group key as every per-group
    top-k; output size is k + tie overflow."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    j = c.select("c_custkey", "c_mktsegment").join(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        F.col("c_custkey") == F.col("o_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.round("o_totalprice", 2).desc()
    )
    return (
        j.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            F.col("rnk").cast("bigint").alias("rnk"),
            "o_orderkey",
            "o_totalprice",
        )
    )
