"""Relational core (SURVEY.md §2.2): scans, filters, and all join shapes.

Scale notes, applied throughout:
- Scans stay declarative so Catalyst pushes predicates and prunes columns into
  the parquet reader (`PushedFilters`/`ReadSchema` — asserted in
  tests/test_plans.py). At 100 TB the scan is the dominant cost; a filter that
  doesn't reach the reader re-reads the lake.
- Dimension joins (region/nation/part/customer-vs-fact) take an explicit
  `broadcast()` hint where we *know* the dim side stays small at production
  scale; fact-fact joins are left to Catalyst (sort-merge + AQE skew split).
- The range/as-of joins document their 100 TB strategy inline: time-bucket
  binning turns the theta join into an equi-join (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import REVENUE_SQL, r0, r6, revenue
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query


@query(
    "q_scan_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key
    FROM lineitem
    """,
)
def q_scan_stats(spark, sf_dir):
    """Footer-level scan stats. Catalyst can answer COUNT/MIN/MAX of a parquet
    table from metadata when aggregate pushdown is on; either way no shuffle of
    data rows — one row per partition."""
    return T(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey < 100
    """,
)
def q_scan_project(spark, sf_dir):
    """Projection + pushed filter, raw rows out. The plan must show
    PushedFilters=[LessThan(l_orderkey,100)] and ReadSchema with exactly three
    columns — the 100 TB version reads 3/11 of the column data and only
    row-groups whose zone map admits l_orderkey<100."""
    return (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .filter(F.col("l_orderkey") < 100)
    )


@query(
    "q_filter_pred",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM({REVENUE_SQL}), 0) AS revenue
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
      AND l_returnflag IN ('A', 'R')
      AND NOT l_linestatus = 'O'
    """,
)
def q_filter_pred(spark, sf_dir):
    """Compound predicate: AND/NOT composition, BETWEEN, IN-list — all pushed
    to the scan as native parquet filters."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
            & F.col("l_returnflag").isin("A", "R")
            & ~(F.col("l_linestatus") == "O")
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            r0(F.sum(revenue())).alias("revenue"),
        )
    )


@query(
    "q_filter_like",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM part
    WHERE p_name LIKE '%ar%'
    GROUP BY p_brand
    """,
)
def q_filter_like(spark, sf_dir):
    """LIKE '%..%' — contains() pushed as a StringContains parquet filter."""
    return (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%ar%"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_join_inner",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_inner(spark, sf_dir):
    """Plain inner equi-join, strategy left to Catalyst: with stats it picks
    broadcast-hash here (customer is small); at 100 TB fact-fact scale AQE
    falls back to sort-merge with skew splitting."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r6(F.avg("o_totalprice")).alias("avg_price"),
        )
    )


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT p_brand, ROUND(SUM({REVENUE_SQL}), 0) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast(spark, sf_dir):
    """Fact ⋈ dim with an explicit broadcast hint: part stays MBs at any fact
    scale, so the join is shuffle-free — each lineitem partition probes a
    replicated hash map, and only 25 brand rows reach the agg exchange."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(r0(F.sum(revenue())).alias("revenue"))
    )


@query(
    "q_join_multi",
    oracle=f"""
    SELECT c_mktsegment, o_orderpriority, ROUND(SUM({REVENUE_SQL}), 0) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_mktsegment, o_orderpriority
    ORDER BY revenue DESC, c_mktsegment, o_orderpriority
    LIMIT 10
    """,
)
def q_join_multi(spark, sf_dir):
    """3-way join → agg → deterministic top-10 (revenue DESC, then the full
    group key as tie-break — §2.1 rule 4). Shaped dim-first: customer⋈orders
    (both pruned to the needed columns) builds the small side, then joins the
    lineitem fact. Deliberately NO broadcast hint on the dim result: AQE
    measures it at runtime and converts to broadcast-hash here (~15% faster
    than the hinted chain at sf0.1), while at 100 TB — where orders is a
    fact, not a dim — the same code degrades gracefully to sort-merge.
    orderBy().limit() compiles to TakeOrderedAndProject: per-partition
    top-10 heaps, never a global sort."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    dim = (
        c.select("c_custkey", "c_mktsegment")
        .join(
            o.select("o_custkey", "o_orderkey", "o_orderpriority"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("o_orderkey", "c_mktsegment", "o_orderpriority")
    )
    return (
        li.select("l_orderkey", revenue().alias("rev"))
        .join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(r0(F.sum("rev")).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_mktsegment", "o_orderpriority")
        .limit(10)
    )


@query(
    "q_join_left",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT order_count, CAST(COUNT(*) AS BIGINT) AS num_customers
    FROM per_cust
    GROUP BY order_count
    """,
)
def q_join_left(spark, sf_dir):
    """LEFT JOIN with null-skipping count(o_orderkey): customers without
    orders survive with count 0; second agg folds to a histogram."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
        .groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("num_customers"))
    )


@query(
    "q_join_right",
    oracle="""
    SELECT n_name, CAST(COUNT(s_suppkey) AS BIGINT) AS suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_right(spark, sf_dir):
    """RIGHT JOIN: every nation appears, nations without suppliers count 0."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("suppliers"))
    )


@query(
    "q_join_full",
    oracle="""
    WITH l AS (SELECT DISTINCT o_custkey FROM orders),
         r AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT CASE WHEN o_custkey IS NULL THEN 'right_only'
                WHEN c_custkey IS NULL THEN 'left_only'
                ELSE 'both' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM l FULL OUTER JOIN r ON o_custkey = c_custkey
    GROUP BY bucket
    """,
)
def q_join_full(spark, sf_dir):
    """FULL OUTER of two key sets, bucketed into left-only/right-only/both."""
    o = T(spark, sf_dir, "orders").select("o_custkey").distinct()
    r = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    return (
        o.join(r, o.o_custkey == r.c_custkey, "full")
        .select(
            F.when(F.col("o_custkey").isNull(), "right_only")
            .when(F.col("c_custkey").isNull(), "left_only")
            .otherwise("both")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_join_semi(spark, sf_dir):
    """LEFT SEMI — existence probe that never duplicates the left side and
    never materializes right columns (the 100 TB-friendly way to write
    'has at least one order')."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    GROUP BY c_mktsegment
    """,
)
def q_join_anti(spark, sf_dir):
    """LEFT ANTI: customers with no order above 300k. (Every customer in the
    testdata has ≥1 order, so the bare 'no orders' anti-join of SURVEY §2.2
    would be vacuously empty; the price predicate keeps the same operator
    shape with a non-degenerate result.)"""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
)
def q_join_cross(spark, sf_dir):
    """Explicit cartesian of two tiny sets (5 × 3). Cross joins are only ever
    sane when one side is provably small — here both are."""
    r = T(spark, sf_dir, "region").select("r_name")
    st = T(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st)


@query(
    "q_join_range",
    oracle="""
    SELECT e1.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    GROUP BY e1.user_id
    """,
)
def q_join_range(spark, sf_dir):
    """Interval self-join: event pairs of the same user within 5 minutes,
    executed as a BINNED EQUI-JOIN (SURVEY.md §4): ts is floored into
    5-minute buckets; the left side is exploded to {bucket, bucket+1} so
    every qualifying pair (0 < ts2−ts1 ≤ 5 min spans at most one bucket
    boundary) meets on exactly one (user_id, bucket) key; the exact interval
    predicate remains as a residual filter. The join key space is
    (user × time-bucket), so hot users no longer form O(n²) per-user
    comparison groups — the theta-join is now a bounded equi-join that
    shuffles on a composite key AQE can further split. Each pair meets on
    ONE key value (e2's own bucket), so no dedup step is needed."""
    ev = T(spark, sf_dir, "events").select("user_id", "ts")
    us = F.unix_micros(F.col("ts"))
    bucket = F.floor(us / 300000000)  # 5 min = 3e8 µs, exact integer math
    e1 = ev.select(
        "user_id",
        F.col("ts").alias("ts1"),
        F.explode(F.array(bucket, bucket + 1)).alias("bkt"),
    )
    e2 = ev.select(
        F.col("user_id").alias("u2"),
        F.col("ts").alias("ts2"),
        bucket.alias("bkt2"),
    )
    residual = (F.col("ts2") > F.col("ts1")) & (
        F.unix_micros("ts2") <= F.unix_micros("ts1") + 300000000
    )
    return (
        e1.join(
            e2,
            (F.col("user_id") == F.col("u2")) & (F.col("bkt") == F.col("bkt2")),
        )
        .filter(residual)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("pairs"))
    )


@query(
    "q_join_asof",
    oracle="""
    WITH enriched AS (
        SELECT event_type, ts,
               MAX(CASE WHEN event_type = 'signup' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_signup_ts
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(last_signup_ts) AS BIGINT) AS matched,
           ROUND(AVG(date_diff('microsecond', last_signup_ts, ts) / 1000000.0), 6)
               AS avg_gap_s
    FROM enriched
    GROUP BY event_type
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: latest signup of the same user at-or-before each event.
    Spark has no native ASOF, so it's expressed as a running MAX over a
    conditional column — a RANGE frame so same-timestamp peers are included
    on both engines (identical `s.ts <= e.ts` semantics, no tie-break
    needed). One window pass over a single shuffle by user_id; at 100 TB
    this beats the join formulation (no row multiplication) and partitions
    by the session key."""
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    gap_s = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_signup_ts"))
    ) / 1000000.0
    return (
        ev.withColumn("last_signup_ts", last_signup)
        .groupBy("event_type")
        .agg(
            F.count("last_signup_ts").alias("matched"),
            r6(F.avg(gap_s)).alias("avg_gap_s"),
        )
    )


_CORR_SQL = """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS rich_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
    )
    GROUP BY n_name
"""


@query("q_join_corr_subquery", oracle=_CORR_SQL)
def q_join_corr_subquery(spark, sf_dir):
    """Correlated scalar subquery: customers above their own nation's average
    balance. Catalyst decorrelates this into an aggregate + join (no
    per-row re-execution — the reference would need a second full MapReduce
    pass to materialize the averages). Identical SQL text runs on both
    engines via the registered views."""
    from mapreduce_machine_learning_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CORR_SQL)


_LATERAL_SQL = """
    SELECT n.n_name, top_s.s_name, ROUND(top_s.s_acctbal, 6) AS s_acctbal
    FROM nation n,
    LATERAL (
        SELECT s_name, s_acctbal
        FROM supplier s
        WHERE s.s_nationkey = n.n_nationkey
        ORDER BY s_acctbal DESC, s_name
        LIMIT 1
    ) AS top_s
"""


@query("q_join_lateral", oracle=_LATERAL_SQL)
def q_join_lateral(spark, sf_dir):
    """LATERAL join: for each nation, its top supplier by balance — a
    correlated per-row subquery that Catalyst decorrelates into a window
    rank + join (no per-row re-execution). Identical SQL both engines;
    nations without suppliers drop out (inner lateral)."""
    from mapreduce_machine_learning_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "q_join_pit",
    oracle="""
    WITH f AS (
        SELECT event_type,
               COUNT(*) OVER w AS trailing_cnt,
               AVG(value) OVER w AS trailing_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(trailing_cnt AS BIGINT) AS trailing_cnt,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(AVG(trailing_avg), 6) AS avg_trailing_value
    FROM f
    WHERE event_type = 'purchase'
    GROUP BY trailing_cnt
    """,
)
def q_join_pit(spark, sf_dir):
    """Point-in-time feature join — the feature-store kernel that keeps
    training data leakage-free: for every purchase event, the user's
    activity count and mean value over the trailing hour STRICTLY BEFORE
    the event (RANGE frame ending 1 µs back — the event itself and
    same-instant rows never leak into their own features). Folded to a
    histogram by trailing count. Spark needs no join at all: a RANGE window
    over epoch-microseconds computes the per-event features in one shuffle
    on user_id — contrast with the naive events×events interval self-join
    this replaces (q_join_range shows that shape); at 100 TB the window
    form is O(n log n) per user vs O(n²). The frame bound is integer
    microseconds on both engines, so frame membership is exact; the outer
    avg is round-6 on O(100) magnitudes."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1000000, -1)
    )
    f = ev.select(
        "event_type",
        F.count(F.lit(1)).over(w).alias("trailing_cnt"),
        F.avg("value").over(w).alias("trailing_avg"),
    )
    return (
        f.filter(F.col("event_type") == "purchase")
        .groupBy("trailing_cnt")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            r6(F.avg("trailing_avg")).alias("avg_trailing_value"),
        )
    )


@query(
    "q_scan_zonemap",
    oracle="""
    WITH zones AS (
        SELECT l_orderkey // 10000 AS zone,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_shipdate) AS zmin,
               MAX(l_shipdate) AS zmax
        FROM lineitem GROUP BY l_orderkey // 10000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_zones,
           CAST(SUM(CASE WHEN zmax < TIMESTAMP '1997-01-01 00:00:00'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
           CAST(SUM(CASE WHEN zmax < TIMESTAMP '1997-01-01 00:00:00'
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
           ROUND(SUM(CASE WHEN zmax < TIMESTAMP '1997-01-01 00:00:00'
                          THEN n_rows ELSE 0 END)
                 / CAST(SUM(n_rows) AS DOUBLE), 6) AS skip_ratio
    FROM zones
    """,
)
def q_scan_zonemap(spark, sf_dir):
    """Zone-map (data-skipping) audit: bucket lineitem into orderkey zones
    of ~10k keys, compute each zone's shipdate min/max — the footer
    statistics a parquet row group carries — and measure how many zones a
    `l_shipdate >= '1997-01-01'` scan could skip outright. This is the
    measurement behind every layout decision at 100 TB: zones clustered
    on the filter column skip ~(selectivity) of the data for free, while
    uncorrelated layout skips nothing, and the skip_ratio is the number
    that tells you whether re-sorting (or Z-ordering) the table pays for
    itself. The audit itself is one hash aggregate over the zone key plus
    a 4-number roll-up."""
    li = T(spark, sf_dir, "lineitem")
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    zones = li.groupBy(
        F.expr("l_orderkey DIV 10000").alias("zone")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("zmin"),
        F.max("l_shipdate").alias("zmax"),
    )
    skippable = F.col("zmax") < cutoff
    return zones.agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum(F.when(skippable, 1).otherwise(0))
        .cast("bigint")
        .alias("n_skippable"),
        F.sum(F.when(skippable, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_skipped"),
        r6(
            F.sum(F.when(skippable, F.col("n_rows")).otherwise(0))
            / F.sum("n_rows")
        ).alias("skip_ratio"),
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH a AS (
        SELECT NULLIF(o_orderstatus, 'O') AS k, COUNT(*) AS cnt_orders
        FROM orders GROUP BY 1
    ),
    b AS (
        SELECT NULLIF(l_linestatus, 'O') AS k, COUNT(*) AS cnt_lines
        FROM lineitem GROUP BY 1
    )
    SELECT a.k AS status_key,
           CAST(a.cnt_orders AS BIGINT) AS cnt_orders,
           CAST(b.cnt_lines AS BIGINT) AS cnt_lines
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_join_nullsafe(spark, sf_dir):
    """Null-safe equality join (Spark `eqNullSafe` / SQL `IS NOT DISTINCT
    FROM`): both sides NULL-out the 'O' status so the join must match
    NULL = NULL — the semantics a plain equi-join silently drops. Spark
    still plans this as a hash join (null-safe keys hash like ordinary
    values), so the shape stays broadcast/SMJ at scale; the output carries
    the NULL-keyed row to prove the match happened."""
    o = (
        T(spark, sf_dir, "orders")
        .groupBy(
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k")
        )
        .agg(F.count(F.lit(1)).alias("cnt_orders"))
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .groupBy(
            F.nullif(F.col("l_linestatus"), F.lit("O")).alias("k2")
        )
        .agg(F.count(F.lit(1)).alias("cnt_lines"))
    )
    return o.join(li, F.col("k").eqNullSafe(F.col("k2"))).select(
        F.col("k").alias("status_key"),
        F.col("cnt_orders").cast("bigint").alias("cnt_orders"),
        F.col("cnt_lines").cast("bigint").alias("cnt_lines"),
    )
