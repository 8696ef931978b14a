"""Streaming surface, batch-equivalent declarations (SURVEY.md §2.7).

Structured Streaming's unified semantics guarantee that a windowed aggregation
over a bounded stream equals the same aggregation run in batch (Armbrust et
al., SIGMOD'18). These queries are the hash-checked batch side; the live
``readStream`` twins — asserted equal in pytest — live in
``mapreduce_machine_learning_spark/streaming/live.py``.

Scale notes: event-time windows group by (window, key), so state is bounded by
watermarking in the live variant; ``F.window``/``F.session_window`` are
built-in JVM generators, not UDFs. At 100 TB/day the tumbling agg is an
embarrassingly parallel shuffle on (window, type) — salting is unnecessary
because the window key rotates hourly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query


@query(
    "q_stream_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 6) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    GROUP BY window_start, event_type
    """,
)
def q_stream_tumble(spark, sf_dir):
    """1-hour tumbling windows per event type (count, value sum, distinct
    users). `F.window` ↔ `time_bucket` — both epoch-aligned."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r6(F.sum("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
            "users",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts)
               - (k * INTERVAL '15 minutes') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 6) AS sum_value
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS offs(k)
    GROUP BY window_start
    """,
)
def q_stream_sliding(spark, sf_dir):
    """1-hour windows hopping every 15 minutes — every event lands in exactly
    4 windows. The oracle reconstructs hop membership by cross-joining the 4
    offsets of the 15-minute grid."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r6(F.sum("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "cnt", "sum_value")
    )


@query(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR date_diff('microsecond',
                                      LAG(ts) OVER (PARTITION BY user_id ORDER BY ts),
                                      ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS events_in_session,
               date_diff('microsecond', MIN(ts), MAX(ts)) / 1000000.0 AS span_s
        FROM sessions
        GROUP BY user_id, session_id
    )
    SELECT events_in_session,
           CAST(COUNT(*) AS BIGINT) AS num_sessions,
           ROUND(AVG(span_s), 6) AS avg_span_s
    FROM per_session
    GROUP BY events_in_session
    """,
)
def q_stream_session(spark, sf_dir):
    """30-minute-gap session windows per user, folded to a histogram of
    session sizes with average span. Spark's built-in `session_window`
    (batch mode) vs the oracle's gaps-and-islands rewrite; a gap of exactly
    30 min extends the session on both engines (oracle LAG uses strict >).
    Session merging is one shuffle on user_id."""
    ev = T(spark, sf_dir, "events")
    per_session = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("events_in_session"),
            (
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / 1000000.0
            ).alias("span_s"),
        )
    )
    return per_session.groupBy("events_in_session").agg(
        F.count(F.lit(1)).alias("num_sessions"),
        r6(F.avg("span_s")).alias("avg_span_s"),
    )


@query(
    "q_stream_latedata",
    oracle="""
    WITH arr AS (
        SELECT ts,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS max_seen
        FROM events
    )
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS dropped
    FROM arr
    WHERE max_seen IS NOT NULL
      AND time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
            <= max_seen - INTERVAL '1 hour'
    GROUP BY window_start
    """,
)
def q_stream_latedata(spark, sf_dir):
    """Watermark-drop model: replay events in arrival order (= event_id),
    track the running max event time; an event is dropped iff its 1-hour
    tumbling window already closed under a 1-hour watermark
    (window_end <= max_seen - 1h). This is exactly the rows a
    `withWatermark('ts', '1 hour')` stream discards — the live twin is
    asserted against this in pytest."""
    ev = T(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    bucket = F.window("ts", "1 hour").getField("start")
    return (
        ev.withColumn("max_seen", F.max("ts").over(w))
        .filter(
            F.col("max_seen").isNotNull()
            & (
                bucket + F.expr("INTERVAL 1 HOUR")
                <= F.col("max_seen") - F.expr("INTERVAL 1 HOUR")
            )
        )
        .groupBy(bucket.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("dropped"))
    )


@query(
    "q_stream_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS lo,
               time_bucket(INTERVAL '1 hour', MAX(ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL '1 hour')) AS window_start
        FROM bounds
    ),
    actual AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY window_start
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS hours,
           CAST(SUM(CASE WHEN a.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS empty_hours,
           CAST(SUM(COALESCE(a.cnt, 0)) AS BIGINT) AS purchases
    FROM grid g LEFT JOIN actual a ON g.window_start = a.window_start
    """,
)
def q_stream_gapfill(spark, sf_dir):
    """Gap filling: generate the complete hourly grid between the first and
    last event (sequence + explode), left-join actual per-hour purchase
    counts, and report how many hours had none — time-series densification,
    the step dashboards and forecasting inputs need because absent rows are
    not zero rows. The grid generates from one aggregated row, so the only
    real cost is the left join against the hourly aggregate."""
    ev = T(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("window_start")
    )
    actual = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    g = grid.join(actual, "window_start", "left")
    return g.agg(
        F.count(F.lit(1)).alias("hours"),
        F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0)).alias("empty_hours"),
        F.sum(F.coalesce("cnt", F.lit(0))).alias("purchases"),
    )


@query(
    "q_stream_trending",
    oracle="""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY window_start, event_type
    ),
    ranked AS (
        SELECT window_start, event_type, cnt,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY window_start
                   ORDER BY cnt DESC, event_type) AS BIGINT) AS rnk
        FROM hourly
    )
    SELECT window_start, event_type, cnt, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_stream_trending(spark, sf_dir):
    """Trending events: top-3 event types per 1-hour window (count DESC,
    event_type tie-break) — the windowed-aggregate + per-window rank
    composition behind every "trending now" feed. Both stages key on
    window_start, so the rank reuses the aggregate's partitioning; in live
    streaming the same plan runs per micro-batch over the windowed state."""
    ev = T(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt"
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("cnt"), "event_type"
    )
    return (
        hourly.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_stream_ewma",
    oracle="""
    WITH daily AS (
        SELECT event_type, ts::DATE AS day, AVG(value) AS m
        FROM events GROUP BY event_type, ts::DATE
    ),
    idx AS (
        SELECT event_type, day, m,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS t,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           ROUND(SUM(CASE WHEN t = 1 THEN POW(0.7, n - 1) * m
                          ELSE 0.3 * POW(0.7, n - t) * m END), 6) AS ewma,
           ROUND(MAX(CASE WHEN t = n THEN m END), 6) AS last_daily_mean
    FROM idx GROUP BY event_type
    """,
)
def q_stream_ewma(spark, sf_dir):
    """Exponentially weighted moving average (α = 0.3) of each event type's
    daily-mean series, evaluated at the final day. The recursion
    s_t = α·x_t + (1−α)·s_{t−1} telescopes to the closed form
    s_N = (1−α)^{N−1}·x_1 + Σ_{t>1} α(1−α)^{N−t}·x_t — a weighted SUM, so
    the 'stateful' smoother becomes one stateless aggregate over the tiny
    (type, day) frame: no sequential scan, no UDF, and at 100 TB the only
    fact-table work is the daily partial-mean shuffle. pow() feeds a
    round-6 output of O(100) magnitude — far inside cross-engine libm
    noise. The live-streaming twin would carry s_t as
    applyInPandasWithState state; the batch closed form is the oracle for
    it."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.avg("value").alias("m"))
    wp = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "m",
        F.row_number().over(wp.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    alpha = 0.3
    w_first = F.pow(F.lit(1 - alpha), F.col("n") - 1) * F.col("m")
    w_rest = (
        F.lit(alpha)
        * F.pow(F.lit(1 - alpha), F.col("n") - F.col("t"))
        * F.col("m")
    )
    return idx.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        r6(
            F.sum(F.when(F.col("t") == 1, w_first).otherwise(w_rest))
        ).alias("ewma"),
        r6(
            F.max(F.when(F.col("t") == F.col("n"), F.col("m")))
        ).alias("last_daily_mean"),
    )
