"""Product/behavioral analytics over the ``events`` stream table.

Classic event-analytics operators a warehouse user expects alongside the
relational core: staged conversion funnels and cohort retention. Both are
expressed as pure DataFrame aggregations/joins (no UDFs, no window state),
so at 100 TB they reduce to shuffles on ``user_id`` — the natural
partitioning key for behavioral data. If events were bucketed by user_id at
rest, every join below becomes shuffle-free.

Timestamp handling follows SURVEY §1.2: the loader truncates events.ts to
microseconds identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query
from mapreduce_machine_learning_spark.runtime import checkpoint as _ckpt


@query(
    "q_events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS stage_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS stage_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS stage_purchase
    """,
)
def q_events_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: users counted at a
    stage only if the stage event happened strictly after their entry into
    the previous stage (first view, then first click after that view, then
    first purchase after that click). ONE scan + ONE shuffle: each user's
    stage-entry times resolve as three sequential whole-partition
    conditional-MIN windows over the same user_id partitioning (window 2's
    predicate reads window 1's column, so no nesting): one hash exchange
    (WindowExec adds a partition-local sort on user_id), and — unlike a
    collect_list formulation — no per-user array ever materializes, so a
    bot user with millions of events spills through the window buffer
    instead of building one giant row. A NULL stage time propagates down
    the funnel exactly like a failed join. The per-user reduction after
    the windows reuses the same partitioning (exchange-free), so at
    100 TB the funnel costs what one keyed aggregation costs."""
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
    )
    return staged.agg(
        F.count("t_view").alias("stage_view"),
        F.count("t_click").alias("stage_click"),
        F.count("t_purchase").alias("stage_purchase"),
    )


@query(
    "q_events_retention",
    oracle="""
    WITH first_day AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
               AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN first_day f ON e.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
    GROUP BY f.cohort_day, day_offset
    """,
)
def q_events_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-activity day, counted as
    retained on each of the following 7 days they return. The cohort table
    is one row per user (a user_id-keyed aggregate); joining it back to
    events co-partitions on user_id, then the distinct-count shuffles on the
    small (cohort_day, day_offset) key space. day_offset cast to BIGINT to
    match DuckDB's date_diff type."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_day, "user_id")
        .withColumn(
            "day_offset",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint"),
        )
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "q_events_anomaly",
    oracle="""
    WITH stats AS (
        SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ABS((e.value - s.mu) / s.sigma) > 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(MAX(ABS((e.value - s.mu) / s.sigma)), 6) AS max_abs_z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY e.event_type
    """,
)
def q_events_anomaly(spark, sf_dir):
    """Z-score outlier screen — the per-class anomaly filter a training
    pipeline runs before ingesting metric-bearing events. Two passes over
    the fact table: a 5-row stats aggregate, then the stats BROADCAST back
    onto the stream for per-row scoring (never a shuffle of the fact side on
    a 5-key join — at 100 TB the second pass stays map-side and pipelined
    into the final per-class count). The z threshold sits at 2 with values
    ~O(1) and cross-engine noise ~1e-12 relative, so the boundary is stable;
    max|z| is ratio-normalized and round-6 safe."""
    ev = T(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(z > 2, 1).otherwise(0)).alias("n_outliers"),
            r6(F.max(z)).alias("max_abs_z"),
        )
    )


@query(
    "q_events_cooccur",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
        FROM events
    ),
    tot AS (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n_t
        FROM basket GROUP BY event_type
    ),
    nb AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_baskets
        FROM (SELECT DISTINCT user_id, date_trunc('day', ts) FROM events)
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS DOUBLE) AS n_ab
        FROM basket a
        JOIN basket b ON a.user_id = b.user_id AND a.day = b.day
                     AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b,
           CAST(n_ab AS BIGINT) AS baskets_both,
           ROUND(n_ab * n_baskets / (ta.n_t * tb.n_t), 6) AS lift
    FROM pairs
    JOIN tot ta ON ta.event_type = type_a
    JOIN tot tb ON tb.event_type = type_b
    CROSS JOIN nb
    ORDER BY type_a, type_b
    """,
)
def q_events_cooccur(spark, sf_dir):
    """Market-basket co-occurrence with basket = (user, day): for every
    event-type pair, how many baskets contain both, and the lift
    P(a,b)/(P(a)P(b)) — the co-occurrence/association kernel behind
    item-item recommenders, at user-day granularity so baskets are sparse
    and lift is informative. Baskets are built as one collect_set
    aggregation per (user, day) — partial collect_set dedups map-side
    exactly like the old DISTINCT's partial aggregation did, but the
    basket frame is shuffled ONCE instead of distinct + both sides of a
    basket-key self-join (r14; pair generation moves into a per-basket
    array comprehension, ≤ types² per basket exactly as before, and pair
    counts get map-side partial aggregation the join output never had).
    Totals and the basket count project from the same persisted sets.
    Counts exact, lift a round-6 ratio of exact counts."""
    ev = T(spark, sf_dir, "events")
    # one exchange: baskets as sorted type-sets, shared by the pair
    # counts, the per-type totals AND the basket count
    basket = _ckpt(
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
        .select("types")
    )
    tot = (
        basket.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("n_t"))
    )
    nb = basket.agg(F.count(F.lit(1)).cast("double").alias("n_baskets"))
    pair_expr = F.expr(
        "flatten(transform(types, (x, i) -> "
        "transform(slice(types, i + 2, size(types)), "
        "y -> struct(x AS type_a, y AS type_b))))"
    )
    pairs = (
        basket.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.type_a").alias("type_a"),
            F.col("p.type_b").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    ta = tot.select(
        F.col("event_type").alias("ta_type"), F.col("n_t").alias("ta_n")
    )
    tb = tot.select(
        F.col("event_type").alias("tb_type"), F.col("n_t").alias("tb_n")
    )
    return (
        pairs.join(F.broadcast(ta), F.col("type_a") == F.col("ta_type"))
        .join(F.broadcast(tb), F.col("type_b") == F.col("tb_type"))
        .crossJoin(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("bigint").alias("baskets_both"),
            r6(
                F.col("n_ab") * F.col("n_baskets")
                / (F.col("ta_n") * F.col("tb_n"))
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_events_markov",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    cnt AS (
        SELECT cur, nxt, COUNT(*) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt,
           CAST(c AS BIGINT) AS transitions,
           ROUND(CAST(c AS DOUBLE)
                 / CAST(SUM(c) OVER (PARTITION BY cur) AS DOUBLE), 6) AS prob
    FROM cnt
    ORDER BY cur, nxt
    """,
)
def q_events_markov(spark, sf_dir):
    """First-order Markov transition matrix over each user's event sequence:
    P(next | current) from LEAD pairs, ordered by (ts, event_id) — the
    unique tie-break makes the sequence, and hence every count, identical
    cross-engine. The per-user window shuffles once on user_id (sequences
    sort within partitions); the |types|² count matrix then normalizes with
    a window over 25 rows. Transition counts exact; probabilities are
    round-6 ratios of exact integers."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    wn = Window.partitionBy("cur")
    return (
        cnt.select(
            "cur",
            "nxt",
            F.col("c").alias("transitions"),
            r6(
                F.col("c").cast("double")
                / F.sum("c").over(wn).cast("double")
            ).alias("prob"),
        )
        .orderBy("cur", "nxt")
    )


@query(
    "q_events_interarrival",
    oracle="""
    WITH g AS (
        SELECT event_type,
               EPOCH(ts - LAG(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)) AS gap_s
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_s), 6) AS avg_gap_s,
           ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_gap_s
    FROM g
    WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
)
def q_events_interarrival(spark, sf_dir):
    """Inter-arrival-time distribution per event type: LAG gaps within each
    (user, type) stream — ordered by the unique (ts, event_id) key so both
    engines difference the same neighbors — then count/mean/median of the
    gap seconds. Gaps are exact integer-microsecond differences divided by
    1e6 (identical doubles both engines); the median interpolates
    identically (the q_agg_percentile-verified pair). One shuffle on the
    window key, then a 5-group rollup — the arrival-process profile
    (burstiness, inactivity tails) that sizes streaming watermarks."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ).cast("double") / 1e6
    g = ev.select("event_type", gap.alias("gap_s")).filter(
        F.col("gap_s").isNotNull()
    )
    return g.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        r6(F.avg("gap_s")).alias("avg_gap_s"),
        r6(F.percentile("gap_s", F.lit(0.5))).alias("p50_gap_s"),
    )


@query(
    "q_graph_pagerank",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    w AS (
        SELECT cur, nxt, CAST(COUNT(*) AS DOUBLE) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    outw AS (SELECT cur, SUM(c) AS tot FROM w GROUP BY cur),
    p AS (
        SELECT w.cur, w.nxt, w.c / outw.tot AS prob
        FROM w JOIN outw USING (cur)
    ),
    pr1 AS (
        SELECT nxt AS node,
               ROUND(CAST(0.03 AS DOUBLE) + 0.85 * SUM(0.2 * prob), 6) AS pr
        FROM p GROUP BY nxt
    ),
    pr2 AS (
        SELECT p.nxt AS node,
               ROUND(CAST(0.03 AS DOUBLE) + 0.85 * SUM(pr1.pr * p.prob), 6)
                   AS pr
        FROM p JOIN pr1 ON pr1.node = p.cur
        GROUP BY p.nxt
    )
    SELECT pr1.node AS event_type,
           pr1.pr AS pr_iter1,
           pr2.pr AS pr_iter2
    FROM pr1 JOIN pr2 ON pr1.node = pr2.node
    ORDER BY event_type
    """,
)
def q_graph_pagerank(spark, sf_dir):
    """PageRank — THE canonical MapReduce algorithm — over the event-type
    transition graph (edges = q_events_markov's counts, row-normalized),
    two power iterations unrolled into one plan from the uniform start:
    pr'(j) = 0.15/N + 0.85·Σᵢ pr(i)·P(i→j). Each iteration is one
    |edges|-sized join + |nodes|-keyed agg — the reference would run one
    full MapReduce job per iteration; here the loop unrolls into a single
    Catalyst plan (the iter2 pattern), with ranks ROUNDED between
    iterations on both engines so FP accumulation order can't drift the
    fixpoint. Every node has out-edges (25/25 transitions present), so no
    dangling-mass correction is needed. At corpus scale the same plan
    shape runs on billions of edges: ranks broadcast, edges never move."""
    ev = T(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(win).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    w = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    outw = w.groupBy("cur").agg(F.sum("c").alias("tot"))
    p = (
        w.join(F.broadcast(outw), "cur")
        .select("cur", "nxt", (F.col("c") / F.col("tot")).alias("prob"))
        .transform(_ckpt)  # 25 rows; reused by both unrolled iterations —
        # without this Catalyst re-derives the window+agg chain per use
    )
    pr1 = p.groupBy(F.col("nxt").alias("node")).agg(
        r6(0.03 + 0.85 * F.sum(0.2 * F.col("prob"))).alias("pr")
    )
    pr2 = (
        p.join(F.broadcast(pr1), p.cur == pr1.node)
        .groupBy(F.col("nxt").alias("node2"))
        .agg(r6(0.03 + 0.85 * F.sum(F.col("pr") * F.col("prob"))).alias("pr2"))
    )
    return (
        pr1.join(pr2, pr1.node == pr2.node2)
        .select(
            F.col("node").alias("event_type"),
            F.col("pr").alias("pr_iter1"),
            F.col("pr2").alias("pr_iter2"),
        )
        .orderBy("event_type")
    )


@query(
    "q_events_sessionpath",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_sess
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM o
    ),
    p AS (
        SELECT user_id, sess_no,
               array_to_string(
                   list_slice(list(event_type ORDER BY ts, event_id), 1, 8),
                   '>') AS path
        FROM s GROUP BY user_id, sess_no
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
)
def q_events_sessionpath(spark, sf_dir):
    """Session path mining: sessionize each user's stream with the 30-min
    gap rule (gap strictly > 30 min starts a new session — the
    q_stream_session convention), serialize the first 8 event types of each
    session in (ts, event_id) order into a '>'-joined path string, and
    return the 10 most common paths. The sequence-pattern kernel behind
    navigation-flow and funnel-discovery dashboards. One shuffle on
    user_id covers the gap window, the running session counter, and the
    per-session collect (all same key); the path histogram then shuffles
    tiny strings. Order inside a session is pinned by sorting (ts,
    event_id, type) structs — collect_list order is partition-dependent,
    array_sort makes it canonical. Top-10 is total-ordered by (count DESC,
    path ASC) over exact integer counts."""
    ev = T(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1000000), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "sess_no",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    paths = sess.groupBy("user_id", "sess_no").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                8,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )


@query(
    "q_events_rfm",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MAX(CAST(ts AS DATE)) AS last_day,
               COUNT(*) AS freq,
               SUM(CASE WHEN event_type = 'purchase' THEN value
                        ELSE 0 END) AS monetary
        FROM events GROUP BY user_id
    ),
    g AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
    b AS (
        SELECT NTILE(5) OVER (
                   ORDER BY date_diff('day', last_day, max_day), user_id
               ) AS r_bucket,
               NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_bucket,
               NTILE(5) OVER (
                   ORDER BY ROUND(monetary, 6) DESC, user_id
               ) AS m_bucket,
               monetary
        FROM u CROSS JOIN g
    )
    SELECT r_bucket, f_bucket, m_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(monetary), 6) AS avg_monetary
    FROM b GROUP BY r_bucket, f_bucket, m_bucket
    """,
)
def q_events_rfm(spark, sf_dir):
    """RFM segmentation — recency (days since last activity vs corpus max
    day), frequency (event count), monetary (purchase value sum) per user,
    each quintile-bucketed with NTILE(5), then user count and average spend
    per (R,F,M) cell. The classic CRM segmentation cube. The per-user
    aggregate shuffles once on user_id; the three NTILEs are global sorts
    of the (small) per-user frame — at 100 TB the exact NTILE would be
    replaced by approx-quantile cutpoints broadcast back, trading the
    single-partition sort for one extra pass. Bucket boundaries are made
    cross-engine stable by tie-breaking every NTILE order with user_id and
    pre-rounding the monetary sort key (a per-user double sum) to 6
    places."""
    ev = T(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("monetary"),
    )
    g = ev.agg(F.max(F.to_date("ts")).alias("max_day"))
    b = u.crossJoin(F.broadcast(g)).select(
        F.ntile(5)
        .over(
            Window.orderBy(
                F.datediff(F.col("max_day"), F.col("last_day")), "user_id"
            )
        )
        .alias("r_bucket"),
        F.ntile(5)
        .over(Window.orderBy(F.col("freq").desc(), "user_id"))
        .alias("f_bucket"),
        F.ntile(5)
        .over(Window.orderBy(F.round("monetary", 6).desc(), "user_id"))
        .alias("m_bucket"),
        "monetary",
    )
    return b.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count(F.lit(1)).alias("n_users"),
        r6(F.avg("monetary")).alias("avg_monetary"),
    )


@query(
    "q_events_scd2",
    oracle="""
    WITH chg AS (
        SELECT user_id, ts, event_id, event_type
        FROM (
            SELECT user_id, ts, event_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NULL OR prev <> event_type
    ),
    iv AS (
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM chg
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_current,
           ROUND(AVG((epoch_us(valid_to) - epoch_us(valid_from)) / 1e6), 6)
               AS avg_duration_s
    FROM iv GROUP BY event_type
    """,
)
def q_events_scd2(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: collapse each user's event
    stream into validity intervals of their current event_type — keep only
    change points (type differs from the previous event), then
    valid_from = the change's timestamp and valid_to = the next change's
    (NULL = still current). Output per type: version count, open-interval
    count, and average closed-interval duration. This is the temporal-
    modeling kernel behind dimension-table history builds and CDC
    compaction. Both windows share the (user_id → ts, event_id) sort, so
    Catalyst plans ONE shuffle + sort and pipelines the change-point filter
    between the two window operators. Durations are exact integer
    microsecond differences divided by 1e6 — identical doubles both
    engines; avg is round-6 over well-bounded magnitudes."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    iv = chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    dur_s = (
        F.unix_micros("valid_to") - F.unix_micros("valid_from")
    ).cast("double") / 1e6
    return iv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias(
            "n_current"
        ),
        r6(F.avg(dur_s)).alias("avg_duration_s"),
    )


@query(
    "q_events_skewprofile",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS cnt
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT cnt,
               NTILE(10) OVER (ORDER BY cnt DESC, user_id) AS decile,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rk
        FROM c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(MAX(cnt) AS BIGINT) AS max_per_key,
           ROUND(AVG(CAST(cnt AS DOUBLE)), 6) AS avg_per_key,
           ROUND(SUM(CASE WHEN decile = 1 THEN cnt ELSE 0 END)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS top_decile_share,
           ROUND(SUM(CASE WHEN rk <= 10 THEN cnt ELSE 0 END)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS top10_share
    FROM d
    """,
)
def q_events_skewprofile(spark, sf_dir):
    """Partition-skew profile of the user_id key — the diagnostic that
    decides whether a 100 TB job needs the salted two-phase aggregation in
    ``functions/skew.py`` or AQE's skew-join split: key cardinality, events
    per key (max/avg), and the concentration of work in the hottest decile
    and hottest 10 keys. One map-side-combined count per key, then window
    ranking over the (small) per-key frame. Everything derives from exact
    integer counts with (cnt DESC, user_id) total orders, so shares are
    round-6 ratios of exact integers."""
    ev = T(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    wo = Window.orderBy(F.col("cnt").desc(), "user_id")
    d = c.select(
        "cnt",
        F.ntile(10).over(wo).alias("decile"),
        F.row_number().over(wo).alias("rk"),
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_events"),
        F.max("cnt").alias("max_per_key"),
        r6(F.avg(F.col("cnt").cast("double"))).alias("avg_per_key"),
        r6(
            F.sum(F.when(F.col("decile") == 1, F.col("cnt")).otherwise(0))
            / F.sum("cnt").cast("double")
        ).alias("top_decile_share"),
        r6(
            F.sum(F.when(F.col("rk") <= 10, F.col("cnt")).otherwise(0))
            / F.sum("cnt").cast("double")
        ).alias("top10_share"),
    )


@query(
    "q_events_wau",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM act)
    SELECT d.day,
           CAST(COUNT(DISTINCT CASE WHEN a.day = d.day
                                    THEN a.user_id END) AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS wau,
           ROUND(COUNT(DISTINCT CASE WHEN a.day = d.day
                                     THEN a.user_id END)
                 / CAST(COUNT(DISTINCT a.user_id) AS DOUBLE), 6)
               AS stickiness
    FROM days d
    JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def q_events_wau(spark, sf_dir):
    """Rolling active users — DAU, trailing-7-day WAU, and DAU/WAU
    stickiness per day. Rolling COUNT DISTINCT has no window form (distinct
    isn't decomposable over sliding frames), so the scalable shape is: dedup
    events to the (user, day) activity frame ONCE (the only fact-table
    shuffle), then range-join the tiny day spine onto it — each activity row
    fans out to ≤7 spine days, and the distinct-count shuffles the
    (day, user) pairs of an already-deduplicated frame bounded by
    |users|·|days|, not by event volume. The spine side is broadcast: a
    BroadcastNestedLoopJoin over ~30 rows, never a shuffle of the activity
    frame by the join. DAU rides the same join via the matching-day CASE.
    All counts exact; stickiness is a round-6 ratio of exact integers."""
    ev = T(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = act.select(F.col("day").alias("d")).distinct()
    j = act.join(
        F.broadcast(days),
        (F.col("day") >= F.date_sub(F.col("d"), 6))
        & (F.col("day") <= F.col("d")),
    )
    return (
        j.groupBy("d")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("d"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
            r6(
                F.countDistinct(
                    F.when(F.col("day") == F.col("d"), F.col("user_id"))
                )
                / F.countDistinct("user_id").cast("double")
            ).alias("stickiness"),
        )
        .select(F.col("d").alias("day"), "dau", "wau", "stickiness")
    )


@query(
    "q_events_abtest",
    oracle="""
    WITH s AS (
        SELECT
            COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n1,
            AVG(CASE WHEN event_type = 'purchase' THEN value END) AS m1,
            VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
            COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n2,
            AVG(CASE WHEN event_type = 'view' THEN value END) AS m2,
            VAR_SAMP(CASE WHEN event_type = 'view' THEN value END) AS v2
        FROM events
    )
    SELECT CAST(n1 AS BIGINT) AS n_treat,
           CAST(n2 AS BIGINT) AS n_control,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(POW(v1 / n1 + v2 / n2, 2)
                 / (POW(v1 / n1, 2) / (n1 - 1)
                    + POW(v2 / n2, 2) / (n2 - 1)), 6) AS welch_df
    FROM s
    """,
)
def q_events_abtest(spark, sf_dir):
    """Two-sample Welch's t-test — the experimentation kernel that turns the
    engine into an A/B-testing backend: treatment = purchase events,
    control = view events, metric = value. Means and sample variances for
    both arms come from ONE conditional-aggregate pass (six numbers are the
    complete sufficient statistics — the same summation-form idea as the
    reference's ML jobs), then the t statistic and Welch–Satterthwaite
    degrees of freedom are constant-time algebra kept in-plan so the oracle
    checks them too. At 100 TB an experiment platform runs thousands of
    these; each is a map-side-combined scan emitting one row. Stats are
    round-6; variances/means are well-conditioned (values O(100), n O(10³)+)
    so cross-engine summation noise sits far below the grid."""
    ev = T(spark, sf_dir, "events")
    treat = F.when(F.col("event_type") == "purchase", F.col("value"))
    ctrl = F.when(F.col("event_type") == "view", F.col("value"))
    s = ev.agg(
        F.count(treat).alias("n1"),
        F.avg(treat).alias("m1"),
        F.var_samp(treat).alias("v1"),
        F.count(ctrl).alias("n2"),
        F.avg(ctrl).alias("m2"),
        F.var_samp(ctrl).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return s.select(
        F.col("n1").alias("n_treat"),
        F.col("n2").alias("n_control"),
        r6(F.col("m1") - F.col("m2")).alias("mean_diff"),
        r6((F.col("m1") - F.col("m2")) / F.sqrt(se2)).alias("t_stat"),
        r6(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            )
        ).alias("welch_df"),
    )


@query(
    "q_events_subsample_se",
    oracle="""
    WITH b AS (
        SELECT event_id % 10 AS rep, AVG(value) AS rep_mean,
               COUNT(*) AS rep_n
        FROM events GROUP BY rep
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
           CAST(SUM(rep_n) AS BIGINT) AS n_rows,
           ROUND(AVG(rep_mean), 6) AS mean_of_means,
           ROUND(STDDEV_SAMP(rep_mean) / SQRT(COUNT(*)), 6) AS se_mean
    FROM b
    """,
)
def q_events_subsample_se(spark, sf_dir):
    """Uncertainty quantification by deterministic subsample replicates —
    the scalable stand-in for the bootstrap (the Bag-of-Little-Bootstraps
    shape, Kleiner et al., JRSS-B 2014): partition rows into 10 replicates
    by ``event_id % 10`` (a pure function of the key — reproducible across
    engines and task retries, like every sampling op here), compute each
    replicate's mean of ``value``, and estimate the standard error of the
    global mean from the spread of replicate means. Two tiny aggregations —
    the replicate means are 10 rows — versus a true bootstrap's B full
    resamples; at 100 TB this is the only affordable error bar, and the
    replicate pass reuses the same map-side-combine plan as any mean.
    Replicate assignment is exact integer arithmetic; outputs are round-6
    on O(100)-magnitude, well-conditioned statistics."""
    ev = T(spark, sf_dir, "events")
    b = ev.groupBy((F.col("event_id") % 10).alias("rep")).agg(
        F.avg("value").alias("rep_mean"),
        F.count(F.lit(1)).alias("rep_n"),
    )
    return b.agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.sum("rep_n").alias("n_rows"),
        r6(F.avg("rep_mean")).alias("mean_of_means"),
        r6(
            F.stddev_samp("rep_mean") / F.sqrt(F.count(F.lit(1)))
        ).alias("se_mean"),
    )


@query(
    "q_events_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day',
                         (SELECT MIN(CAST(ts AS DATE)) FROM events),
                         CAST(ts AS DATE)) AS x,
               CAST(COUNT(*) AS DOUBLE) AS y
        FROM events
        GROUP BY event_type, x
    ),
    fit AS (
        SELECT event_type,
               COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, MAX(x) AS max_x
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 + (n * sxy - sx * sy) / (n * sxx - sx * sx) * (max_x + 1),
                 6) AS forecast_next
    FROM fit
    """,
)
def q_events_trend(spark, sf_dir):
    """Per-type volume trend + one-step forecast: roll events up to daily
    counts, fit OLS count-vs-day-index per event type (the q_ml_linreg
    sufficient-statistics kernel applied to an AGGREGATED time series —
    the two-level rollup every monitoring system runs), and extrapolate one
    day ahead. The fact-table pass produces |types|·|days| rows; the
    regression then consumes exact integer sums over ≤ that tiny frame, so
    slope/intercept are ratios of exact integers — round-6 is safely above
    any FP noise. The day index anchors to MIN(date) via a broadcast 1-row
    subquery, not a literal, so the query is stable under testdata
    regeneration."""
    ev = T(spark, sf_dir, "events")
    min_day = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(min_day))
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.col("d0")).alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    fit = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.max("x").alias("max_x"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return fit.select(
        "event_type",
        r6(slope).alias("slope"),
        r6(intercept).alias("intercept"),
        r6(intercept + slope * (F.col("max_x") + 1)).alias("forecast_next"),
    )


@query(
    "q_events_attribution",
    oracle="""
    WITH attr AS (
        SELECT event_type, value,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    )
    SELECT COALESCE(touch, '(none)') AS touch,
           CAST(COUNT(*) AS BIGINT) AS purchases,
           ROUND(SUM(value), 6) AS attributed_value
    FROM attr
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_events_attribution(spark, sf_dir):
    """Last-touch attribution: every purchase is credited to the most recent
    preceding non-purchase interaction of the same user (deterministic order
    ts, event_id; '(none)' when the purchase is the user's first event).
    One window over the user partition — the conditional last-IGNORE-NULLS
    avoids the self-join a naive attribution query would do, so at 100 TB
    this is a single shuffle on user_id with no row multiplication. With
    events bucketed by user_id at rest, shuffle-free."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        T(spark, sf_dir, "events")
        .select("event_type", "value", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("(none)")).alias("touch"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            r6(F.sum("value")).alias("attributed_value"),
        )
    )


@query(
    "q_events_keep_latest",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS users_ending_here,
           ROUND(AVG(value), 6) AS avg_value
    FROM ranked WHERE rn = 1
    GROUP BY event_type
    """,
)
def q_events_keep_latest(spark, sf_dir):
    """CDC-style keep-latest-per-key compaction: collapse the event log to
    each user's most recent row ((ts, event_id) DESC is a total order), then
    profile what state users end in. The canonical upsert-materialization of
    a changelog: one window shuffle on the key, rn=1 filter applied before
    anything downstream so only one row per key survives the stage. At
    100 TB prefer this over groupBy(max_by(...)) when the full latest ROW is
    needed; the plan is identical in shuffle volume (key-partitioned) and
    AQE-coalesced after the 1-row-per-key filter."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        T(spark, sf_dir, "events")
        .select(
            "event_type", "value", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("users_ending_here"),
            r6(F.avg("value")).alias("avg_value"),
        )
    )


@query(
    "q_events_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, AVG(value) AS m
        FROM events GROUP BY 1, 2
    ), centered AS (
        SELECT event_type, day,
               m - AVG(m) OVER (PARTITION BY event_type) AS dev,
               COUNT(*) OVER (PARTITION BY event_type) AS n_days
        FROM daily
    ), c AS (
        SELECT event_type, day, n_days,
               SUM(dev) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cusum
        FROM centered
    ), ranked AS (
        SELECT event_type, day, cusum, n_days,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(cusum) DESC, day) AS rn
        FROM c
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           day AS changepoint_day,
           ROUND(ABS(cusum), 6) AS max_abs_cusum
    FROM ranked WHERE rn = 1
    """,
)
def q_events_changepoint(spark, sf_dir):
    """CUSUM changepoint localization on each event type's daily-mean
    series: cumulative sum of deviations from the series mean, changepoint =
    the day of maximum |CUSUM| (Page's estimator; ties broken by earliest
    day). The heavy groupBy collapses the fact table to one row per (type,
    day) — everything after operates on the ~O(days) frame, so at 100 TB the
    window work is negligible and the single fact-table shuffle carries
    daily partial sums only."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.avg("value").alias("m"))
    )
    w_all = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = daily.select(
        "event_type",
        "day",
        F.sum(F.col("m") - F.avg("m").over(w_all)).over(w_run).alias("cusum"),
        F.count(F.lit(1)).over(w_all).alias("n_days"),
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.abs(F.col("cusum")).desc(), "day"
        )
    )
    return (
        c.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("day").alias("changepoint_day"),
            r6(F.abs(F.col("cusum"))).alias("max_abs_cusum"),
        )
    )


@query(
    "q_events_concurrency",
    oracle="""
    WITH pts AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 30 MINUTE AS t, -1 AS delta
        FROM events
    ),
    run AS (
        SELECT event_type,
               SUM(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta) AS live
        FROM pts
    )
    SELECT event_type, CAST(MAX(live) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type
    """,
)
def q_events_concurrency(spark, sf_dir):
    """Sweep-line interval concurrency: every event opens a half-open 30-min
    activity interval [ts, ts+30min); emit a +1 point at the open and a -1
    at the close, order by (time, delta) — the delta tie-break processes a
    close before an open at the same instant, which is exactly the half-open
    semantic — and take the running sum. The default ANSI window frame
    (RANGE ... CURRENT ROW) gives every peer row the post-peer-group sum, so
    the result is independent of intra-tie row order on both engines. Max of
    the running sum per type = peak concurrent intervals. Scale: the sweep
    is a single shuffle on event_type plus a per-partition sort — the same
    plan shape a 100 TB interval-overlap join reduces to after binning; no
    self-join materializes O(n·overlap) pairs."""
    ev = T(spark, sf_dir, "events")
    opens = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    closes = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    w = Window.partitionBy("event_type").orderBy("t", "delta")
    return (
        opens.unionByName(closes)
        .select("event_type", F.sum("delta").over(w).alias("live"))
        .groupBy("event_type")
        .agg(F.max("live").cast("bigint").alias("max_concurrent"))
    )


@query(
    "q_events_trigrams",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events GROUP BY user_id
    ),
    grams AS (
        SELECT substr(seq, i, 3) AS trigram
        FROM seqs, UNNEST(generate_series(1, length(seq) - 2)) AS g(i)
        WHERE length(seq) >= 3
    )
    SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams GROUP BY trigram
    ORDER BY n DESC, trigram LIMIT 10
    """,
)
def q_events_trigrams(spark, sf_dir):
    """Sequence-pattern mining (MATCH_RECOGNIZE-lite): serialize each user's
    stream into a string of event-type initials (c/e/p/s/v, ordered by
    ts, event_id), slide a width-3 window over every sequence, and count the
    10 most common behavioral trigrams (ties → trigram asc). The serialize
    step is one groupBy(user_id) — collect_list + array_sort keeps ordering
    deterministic without a sort-within-groups shuffle; the per-user
    sequence is bounded by the user's event count, so skew follows user
    skew (salt or cap sequence length at 100 TB). Trigram expansion is
    sequence()+explode — pure JVM generators, no Python."""
    ev = T(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["c"]
                ),
                "",
            ).alias("seq")
        )
    )
    return (
        seqs.filter(F.length("seq") >= 3)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length("seq") - 2)
            ).alias("i"),
            "seq",
        )
        .select(F.expr("substr(seq, i, 3)").alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(10)
    )


@query(
    "q_events_merge_upsert",
    oracle="""
    WITH ranked_old AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-16 00:00:00'
    ),
    ranked_new AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts > TIMESTAMP '2024-01-16 00:00:00'
    ),
    old AS (SELECT user_id, event_type, value FROM ranked_old WHERE rn = 1),
    new AS (SELECT user_id, event_type, value FROM ranked_new WHERE rn = 1),
    merged AS (
        SELECT CASE
                 WHEN old.user_id IS NULL THEN 'inserted'
                 WHEN new.user_id IS NULL THEN 'retained'
                 ELSE 'updated'
               END AS action,
               COALESCE(new.value, old.value) AS final_value
        FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
    )
    SELECT action, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(final_value), 6) AS avg_final_value
    FROM merged GROUP BY action
    """,
)
def q_events_merge_upsert(spark, sf_dir):
    """MERGE/upsert semantics as a batch plan: the pre-cutoff snapshot
    (latest state per user at 2024-01-16) full-outer-joined with the
    post-cutoff updates (latest state per user after it); rows classify as
    inserted / updated / retained and the merged state takes
    COALESCE(update, old) — exactly Delta-style MERGE INTO ... WHEN
    MATCHED UPDATE / WHEN NOT MATCHED INSERT, expressed engine-agnostically.
    Scale: both sides reduce to one latest-per-key window over the same
    user_id partitioning, and the full-outer join reuses that partitioning —
    one shuffle total if events are bucketed by user_id at rest; the
    changelog side of a real MERGE is usually tiny → broadcast."""
    ev = T(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )

    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", "value")
        )

    old = latest(ev.filter(F.col("ts") <= cutoff))
    new = latest(ev.filter(F.col("ts") > cutoff))
    merged = old.alias("o").join(
        new.alias("n"), F.col("o.user_id") == F.col("n.user_id"), "full"
    )
    return (
        merged.select(
            F.when(F.col("o.user_id").isNull(), "inserted")
            .when(F.col("n.user_id").isNull(), "retained")
            .otherwise("updated")
            .alias("action"),
            F.coalesce(F.col("n.value"), F.col("o.value")).alias(
                "final_value"
            ),
        )
        .groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            r6(F.avg("final_value")).alias("avg_final_value"),
        )
    )


@query(
    "q_events_ohlc",
    oracle="""
    WITH keyed AS (
        SELECT event_type, ts::DATE AS day, value,
               lpad(epoch_us(ts)::VARCHAR, 20, '0')
                   || lpad(event_id::VARCHAR, 12, '0') AS ord
        FROM events
    )
    SELECT event_type, day,
           arg_min(value, ord) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ord) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           ROUND(AVG(value), 6) AS vwap
    FROM keyed GROUP BY event_type, day
    """,
)
def q_events_ohlc(spark, sf_dir):
    """OHLC bar aggregation — the canonical time-series downsample: per
    (event_type, day), the first (open) and last (close) value in
    (ts, event_id) order plus high/low/volume/mean. open/close use
    min_by/max_by over a zero-padded ``epoch_us‖event_id`` string key —
    a totally ordered, engine-portable composite that makes first/last
    well-defined under timestamp ties without a window pass. Everything is
    a single hash aggregate: partials carry one candidate row per
    (bar, side) — O(bars) state, map-side combined, no sort and no
    shuffle of raw ticks beyond the one groupBy exchange."""
    ev = T(spark, sf_dir, "events")
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            "value",
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord").alias("close"),
            F.count(F.lit(1)).alias("volume"),
            r6(F.avg("value")).alias("vwap"),
        )
    )


@query(
    "q_events_twa",
    oracle="""
    WITH seq AS (
        SELECT event_type, value,
               epoch_us(LEAD(ts) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id))
                   - epoch_us(ts) AS dur_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           ROUND(SUM(value * dur_us) / SUM(dur_us), 6) AS time_weighted_avg,
           ROUND(SUM(dur_us) / 1000000.0 / COUNT(*), 6) AS avg_interval_s
    FROM seq WHERE dur_us IS NOT NULL
    GROUP BY event_type
    """,
)
def q_events_twa(spark, sf_dir):
    """Time-weighted average — the TWAP/monitoring-metric semantics where a
    value holds until the next observation of the same series: weight each
    event's value by the microseconds until the series' next event (last
    event carries no weight) and divide weighted by total duration.
    Durations come from one lead() window keyed exactly like every other
    per-series pass (partition event_type, order ts‖event_id), so at scale
    this shares the series shuffle with the lag/gap family; the aggregate
    itself is summation-form. The ratio's cross-engine FP noise is ~1e-15
    relative — far inside round-6."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        r6(
            F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us")
        ).alias("time_weighted_avg"),
        r6(F.sum("dur_us") / 1000000.0 / F.count(F.lit(1))).alias(
            "avg_interval_s"
        ),
    )


@query(
    "q_events_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, ts::DATE AS day FROM events
    ),
    islands AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', day)
                   - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                   AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS streak_len
        FROM islands GROUP BY user_id, island
    )
    SELECT streak_len, CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY streak_len
    """,
)
def q_events_streaks(spark, sf_dir):
    """Consecutive-day activity streaks (gaps-and-islands at day grain):
    collapse each user's activity to distinct days, assign islands by the
    classic day_number − row_number trick (consecutive days share a
    constant difference), and histogram the streak lengths. One shuffle on
    user_id for the distinct+window, then a tiny count-of-counts — the
    day-grain twin of the 30-minute session windows, and the kernel behind
    'n-day streak' product metrics. At 100 TB the distinct-day collapse is
    the big win: the window runs on O(users × active-days), not events."""
    ev = T(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        (
            F.datediff("day", F.lit("2024-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("streak_len").agg(
        F.count(F.lit(1)).alias("n_streaks")
    )


@query(
    "q_events_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type, ts::DATE AS day, SUM(value) AS v
        FROM events GROUP BY event_type, ts::DATE
    ),
    cumu AS (
        SELECT event_type, day,
               SUM(v) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM daily
    ),
    curve AS (
        SELECT event_type, day, cum,
               MAX(cum) OVER (PARTITION BY event_type ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS peak
        FROM cumu
    ),
    dd AS (
        SELECT event_type, day, ROUND(peak - cum, 6) AS drawdown,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ROUND(peak - cum, 6) DESC, day)
                   AS rn
        FROM curve
    )
    SELECT event_type, day AS worst_day, drawdown AS max_drawdown
    FROM dd WHERE rn = 1
    """,
)
def q_events_drawdown(spark, sf_dir):
    """Maximum drawdown of each event type's cumulative daily value curve —
    the risk metric for any cumulative series (revenue, PnL, error
    budget): running peak minus current cumulative, maximized over days
    (ties → earliest day, ranked on the ROUND-6 value so FP noise can't
    flip the argmax). Both running aggregates share one window spec, so
    Spark evaluates them in a single Window operator over the tiny
    (type, day) frame; the fact table is touched once for the daily
    pre-aggregation."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum("value").alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = daily.select(
        "event_type",
        "day",
        F.sum("v").over(w).alias("cum"),
    ).withColumn("peak", F.max("cum").over(w))
    dd = curve.select(
        "event_type",
        "day",
        F.round(F.col("peak") - F.col("cum"), 6).alias("drawdown"),
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.desc("drawdown"), "day"
        )
    )
    return (
        dd.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("worst_day"),
            F.col("drawdown").alias("max_drawdown"),
        )
    )


@query(
    "q_graph_sssp",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    w AS (
        SELECT cur, nxt, CAST(COUNT(*) AS DOUBLE) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    outw AS (SELECT cur, SUM(c) AS tot FROM w GROUP BY cur),
    e AS (
        SELECT w.cur, w.nxt, -ln(w.c / outw.tot) AS wgt
        FROM w JOIN outw USING (cur)
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    d0 AS (
        SELECT node, CASE WHEN node = 'signup' THEN 0.0 ELSE 1e9 END AS d
        FROM nodes
    ),
    d1 AS (
        SELECT n.node,
               LEAST(MIN(d0.d),
                     COALESCE(MIN(s.d + e.wgt), 1e9)) AS d
        FROM nodes n
        JOIN d0 ON d0.node = n.node
        LEFT JOIN e ON e.nxt = n.node
        LEFT JOIN d0 s ON s.node = e.cur
        GROUP BY n.node
    ),
    d2 AS (
        SELECT n.node,
               LEAST(MIN(d1.d),
                     COALESCE(MIN(s.d + e.wgt), 1e9)) AS d
        FROM nodes n
        JOIN d1 ON d1.node = n.node
        LEFT JOIN e ON e.nxt = n.node
        LEFT JOIN d1 s ON s.node = e.cur
        GROUP BY n.node
    )
    SELECT d2.node AS event_type,
           ROUND(d1.d, 6) AS dist_iter1,
           ROUND(d2.d, 6) AS dist_iter2
    FROM d2 JOIN d1 ON d1.node = d2.node
    """,
)
def q_graph_sssp(spark, sf_dir):
    """Single-source shortest path (two Bellman-Ford relaxation rounds)
    over the event-type transition graph, edge weight −ln(p) so the
    shortest path IS the most probable behavioral path from 'signup'.
    Each relaxation is one join of the frontier against the broadcast
    edge list + a per-node MIN — the exact message-passing shape of
    Pregel/GraphX, expressed relationally; the graph (|types|² edges)
    derives from one lag-window pass over the fact table, the same
    derivation q_graph_pagerank and q_events_markov share. Unreachable =
    the 1e9 sentinel on both engines (NULL-vs-infinity semantics differ
    across engines; a literal does not)."""
    ev = T(spark, sf_dir, "events")
    w_lead = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w_lead).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    wt = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    outw = wt.groupBy("cur").agg(F.sum("c").alias("tot"))
    # |types|² rows, shared by both relaxation rounds; without the
    # checkpoint every relax() consumer re-derives the graph from the
    # fact table and the two-round plan scanned events 14× (measured
    # round 4) — at 100 TB that is 14 reads of the fact table for one
    # query. Same for the frontier frames below: relax() reads its input
    # twice (message join + min-merge), so each uncached round DOUBLES
    # the upstream tree.
    e = _ckpt(
        wt.join(outw, "cur").select(
            "cur", "nxt", (-F.log(F.col("c") / F.col("tot"))).alias("wgt")
        )
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    d = _ckpt(
        nodes.select(
            "node",
            F.when(F.col("node") == "signup", 0.0).otherwise(1e9).alias("d"),
        )
    )

    def relax(dist):
        relaxed = (
            dist.alias("s")
            .join(F.broadcast(e), F.col("s.node") == F.col("cur"))
            .select(
                F.col("nxt").alias("node"),
                (F.col("s.d") + F.col("wgt")).alias("cand"),
            )
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        return (
            dist.join(relaxed, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("d"), F.coalesce(F.col("cand"), F.lit(1e9))
                ).alias("d"),
            )
        )

    d1 = _ckpt(relax(d))  # consumed by round 2 (twice) and the output join
    d2 = relax(d1)
    return (
        d2.alias("b")
        .join(d1.alias("a"), "node")
        .select(
            F.col("node").alias("event_type"),
            r6(F.col("a.d")).alias("dist_iter1"),
            r6(F.col("b.d")).alias("dist_iter2"),
        )
    )


@query(
    "q_events_kanon",
    oracle="""
    WITH quasi AS (
        SELECT event_type, ts::DATE AS day,
               CAST(FLOOR(value / 50.0) AS BIGINT) AS value_band,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM events GROUP BY event_type, ts::DATE, FLOOR(value / 50.0)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_risky_groups,
           CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                AS BIGINT) AS n_risky_rows,
           CAST(MIN(group_size) AS BIGINT) AS k_anonymity
    FROM quasi
    """,
)
def q_events_kanon(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier (event_type, day,
    50-unit value band): group sizes under k = 5 are re-identification
    risks, and the dataset's k-anonymity is the minimum group size — the
    privacy gate a training-data release pipeline runs before shipping.
    One hash aggregate over the banded key plus a 4-number roll-up; at
    100 TB the quasi-id key space (types × days × bands) stays tiny, so
    the shuffle carries partial counts only. Suppression/generalization =
    re-running with coarser bands, same plan."""
    ev = T(spark, sf_dir, "events")
    quasi = ev.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") / 50.0).cast("bigint").alias("value_band"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    risky = F.col("group_size") < 5
    return quasi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(risky, 1).otherwise(0))
        .cast("bigint")
        .alias("n_risky_groups"),
        F.sum(F.when(risky, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_rows"),
        F.min("group_size").cast("bigint").alias("k_anonymity"),
    )


@query(
    "q_events_autocorr",
    oracle="""
    WITH daily AS (
        SELECT event_type, ts::DATE AS day, CAST(COUNT(*) AS DOUBLE) AS x
        FROM events GROUP BY event_type, ts::DATE
    ),
    lags AS (SELECT UNNEST([1, 2, 3]) AS lag),
    paired AS (
        SELECT d.event_type, l.lag, d.x AS y,
               LAG(d.x, l.lag) OVER (PARTITION BY d.event_type, l.lag
                                     ORDER BY d.day) AS x
        FROM daily d CROSS JOIN lags l
    ),
    s AS (
        SELECT event_type, lag, COUNT(*)::DOUBLE AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
               SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM paired WHERE x IS NOT NULL
        GROUP BY event_type, lag
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS autocorr
    FROM s
    """,
)
def q_events_autocorr(spark, sf_dir):
    """Autocorrelation of each event type's daily-count series at lags
    1–3 — the stationarity probe that tells a forecasting pipeline
    whether yesterday predicts today (and the companion to the EWMA /
    trend / changepoint family, all sharing the same (type, day)
    pre-aggregate). Pearson r over (xₜ, xₜ₋ₗ) pairs in summation form:
    after the one fact-table shuffle to daily counts, each lag is a
    window shift plus six partial sums — O(types × lags) output rows,
    O(days) window state."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")

    def shifted(lag_k: int):
        # Spark requires a foldable lag offset (DuckDB accepts a column),
        # so the three lags are three literal-offset branches of one union
        # — same single (type, day) shuffle reused by every branch
        return daily.select(
            "event_type",
            F.lit(lag_k).alias("lag"),
            F.col("x").alias("y"),
            F.lag("x", lag_k).over(w).alias("x"),
        )

    paired = shifted(1).unionByName(shifted(2)).unionByName(shifted(3))
    s = (
        paired.filter(F.col("x").isNotNull())
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return s.select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        r6(num / den).alias("autocorr"),
    )


@query(
    "q_events_seasonality",
    oracle="""
    WITH cells AS (
        SELECT CAST(EXTRACT(ISODOW FROM ts) AS BIGINT) AS dow,
               CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n)::DOUBLE AS total, COUNT(*)::DOUBLE AS n_cells
            FROM cells)
    SELECT dow, hour, n,
           ROUND(n / (total / n_cells), 6) AS load_factor
    FROM cells, tot
    """,
)
def q_events_seasonality(spark, sf_dir):
    """Weekly seasonality heatmap: event counts per (ISO day-of-week,
    hour-of-day) cell with each cell's load factor vs the uniform
    expectation — the capacity-planning profile behind autoscaling and
    the sanity check behind any time-sliced A/B experiment. One hash
    aggregate over a 168-cell key space; the load factor normalizes by
    observed cells so partial weeks don't skew it. ISO day-of-week
    (Mon=1) is used because engines disagree on the 0-vs-1-based
    DAYOFWEEK — EXTRACT(ISODOW) and Spark's dayofweek need an explicit
    shift to agree."""
    ev = T(spark, sf_dir, "events")
    # Spark dayofweek: Sunday=1..Saturday=7 → ISO Mon=1..Sun=7
    iso_dow = ((F.dayofweek("ts") + 5) % 7) + 1
    cells = ev.groupBy(
        iso_dow.cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_cells"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "n",
        r6(F.col("n") / (F.col("total") / F.col("n_cells"))).alias(
            "load_factor"
        ),
    )


@query(
    "q_events_entropy_drift",
    oracle="""
    WITH cells AS (
        SELECT ts::DATE AS day, event_type,
               COUNT(*)::DOUBLE AS n
        FROM events GROUP BY 1, 2
    ),
    probs AS (
        SELECT day, n / SUM(n) OVER (PARTITION BY day) AS p
        FROM cells
    ),
    daily AS (
        SELECT day, -SUM(p * ln(p)) AS h FROM probs GROUP BY day
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MIN(h), 6) AS min_entropy,
           ROUND(MAX(h), 6) AS max_entropy,
           ROUND(AVG(h), 6) AS avg_entropy,
           ROUND(MAX(h) - MIN(h), 6) AS drift_range
    FROM daily
    """,
)
def q_events_entropy_drift(spark, sf_dir):
    """Behavioral-mix drift monitor: Shannon entropy of the event-type
    distribution per day, rolled up to min/max/avg/range across days — a
    one-number data-drift alarm (entropy collapse means one event type is
    suddenly dominating the stream; a widening range means the mix is
    unstable day over day). Drift monitors are what decide when a trained
    model or a sampling mixture needs refreshing. The plan is two nested
    aggregations over the (day, type) census — the fact table shuffles
    once to ~|days|·|types| cells."""
    ev = T(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    wd = Window.partitionBy("day")
    p = F.col("n") / F.sum("n").over(wd)
    daily = (
        cells.select("day", (-p * F.log(p)).alias("term"), "n")
        .groupBy("day")
        .agg(F.sum("term").alias("h"))
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        r6(F.min("h")).alias("min_entropy"),
        r6(F.max("h")).alias("max_entropy"),
        r6(F.avg("h")).alias("avg_entropy"),
        r6(F.max("h") - F.min("h")).alias("drift_range"),
    )


@query(
    "q_events_cohort_ltv",
    oracle="""
    WITH first_day AS (
        SELECT user_id, MIN(ts::DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    cohort_size AS (
        SELECT cohort_day, COUNT(*)::DOUBLE AS n_users
        FROM first_day GROUP BY cohort_day
    ),
    rev AS (
        SELECT f.cohort_day,
               date_diff('day', f.cohort_day, e.ts::DATE) AS day_offset,
               SUM(e.value) AS v
        FROM events e JOIN first_day f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
          AND date_diff('day', f.cohort_day, e.ts::DATE) BETWEEN 0 AND 7
        GROUP BY 1, 2
    )
    SELECT r.cohort_day, CAST(r.day_offset AS BIGINT) AS day_offset,
           ROUND(SUM(r2.v) / cs.n_users, 6) AS cum_ltv_per_user
    FROM rev r
    JOIN rev r2 ON r2.cohort_day = r.cohort_day
               AND r2.day_offset <= r.day_offset
    JOIN cohort_size cs ON cs.cohort_day = r.cohort_day
    GROUP BY r.cohort_day, r.day_offset, cs.n_users
    """,
)
def q_events_cohort_ltv(spark, sf_dir):
    """Cohort lifetime value: per signup-day cohort, the CUMULATIVE
    purchase revenue per cohort member over the first 8 days — the curve
    a growth team reads payback periods off, and the revenue-weighted
    companion to q_events_retention's activity counts. Spark computes the
    cumulative step as a running-sum window over the tiny
    (cohort, offset) frame (the oracle spells the same thing as a
    triangular self-join — same values, quadratic shape, fine for 8
    offsets); the per-user fact work is one user_id-keyed join +
    aggregate. Normalizing by the FULL cohort size (not just purchasers)
    keeps cohorts comparable."""
    ev = T(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    cohort_size = first_day.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("double").alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_day, "user_id")
        .withColumn(
            "day_offset",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")),
        )
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.sum("value").alias("v"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.withColumn("cum_v", F.sum("v").over(w))
        .join(F.broadcast(cohort_size), "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("bigint").alias("day_offset"),
            r6(F.col("cum_v") / F.col("n_users")).alias("cum_ltv_per_user"),
        )
    )


@query(
    "q_events_funnel_windowed",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
          AND e.ts <= v.t_view + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS stage_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS stage_click_24h,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS stage_purchase_24h
    """,
)
def q_events_funnel_windowed(spark, sf_dir):
    """Conversion funnel with a 24-hour conversion window per stage: a
    click only counts within 24 h of the first view, a purchase within
    24 h of that click — the attribution-window semantics every product
    funnel actually uses (the unbounded q_events_funnel over-credits
    conversions that happen weeks later). Same single-scan,
    single-shuffle shape as the unbounded funnel — sequential
    whole-partition conditional-MIN windows on user_id — so the
    attribution window is two extra comparisons in each window's
    predicate, not a plan change."""
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day = F.expr("INTERVAL 24 HOURS")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view"))
                    & (F.col("ts") <= F.col("t_view") + day),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click"))
                    & (F.col("ts") <= F.col("t_click") + day),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
    )
    return staged.agg(
        F.count("t_view").alias("stage_view"),
        F.count("t_click").alias("stage_click_24h"),
        F.count("t_purchase").alias("stage_purchase_24h"),
    )


@query(
    "q_events_assoc_rules",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT user_id, ts::DATE AS day, event_type
        FROM events
    ),
    nb AS (
        SELECT COUNT(*)::DOUBLE AS n_baskets
        FROM (SELECT DISTINCT user_id, ts::DATE FROM events)
    ),
    singles AS (
        SELECT event_type, COUNT(*)::DOUBLE AS n_a
        FROM basket GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               COUNT(*)::DOUBLE AS n_ab
        FROM basket a
        JOIN basket b ON a.user_id = b.user_id AND a.day = b.day
                     AND a.event_type <> b.event_type
        GROUP BY 1, 2
    )
    SELECT antecedent, consequent,
           ROUND(n_ab / n_baskets, 6) AS support,
           ROUND(n_ab / s.n_a, 6) AS confidence
    FROM pairs
    JOIN singles s ON s.event_type = antecedent
    CROSS JOIN nb
    """,
)
def q_events_assoc_rules(spark, sf_dir):
    """Association rules A→B over (user, day) baskets: support
    P(A∧B) and confidence P(B|A) for every DIRECTED event-type pair —
    the level-1 Apriori output that q_events_cooccur's symmetric lift
    doesn't give (confidence is asymmetric: error→purchase and
    purchase→error differ). Same shape as the co-occurrence kernel
    (r14): baskets are one collect_set aggregation per (user, day) —
    partial collect_set dedups map-side exactly like the old DISTINCT's
    partial aggregation did, but the basket frame is shuffled ONCE
    instead of distinct + both sides of a basket-key self-join + a
    second (user, day) distinct for the basket count. Directed pairs
    come from a per-basket array comprehension (≤ types·(types−1) per
    basket, the exact fan-out the self-join had; cap per-basket items
    on real data, the standard Apriori guard), and pair counts get
    map-side partial aggregation the join output never had."""
    ev = T(spark, sf_dir, "events")
    # one exchange: baskets as sorted type-sets, shared by the pair
    # counts, the antecedent totals AND the basket count
    basket = _ckpt(
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
        .select("types")
    )
    nb = basket.agg(F.count(F.lit(1)).cast("double").alias("n_baskets"))
    singles = basket.select(F.explode("types").alias("antecedent")).groupBy(
        "antecedent"
    ).agg(F.count(F.lit(1)).cast("double").alias("n_a"))
    pair_expr = F.expr(
        "flatten(transform(types, x -> "
        "transform(filter(types, y -> y != x), "
        "y -> struct(x AS antecedent, y AS consequent))))"
    )
    pairs = (
        basket.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.antecedent").alias("antecedent"),
            F.col("p.consequent").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    return (
        pairs.join(F.broadcast(singles), "antecedent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            r6(F.col("n_ab") / F.col("n_baskets")).alias("support"),
            r6(F.col("n_ab") / F.col("n_a")).alias("confidence"),
        )
    )


@query(
    "q_events_bounce_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                         > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    ),
    per_session AS (
        SELECT user_id, sid,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               arg_min(event_type,
                       lpad(epoch_us(ts)::VARCHAR, 20, '0')
                       || lpad(event_id::VARCHAR, 12, '0')) AS entry_type
        FROM sess GROUP BY user_id, sid
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS bounce_rate
    FROM per_session GROUP BY entry_type
    """,
)
def q_events_bounce_rate(spark, sf_dir):
    """Bounce rate by session entry type: sessionize with the 30-minute
    gap rule (the q_stream_session convention, spelled as gaps-and-
    islands so both engines agree on boundaries), then classify each
    session by its FIRST event (min_by on the epoch‖id composite key)
    and count single-event sessions — the classic engagement metric that
    tells you which entry points lose users immediately. One (user_id →
    ts) sort shared with the whole sequential-window family, then a
    per-session aggregate and a 5-row roll-up."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            gap_us.isNull() | (gap_us > 1800000000), 1
        ).otherwise(0).alias("new_session"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = seq.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session").over(wrun).alias("sid"),
    )
    ord_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("event_type", ord_key).alias("entry_type"),
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(bounce).cast("bigint").alias("n_bounces"),
        r6(F.sum(bounce.cast("double")) / F.count(F.lit(1))).alias(
            "bounce_rate"
        ),
    )


@query(
    "q_events_slo_breaches",
    oracle="""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               COUNT(*)::DOUBLE AS n,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE
                   AS errs
        FROM events GROUP BY 1
    ),
    flagged AS (
        SELECT hour_start, errs / n AS err_rate,
               CASE WHEN errs / n > 0.25 THEN 1 ELSE 0 END AS breach,
               ROW_NUMBER() OVER (ORDER BY hour_start) AS rn
        FROM hourly
    ),
    runs AS (
        SELECT breach, rn - ROW_NUMBER() OVER (PARTITION BY breach
                                               ORDER BY rn) AS island
        FROM flagged
    )
    SELECT CAST((SELECT COUNT(*) FROM flagged) AS BIGINT) AS n_hours,
           CAST((SELECT SUM(breach) FROM flagged) AS BIGINT)
               AS n_breach_hours,
           ROUND((SELECT MAX(err_rate) FROM flagged), 6) AS worst_rate,
           CAST(COALESCE((SELECT MAX(cnt) FROM (
               SELECT COUNT(*) AS cnt FROM runs
               WHERE breach = 1 GROUP BY island)), 0) AS BIGINT)
               AS longest_breach_run
    """,
)
def q_events_slo_breaches(spark, sf_dir):
    """SLO burn monitoring: hourly error rate against a 25% threshold,
    reporting breach hours, the worst hour, and the LONGEST consecutive
    breach run — the gaps-and-islands trick applied to alerting (one
    5-minute blip and a 6-hour outage have the same breach count; the run
    length is what pages someone). Hourly pre-aggregation is the only
    fact-table pass; the island logic runs on O(hours) rows. The same
    query shape over readStream + watermark is the live alerting path
    (tumble twin in streaming/live.py)."""
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("double")
        .alias("errs"),
    )
    flagged = hourly.select(
        "hour_start",
        (F.col("errs") / F.col("n")).alias("err_rate"),
        F.when(F.col("errs") / F.col("n") > 0.25, 1)
        .otherwise(0)
        .alias("breach"),
        F.row_number().over(Window.orderBy("hour_start")).alias("rn"),
    )
    runs = flagged.select(
        "breach",
        (
            F.col("rn")
            - F.row_number().over(
                Window.partitionBy("breach").orderBy("rn")
            )
        ).alias("island"),
    )
    longest = (
        runs.filter(F.col("breach") == 1)
        .groupBy("island")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.coalesce(F.max("cnt"), F.lit(0)).alias("longest"))
    )
    summary = flagged.agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("breach").cast("bigint").alias("n_breach_hours"),
        r6(F.max("err_rate")).alias("worst_rate"),
    )
    return summary.crossJoin(longest).select(
        F.col("n_hours").cast("bigint").alias("n_hours"),
        "n_breach_hours",
        "worst_rate",
        F.col("longest").cast("bigint").alias("longest_breach_run"),
    )
