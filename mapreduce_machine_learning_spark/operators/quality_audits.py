"""Data-quality and pipeline-audit operators: set reconciliation, class
separability scatter, conversion latency, event-stream disorder, and
boilerplate detection.

Each is one fact-table aggregation plus arithmetic over a bounded frame —
the audit queries a pipeline operator runs beside its main job to know
whether the data (or the stream feeding it) is healthy.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query
from mapreduce_machine_learning_spark.runtime import checkpoint as _ckpt


@query(
    "q_set_symdiff",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders),
    b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT CAST((SELECT COUNT(*) FROM (SELECT k FROM a EXCEPT
                                       SELECT k FROM b)) AS BIGINT)
               AS left_only,
           CAST((SELECT COUNT(*) FROM (SELECT k FROM b EXCEPT
                                       SELECT k FROM a)) AS BIGINT)
               AS right_only,
           CAST((SELECT COUNT(*) FROM (SELECT k FROM a EXCEPT
                                       SELECT k FROM b)) +
                (SELECT COUNT(*) FROM (SELECT k FROM b EXCEPT
                                       SELECT k FROM a)) AS BIGINT)
               AS symdiff
    """,
)
def q_set_symdiff(spark, sf_dir):
    """Symmetric difference between two customer sets (has-orders vs
    acctbal > 5000): left-only, right-only, and the XOR total — the set
    reconciliation primitive that completes the union/intersect/except
    family. Both EXCEPTs are distinct-semantics anti-joins on the same
    key; Catalyst plans them as hash aggregations + left-anti joins that
    share the scans."""
    a = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    ).distinct()
    b = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    lo = a.exceptAll(b).agg(
        F.count(F.lit(1)).cast("bigint").alias("left_only")
    )
    ro = b.exceptAll(a).agg(
        F.count(F.lit(1)).cast("bigint").alias("right_only")
    )
    return lo.crossJoin(ro).select(
        "left_only",
        "right_only",
        (F.col("left_only") + F.col("right_only"))
        .cast("bigint")
        .alias("symdiff"),
    )


@query(
    "q_ml_scatter",
    oracle="""
    WITH comps AS (
        SELECT label, pos, x FROM (
            SELECT label, generate_subscripts(embedding, 1) AS pos,
                   CAST(UNNEST(embedding) AS DOUBLE) AS x
            FROM embeddings
        )
    ),
    gm AS (SELECT pos, AVG(x) AS g FROM comps GROUP BY pos),
    per_ld AS (
        SELECT label, comps.pos, AVG(x) AS c, VAR_POP(x) AS v,
               COUNT(*) AS m
        FROM comps GROUP BY label, comps.pos
    )
    SELECT per_ld.label,
           CAST(MAX(per_ld.m) AS BIGINT) AS n_vecs,
           ROUND(SUM(per_ld.v), 6) AS within_trace,
           ROUND(SUM((per_ld.c - gm.g) * (per_ld.c - gm.g)), 6)
               AS between_trace,
           ROUND(SUM((per_ld.c - gm.g) * (per_ld.c - gm.g))
                 / SUM(per_ld.v), 6) AS fisher_ratio
    FROM per_ld JOIN gm ON per_ld.pos = gm.pos
    GROUP BY per_ld.label
    """,
)
def q_ml_scatter(spark, sf_dir):
    """Per-label Fisher separability audit of the embedding space: trace
    of the within-class scatter (Σ_dim var_pop of components) vs the
    between-class scatter (Σ_dim squared centroid offset from the global
    mean) and their ratio — labels with a low ratio are the ones a linear
    classifier will confuse. One component-grain aggregation keyed
    (label, dim) plus a 64-row global-mean join; the fact table is
    scanned once however many vectors exist."""
    comps = T(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    gm = comps.groupBy("pos").agg(F.avg("x").alias("g"))
    per_ld = comps.groupBy("label", "pos").agg(
        F.avg("x").alias("c"),
        F.var_pop("x").alias("v"),
        F.count(F.lit(1)).alias("m"),
    )
    between = F.sum((F.col("c") - F.col("g")) * (F.col("c") - F.col("g")))
    return (
        per_ld.join(F.broadcast(gm), "pos")
        .groupBy("label")
        .agg(
            F.max("m").cast("bigint").alias("n_vecs"),
            r6(F.sum("v")).alias("within_trace"),
            r6(between).alias("between_trace"),
            r6(between / F.sum("v")).alias("fisher_ratio"),
        )
    )


@query(
    "q_events_time_to_convert",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id,
               epoch_us(MIN(e.ts)) - epoch_us(MAX(v.t_view)) AS dt_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    cum AS (
        SELECT dt_us,
               SUM(COUNT(*)) OVER (ORDER BY dt_us
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cw,
               SUM(COUNT(*)) OVER () AS n
        FROM p GROUP BY dt_us
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converters,
           ROUND(MIN(CASE WHEN cw >= n / 2.0 THEN dt_us END)
                 / 1000000.0, 6) AS median_s,
           ROUND(MIN(dt_us) / 1000000.0, 6) AS min_s,
           ROUND(MAX(dt_us) / 1000000.0, 6) AS max_s
    FROM cum
    """,
)
def q_events_time_to_convert(spark, sf_dir):
    """Conversion latency: for every user whose first purchase follows
    their first view, the seconds between the two — discrete median
    (smallest duration whose cumulative count reaches half) plus min/max.
    Durations are exact integer microseconds, so the median pick and the
    cw ≥ n/2 boundary are engine-independent. Two user-grain aggregates
    and an O(distinct durations) prefix scan."""
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(
            (
                F.unix_micros(F.min("ts")) - F.unix_micros(F.max("t_view"))
            ).alias("dt_us")
        )
    )
    by_dt = p.groupBy("dt_us").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("dt_us").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = by_dt.select(
        "dt_us",
        F.sum("cnt").over(w_cum).alias("cw"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    return cum.agg(
        F.max("n").cast("bigint").alias("n_converters"),
        r6(
            F.min(
                F.when(
                    F.col("cw") >= F.col("n") / 2.0, F.col("dt_us")
                )
            )
            / 1000000.0
        ).alias("median_s"),
        r6(F.min("dt_us") / 1000000.0).alias("min_s"),
        r6(F.max("dt_us") / 1000000.0).alias("max_s"),
    )


@query(
    "q_stream_disorder",
    oracle="""
    WITH arr AS (
        SELECT event_type, ts,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS high_water
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts < high_water THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           ROUND(SUM(CASE WHEN ts < high_water THEN 1.0 ELSE 0 END)
                 / COUNT(*), 6) AS late_share,
           ROUND(MAX(epoch_us(high_water) - epoch_us(ts))
                 / 1000000.0, 6) AS max_lateness_s
    FROM arr GROUP BY event_type
    """,
)
def q_stream_disorder(spark, sf_dir):
    """Event-time disorder profile of the stream: treating event_id as
    arrival order, an event is LATE if it arrives after a later-timestamped
    event (its ts is below the running high-water mark). Per event_type:
    late count, late share, and the worst lateness in seconds — exactly
    the measurement that justifies a `withWatermark` bound (SURVEY §2.7's
    q_stream_latedata models the drop side; this measures the disorder
    itself). The running max is a prefix scan in arrival order; in a real
    deployment it runs per source partition (arrival order is only defined
    per partition), which is also what makes it scale."""
    ev = T(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    arr = ev.select(
        "event_type", "ts", F.max("ts").over(w).alias("high_water")
    )
    late = F.col("ts") < F.col("high_water")
    return arr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("n_late"),
        r6(
            F.sum(F.when(late, 1.0).otherwise(0.0)) / F.count(F.lit(1))
        ).alias("late_share"),
        r6(
            F.max(
                F.unix_micros("high_water") - F.unix_micros("ts")
            )
            / 1000000.0
        ).alias("max_lateness_s"),
    )


@query(
    "q_llm_template_docs",
    oracle="""
    WITH pre AS (
        SELECT doc_id, source,
               array_to_string(string_split(text, ' ')[1:2], ' ')
                   AS prefix
        FROM documents
    )
    SELECT prefix,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS example_doc
    FROM pre
    GROUP BY prefix
    HAVING COUNT(*) >= 2
    ORDER BY n_docs DESC, prefix
    LIMIT 20
    """,
)
def q_llm_template_docs(spark, sf_dir):
    """Boilerplate/template detection for the training-data pipeline: the
    20 most common 2-token document prefixes appearing in ≥2 docs, with
    how many sources they span (a prefix shared across many sources is
    site chrome / license headers / scraped templates — prime dedup-filter
    candidates upstream of MinHash). One slice-and-concat projection, one
    count aggregation keyed by the prefix string."""
    pre = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.array_join(
            F.slice(F.split("text", " "), 1, 2), " "
        ).alias("prefix"),
    )
    return (
        pre.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "prefix")
        .limit(20)
    )


@query(
    "q_array_setops",
    oracle="""
    WITH a AS (
        SELECT DISTINCT UNNEST(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id = 0
    ),
    b AS (
        SELECT DISTINCT UNNEST(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id = 1
    )
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
           CAST((SELECT COUNT(*) FROM a JOIN b USING (tok)) AS BIGINT)
               AS n_inter,
           CAST((SELECT COUNT(*) FROM (SELECT tok FROM a UNION
                                       SELECT tok FROM b)) AS BIGINT)
               AS n_union,
           CAST((SELECT COUNT(*) FROM (SELECT tok FROM a EXCEPT
                                       SELECT tok FROM b)) AS BIGINT)
               AS n_a_only
    """,
)
def q_array_setops(spark, sf_dir):
    """Array-column set algebra: the distinct-token sets of doc 0 and
    doc 1 compared entirely with ARRAY higher-order operators on the
    Spark side (array_distinct / array_intersect / array_union /
    array_except — no explode, no shuffle: two rows in, one row out,
    all work inside whole-stage codegen). The oracle computes the same
    five cardinalities relationally, proving the array kernels match
    set semantics exactly — the basis for the token-set Jaccard used
    across the dedup family."""
    docs = T(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") == 0).select(
        F.array_distinct(F.split("text", " ")).alias("ta")
    )
    b = docs.filter(F.col("doc_id") == 1).select(
        F.array_distinct(F.split("text", " ")).alias("tb")
    )
    return a.crossJoin(b).select(
        F.size("ta").cast("bigint").alias("n_a"),
        F.size("tb").cast("bigint").alias("n_b"),
        F.size(F.array_intersect("ta", "tb")).cast("bigint").alias("n_inter"),
        F.size(F.array_union("ta", "tb")).cast("bigint").alias("n_union"),
        F.size(F.array_except("ta", "tb")).cast("bigint").alias("n_a_only"),
    )


@query(
    "q_win_standardize",
    oracle="""
    WITH z AS (
        SELECT o_orderkey, o_orderstatus,
               (o_totalprice - AVG(o_totalprice)
                                   OVER (PARTITION BY o_orderstatus))
               / STDDEV_SAMP(o_totalprice)
                     OVER (PARTITION BY o_orderstatus) AS zscore
        FROM orders
    )
    SELECT o_orderkey, o_orderstatus, ROUND(zscore, 6) AS zscore
    FROM z
    ORDER BY ROUND(ABS(zscore), 6) DESC, o_orderkey
    LIMIT 5
    """,
)
def q_win_standardize(spark, sf_dir):
    """Within-group standardization via unbounded window aggregates: each
    order's z-score against its own status group's mean/stddev, reporting
    the 5 most extreme orders (|z| rounded, orderkey tie-break). The
    window form computes group moments WITHOUT collapsing the rows — the
    pattern feature pipelines use to attach normalized columns; Catalyst
    evaluates both aggregates in one window pass per partition."""
    orders = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus")
    z = orders.select(
        "o_orderkey",
        "o_orderstatus",
        (
            (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
            / F.stddev_samp("o_totalprice").over(w)
        ).alias("zscore"),
    )
    return (
        z.select("o_orderkey", "o_orderstatus", r6("zscore").alias("zscore"))
        .orderBy(F.desc(F.round(F.abs(F.col("zscore")), 6)), "o_orderkey")
        .limit(5)
    )


@query(
    "q_llm_data_card",
    oracle="""
    WITH base AS (
        SELECT COUNT(*)::DOUBLE AS n_docs,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT source) AS n_sources,
               COUNT(DISTINCT md5(text))::DOUBLE AS n_unique,
               AVG(n_chars) AS mean_chars,
               AVG(len(string_split(text, ' '))) AS mean_tokens,
               SUM(CASE WHEN lang = 'en' THEN 1.0 ELSE 0 END) AS n_en
        FROM documents
    ),
    vocab AS (
        SELECT COUNT(DISTINCT tok) AS v, COUNT(*) AS t FROM
        (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
    )
    SELECT CAST(base.n_docs AS BIGINT) AS n_docs,
           CAST(base.n_langs AS BIGINT) AS n_langs,
           CAST(base.n_sources AS BIGINT) AS n_sources,
           CAST(vocab.t AS BIGINT) AS total_tokens,
           CAST(vocab.v AS BIGINT) AS vocab_size,
           ROUND(base.mean_tokens, 6) AS mean_tokens,
           ROUND(base.mean_chars, 6) AS mean_chars,
           ROUND(base.n_en / base.n_docs, 6) AS pct_en,
           ROUND(1.0 - base.n_unique / base.n_docs, 6) AS exact_dup_rate
    FROM base CROSS JOIN vocab
    """,
)
def q_llm_data_card(spark, sf_dir):
    """One-row dataset card for the corpus — the summary block a training
    run logs before touching the data: document/language/source counts,
    token volume and vocabulary size, length means, English share, and
    the exact-duplicate rate (1 − distinct md5/text count). Two scans
    (doc-grain aggregates + one token explode), every figure derived
    from exact counts. The composition query that fronts the per-metric
    operators (textstats, dedup_exact, source_diversity) for a
    single-glance health check."""
    docs = T(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.md5("text")).cast("double").alias("n_unique"),
        F.avg("n_chars").alias("mean_chars"),
        F.avg(F.size(F.split("text", " "))).alias("mean_tokens"),
        F.sum(F.when(F.col("lang") == "en", 1.0).otherwise(0.0)).alias(
            "n_en"
        ),
    )
    vocab = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).agg(
        F.countDistinct("tok").alias("v"), F.count(F.lit(1)).alias("t")
    )
    return base.crossJoin(F.broadcast(vocab)).select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("n_sources").cast("bigint").alias("n_sources"),
        F.col("t").cast("bigint").alias("total_tokens"),
        F.col("v").cast("bigint").alias("vocab_size"),
        r6("mean_tokens").alias("mean_tokens"),
        r6("mean_chars").alias("mean_chars"),
        r6(F.col("n_en") / F.col("n_docs")).alias("pct_en"),
        r6(1.0 - F.col("n_unique") / F.col("n_docs")).alias(
            "exact_dup_rate"
        ),
    )


@query(
    "q_llm_quality_gate",
    oracle="""
    WITH feats AS (
        SELECT lang,
               len(string_split(text, ' ')) AS n_tok,
               1.0 - len(list_distinct(string_split(text, ' ')))
                     / len(string_split(text, ' '))::DOUBLE AS rep
        FROM documents
    ),
    gated AS (
        SELECT lang,
               CASE WHEN n_tok < 25 THEN 'too_short'
                    WHEN n_tok > 95 THEN 'too_long'
                    WHEN rep > 0.6 THEN 'too_repetitive'
                    ELSE 'pass' END AS gate
        FROM feats
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN gate = 'pass' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass,
           CAST(SUM(CASE WHEN gate = 'too_short' THEN 1 ELSE 0 END)
                AS BIGINT) AS kill_short,
           CAST(SUM(CASE WHEN gate = 'too_long' THEN 1 ELSE 0 END)
                AS BIGINT) AS kill_long,
           CAST(SUM(CASE WHEN gate = 'too_repetitive' THEN 1 ELSE 0 END)
                AS BIGINT) AS kill_repetitive,
           ROUND(SUM(CASE WHEN gate = 'pass' THEN 1.0 ELSE 0 END)
                 / COUNT(*), 6) AS pass_rate
    FROM gated GROUP BY lang
    """,
)
def q_llm_quality_gate(spark, sf_dir):
    """Composable quality-filter gate with first-failure attribution: each
    doc is killed by the FIRST failing rule in a fixed order (token count
    < 25 → too_short; > 95 → too_long; repetition ratio 1 − distinct/total
    > 0.6 → too_repetitive) or passes. Per language: survivors, kills per
    rule, pass rate — the funnel report every corpus-cleaning pipeline
    publishes (q_llm_pipeline_funnel chains gates ACROSS stages; this
    attributes WITHIN one stage). Single scan, one CASE cascade, all
    integer counts."""
    docs = T(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    feats = docs.select(
        "lang",
        F.size(toks).alias("n_tok"),
        (
            1.0
            - F.size(F.array_distinct(toks))
            / F.size(toks).cast("double")
        ).alias("rep"),
    )
    gate = (
        F.when(F.col("n_tok") < 25, "too_short")
        .when(F.col("n_tok") > 95, "too_long")
        .when(F.col("rep") > 0.6, "too_repetitive")
        .otherwise("pass")
    )
    gated = feats.select("lang", gate.alias("gate"))
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("gate") == "pass", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.sum(F.when(F.col("gate") == "too_short", 1).otherwise(0))
        .cast("bigint")
        .alias("kill_short"),
        F.sum(F.when(F.col("gate") == "too_long", 1).otherwise(0))
        .cast("bigint")
        .alias("kill_long"),
        F.sum(F.when(F.col("gate") == "too_repetitive", 1).otherwise(0))
        .cast("bigint")
        .alias("kill_repetitive"),
        r6(
            F.sum(F.when(F.col("gate") == "pass", 1.0).otherwise(0.0))
            / F.count(F.lit(1))
        ).alias("pass_rate"),
    )


@query(
    "q_events_active_time",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts)
                         - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                         > 300000000
                         OR LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_island
        FROM events
    ),
    islands AS (
        SELECT user_id, ts,
               SUM(new_island) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM seq
    ),
    spans AS (
        SELECT user_id, island,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) + 300000000 AS span_us
        FROM islands GROUP BY user_id, island
    ),
    per_user AS (
        SELECT user_id, SUM(span_us) AS active_us,
               COUNT(*) AS n_islands
        FROM spans GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_islands AS BIGINT) AS n_islands,
           ROUND(active_us / 3600000000.0, 6) AS active_hours
    FROM per_user
    ORDER BY active_us DESC, user_id
    LIMIT 5
    """,
)
def q_events_active_time(spark, sf_dir):
    """Interval-union active time: each event opens a 5-minute activity
    window; overlapping windows merge (gaps-and-islands on the >300s
    break), and a user's active time is the summed length of the merged
    islands — the 'time actually engaged' metric that naively summing
    fixed windows double-counts. Top-5 users by active hours. All
    arithmetic on exact integer microseconds; one LAG pass and two keyed
    aggregations, partitioned by user (shuffle-free if bucketed by
    user_id at rest)."""
    ev = T(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w_seq))
                > 300000000
            )
            | F.lag("ts").over(w_seq).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    # Cumulative-island window tie-breaks on event_id to match the (ts,
    # event_id) order new_island was derived under: duplicate (user_id, ts)
    # rows would otherwise make island ids order-dependent across engines.
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = seq.select(
        "user_id", "ts", F.sum("new_island").over(w_cum).alias("island")
    )
    spans = islands.groupBy("user_id", "island").agg(
        (
            F.unix_micros(F.max("ts"))
            - F.unix_micros(F.min("ts"))
            + 300000000
        ).alias("span_us")
    )
    per_user = spans.groupBy("user_id").agg(
        F.sum("span_us").alias("active_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
    )
    # Sort/limit on the exact integer active_us BEFORE projecting it away
    # (same rule as q_events_kaplan_meier): ordering on the rounded
    # active_hours could pick a different 5-row prefix than the oracle's
    # ORDER BY active_us when two users differ by less than the rounding
    # quantum at the cutoff.
    return (
        per_user.orderBy(F.desc("active_us"), "user_id")
        .limit(5)
        .select(
            "user_id",
            "n_islands",
            r6(F.col("active_us") / 3600000000.0).alias("active_hours"),
        )
    )


@query(
    "q_llm_shard_plan",
    oracle="""
    WITH per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(len(string_split(text, ' '))) AS total_tokens
        FROM documents GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(CEIL(total_tokens / 10000.0) AS BIGINT) AS n_shards,
           ROUND(total_tokens
                 / (CEIL(total_tokens / 10000.0) * 10000.0), 6)
               AS shard_fill
    FROM per_source
    ORDER BY source
    """,
)
def q_llm_shard_plan(spark, sf_dir):
    """Output-shard planning for the training-data writer: per source, the
    shard count at a 10k-token budget and the resulting average fill
    factor — the numbers that decide `repartition(n)` before the final
    write so shards come out uniform instead of one-giant-file-per-
    partition (the small-files/straggler tradeoff at 100 TB). Exact
    integer token counts; ceil on an exact int/10⁴ ratio is boundary-
    safe."""
    docs = T(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
    )
    shards = F.ceil(F.col("total_tokens") / 10000.0)
    return per_source.select(
        "source",
        "n_docs",
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        shards.cast("bigint").alias("n_shards"),
        r6(F.col("total_tokens") / (shards * 10000.0)).alias("shard_fill"),
    ).orderBy("source")


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(BIT_AND(CAST(l_linenumber AS BIGINT)) AS BIGINT)
               AS and_linenumber,
           CAST(BIT_OR(CAST(l_linenumber AS BIGINT)) AS BIGINT)
               AS or_linenumber,
           CAST(BIT_XOR(CAST(l_orderkey AS BIGINT)) AS BIGINT)
               AS xor_orderkey
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bitwise(spark, sf_dir):
    """Bitwise aggregates per return flag: BIT_AND/BIT_OR of line numbers
    and BIT_XOR of order keys. XOR-of-keys is the practical one — an
    order-insensitive, trivially mergeable distributed CHECKSUM (two
    datasets with equal row multisets XOR to the same value), the
    cheapest cross-cluster reconciliation probe there is. All three are
    associative-commutative, so partial aggregation applies untouched."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(F.col("l_linenumber").cast("bigint")).alias(
            "and_linenumber"
        ),
        F.bit_or(F.col("l_linenumber").cast("bigint")).alias(
            "or_linenumber"
        ),
        F.bit_xor(F.col("l_orderkey").cast("bigint")).alias("xor_orderkey"),
    )


@query(
    "q_date_qoq",
    oracle="""
    WITH q AS (
        SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
                   AS quarter,
               SUM(o_totalprice) AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT quarter,
           CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(revenue, 2) AS revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY quarter))
                 / LAG(revenue) OVER (ORDER BY quarter), 6) AS qoq_growth
    FROM q ORDER BY quarter
    """,
)
def q_date_qoq(spark, sf_dir):
    """Quarter-over-quarter revenue growth: the fiscal rollup
    (date_trunc to quarter) with LAG-based growth rates — the reporting
    query every finance dashboard runs, including the NULL first
    quarter. One fact aggregation to the tiny quarter frame, one
    ordered window over it. Revenue rounded at 2 (magnitude ~1e8);
    growth is a ratio of those sums, O(1)."""
    orders = T(spark, sf_dir, "orders")
    q = orders.groupBy(
        F.date_trunc("quarter", "o_orderdate").alias("quarter")
    ).agg(
        F.sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("quarter")
    return q.select(
        "quarter",
        "n_orders",
        F.round("revenue", 2).alias("revenue"),
        r6(
            (F.col("revenue") - F.lag("revenue").over(w))
            / F.lag("revenue").over(w)
        ).alias("qoq_growth"),
    ).orderBy("quarter")


@query(
    "q_date_isoweek",
    oracle="""
    SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    LIMIT 30
    """,
)
def q_date_isoweek(spark, sf_dir):
    """Orders rolled up to the ISO calendar: (ISO week-year, ISO week)
    buckets — the year-boundary trap the Gregorian year/week pair gets
    wrong (Jan 1 can belong to week 52 of the PREVIOUS iso-year; verified
    live: both engines map 2022-01-01 → (2021, 52)). Spark's
    extract(YEAROFWEEK)/weekofyear and DuckDB's isoyear/weekofyear share
    ISO-8601 semantics exactly. First 30 buckets in calendar order; sums
    rounded at 2 (magnitude ~1e7)."""
    orders = T(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.expr("extract(YEAROFWEEK FROM o_orderdate)")
            .cast("bigint")
            .alias("iso_year"),
            F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("iso_year", "iso_week")
        .limit(30)
    )


@query(
    "q_str_unicode",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(length(text)), 6) AS avg_chars,
           ROUND(AVG(strlen(text)), 6) AS avg_bytes,
           ROUND(AVG(strlen(text)::DOUBLE / length(text)), 6)
               AS bytes_per_char
    FROM documents GROUP BY lang
    """,
)
def q_str_unicode(spark, sf_dir):
    """Unicode width audit: per language, average CHARACTER length vs
    average UTF-8 BYTE length of documents and their ratio — ≈1.0 for
    Latin-script langs, ≈3.0 for zh (CJK codepoints are 3 bytes). The
    distinction that sizes shuffle buffers and storage correctly for
    multilingual corpora, and proof the engines agree on codepoint vs
    octet semantics (Spark length/octet_length ≡ DuckDB length/strlen)."""
    docs = T(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        r6(F.avg(F.length("text"))).alias("avg_chars"),
        r6(F.avg(F.octet_length("text"))).alias("avg_bytes"),
        r6(
            F.avg(
                F.octet_length("text").cast("double") / F.length("text")
            )
        ).alias("bytes_per_char"),
    )


@query(
    "q_agg_geomean",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(EXP(AVG(LN(l_quantity))), 6) AS geomean_qty,
           ROUND(AVG(l_quantity), 6) AS mean_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_geomean(spark, sf_dir):
    """Geometric mean of order quantity per return flag — exp(avg(ln x)),
    the multiplicative average SQL lacks as a builtin, next to the
    arithmetic mean it always undershoots (AM–GM). The log transform
    turns a product aggregate into an ordinary partial+final SUM, which
    is exactly how a distributed product must be computed anyway
    (quantities are ≥ 1, so ln is total)."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r6(F.exp(F.avg(F.log("l_quantity")))).alias("geomean_qty"),
        r6(F.avg("l_quantity")).alias("mean_qty"),
    )


@query(
    "q_events_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT event_type AS s,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t
        FROM events
    ),
    trans AS (
        SELECT s, t, COUNT(*)::DOUBLE AS c
        FROM seq WHERE t IS NOT NULL GROUP BY s, t
    ),
    marg AS (
        SELECT s, t, c,
               SUM(c) OVER (PARTITION BY s) AS cs,
               SUM(c) OVER () AS total
        FROM trans
    )
    SELECT CAST(MAX(total) AS BIGINT) AS n_transitions,
           ROUND(-SUM((c / total) * LN(c / cs)), 6) AS entropy_rate,
           ROUND(EXP(-SUM((c / total) * LN(c / cs))), 6) AS perplexity
    FROM marg
    """,
)
def q_events_entropy_rate(spark, sf_dir):
    """Entropy rate of the per-user behavior Markov chain: H = −Σ_{s,t}
    p(s,t)·ln P(t|s) over observed transitions (ordered by ts with
    event_id tie-break), and its perplexity exp(H) — 'how many
    effectively-random next actions does a user have'. The summary scalar
    on top of q_events_markov's transition matrix: one LEAD window keyed
    by user, one count aggregation over the 5×5 state space."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("t"),
    ).filter(F.col("t").isNotNull())
    trans = seq.groupBy("s", "t").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    ws = Window.partitionBy("s")
    wa = Window.partitionBy()
    marg = trans.select(
        "c",
        F.sum("c").over(ws).alias("cs"),
        F.sum("c").over(wa).alias("total"),
    )
    h = -F.sum((F.col("c") / F.col("total")) * F.log(F.col("c") / F.col("cs")))
    return marg.agg(
        F.max("total").cast("bigint").alias("n_transitions"),
        r6(h).alias("entropy_rate"),
        r6(F.exp(h)).alias("perplexity"),
    )


@query(
    "q_events_audience_overlap",
    oracle="""
    WITH tu AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
        SELECT event_type, COUNT(*)::DOUBLE AS n FROM tu GROUP BY 1
    ),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*)::DOUBLE AS cboth
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(cboth AS BIGINT) AS n_both,
           ROUND(cboth / (sa.n + sb.n - cboth), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.event_type = type_a
    JOIN sizes sb ON sb.event_type = type_b
    """,
)
def q_events_audience_overlap(spark, sf_dir):
    """Audience-overlap matrix: Jaccard similarity of the distinct-user
    sets behind every pair of event types (10 pairs for 5 types) —
    |A∩B| / |A∪B| with the union by inclusion-exclusion, so only the
    intersection needs a join. The (type, user) dedup is the single
    fact-table shuffle; the self-join runs on that reduced frame keyed by
    user. The exact version of what q_sketch_kmv_setops estimates."""
    ev = T(spark, sf_dir, "events")
    # materialized once: the dedup'd (type, user) frame feeds both
    # self-join sides and the per-type sizes
    tu = ev.select("event_type", "user_id").distinct().transform(_ckpt)
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("double").alias("both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("both").cast("bigint").alias("n_both"),
            r6(
                F.col("both")
                / (F.col("na") + F.col("nb") - F.col("both"))
            ).alias("jaccard"),
        )
    )


@query(
    "q_stream_watermark_budget",
    oracle="""
    WITH arr AS (
        SELECT ts,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS high_water
        FROM events
    ),
    late AS (
        SELECT (epoch_us(high_water) - epoch_us(ts)) / 1000000.0
                   AS late_s
        FROM arr WHERE ts < high_water
    ),
    cum AS (
        SELECT late_s,
               SUM(COUNT(*)) OVER (ORDER BY late_s
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cw,
               SUM(COUNT(*)) OVER () AS n
        FROM late GROUP BY late_s
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_late,
           ROUND(MIN(CASE WHEN cw >= 0.5 * n THEN late_s END), 6)
               AS p50_late_s,
           ROUND(MIN(CASE WHEN cw >= 0.99 * n THEN late_s END), 6)
               AS p99_late_s,
           ROUND(MAX(late_s), 6) AS max_late_s
    FROM cum
    """,
)
def q_stream_watermark_budget(spark, sf_dir):
    """Watermark sizing from measured disorder: among LATE events (those
    arriving after a later-timestamped event, per q_stream_disorder's
    high-water construction), the discrete p50/p99/max lateness in
    seconds. `withWatermark(ts, p99)` keeps 99% of late data while
    bounding state — this query turns the disorder measurement into the
    exact delay budget to configure, instead of a guessed '1 hour'.
    Lateness values are exact-µs integers scaled once; quantiles are
    discrete picks on the distinct-lateness frame."""
    ev = T(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    arr = ev.select("ts", F.max("ts").over(w).alias("high_water"))
    late = arr.filter(F.col("ts") < F.col("high_water")).select(
        (
            (F.unix_micros("high_water") - F.unix_micros("ts")) / 1000000.0
        ).alias("late_s")
    )
    by_l = late.groupBy("late_s").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("late_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cum = by_l.select(
        "late_s",
        F.sum("cnt").over(w_cum).alias("cw"),
        F.sum("cnt").over(w_all).alias("n"),
    )

    def pick(p):
        return F.min(
            F.when(F.col("cw") >= p * F.col("n"), F.col("late_s"))
        )

    return cum.agg(
        F.max("n").cast("bigint").alias("n_late"),
        r6(pick(0.5)).alias("p50_late_s"),
        r6(pick(0.99)).alias("p99_late_s"),
        r6(F.max("late_s")).alias("max_late_s"),
    )


@query(
    "q_events_volatility",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               SUM(value) AS total
        FROM events GROUP BY 1
    ),
    rets AS (
        SELECT (total - LAG(total) OVER (ORDER BY day))
               / LAG(total) OVER (ORDER BY day) AS r
        FROM daily
    )
    SELECT CAST(COUNT(r) AS BIGINT) AS n_days,
           ROUND(AVG(r), 6) AS mean_return,
           ROUND(STDDEV_SAMP(r), 6) AS daily_vol,
           ROUND(AVG(r) / STDDEV_SAMP(r), 6) AS sharpe_like
    FROM rets WHERE r IS NOT NULL
    """,
)
def q_events_volatility(spark, sf_dir):
    """Volatility profile of the daily value series: day-over-day
    relative changes, their mean and standard deviation, and the
    mean/vol ratio — the Sharpe-shaped stability score that pairs with
    q_events_drawdown (that one measures the worst excursion; this the
    typical wiggle). One daily aggregation, one LAG window, one moment
    pass."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum("value").alias("total")
    )
    w = Window.orderBy("day")
    rets = daily.select(
        (
            (F.col("total") - F.lag("total").over(w))
            / F.lag("total").over(w)
        ).alias("r")
    ).filter(F.col("r").isNotNull())
    return rets.agg(
        F.count("r").cast("bigint").alias("n_days"),
        r6(F.avg("r")).alias("mean_return"),
        r6(F.stddev_samp("r")).alias("daily_vol"),
        r6(F.avg("r") / F.stddev_samp("r")).alias("sharpe_like"),
    )


@query(
    "q_events_early_ltv_corr",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               SUM(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN value
                        ELSE 0 END) AS week1,
               SUM(value) AS total
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CORR(week1, total), 6) AS corr_week1_total,
           ROUND(REGR_SLOPE(total, week1), 6) AS slope,
           ROUND(REGR_INTERCEPT(total, week1), 6) AS intercept
    FROM per_user
    """,
)
def q_events_early_ltv_corr(spark, sf_dir):
    """Early-signal LTV predictivity: per user, first-week spend vs
    30-day total spend — correlation plus the OLS line that turns a
    week-1 observation into a lifetime forecast (the model behind
    'projected LTV' dashboards, fit in one aggregate; the cohort curve
    itself is q_events_cohort_ltv). First-week spend is part of the
    total, so the correlation has a mechanical floor — the slope and
    intercept are the actionable outputs."""
    ev = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-08").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias(
            "week1"
        ),
        F.sum("value").alias("total"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        r6(F.corr("week1", "total")).alias("corr_week1_total"),
        r6(
            F.covar_samp("week1", "total") / F.var_samp("week1")
        ).alias("slope"),
        r6(
            F.avg("total")
            - F.covar_samp("week1", "total")
            / F.var_samp("week1")
            * F.avg("week1")
        ).alias("intercept"),
    )
