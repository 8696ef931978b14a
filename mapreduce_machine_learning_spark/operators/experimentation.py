"""Experimentation / causal-analytics operators: CUPED variance reduction,
empirical-Bayes rate smoothing, and Q-Q distribution comparison.

These are the A/B-testing workhorses layered on the same summation-form
kernels as the ML family: per-unit aggregation (user grain), tiny global
moment aggregates broadcast back, closed-form adjustment arithmetic. At
100 TB the user-grain aggregation is the only fact-table shuffle; if events
are bucketed by user_id at rest it is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query


@query(
    "q_events_cuped",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               user_id % 2 AS arm,
               SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS pre,
               SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS post
        FROM events GROUP BY user_id
    ),
    mom AS (
        SELECT COVAR_SAMP(pre, post) / VAR_SAMP(pre) AS theta,
               AVG(pre) AS mean_pre,
               VAR_SAMP(post) AS var_post
        FROM per_user
    ),
    adj AS (
        SELECT u.arm,
               u.post - mom.theta * (u.pre - mom.mean_pre) AS y,
               mom.theta AS theta, mom.var_post AS var_post
        FROM per_user u CROSS JOIN mom
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(MAX(theta), 6) AS theta,
           ROUND(1.0 - VAR_SAMP(y) / MAX(var_post), 6) AS var_reduction,
           ROUND(AVG(CASE WHEN arm = 1 THEN y END)
                 - AVG(CASE WHEN arm = 0 THEN y END), 6) AS adjusted_diff
    FROM adj
    """,
)
def q_events_cuped(spark, sf_dir):
    """CUPED variance reduction for an A/B readout (arm = user_id mod 2):
    pre-period (first 15 days) spend is the covariate, post-period spend
    the metric; θ = cov(pre,post)/var(pre), adjusted yᵢ = postᵢ −
    θ(preᵢ − mean_pre). Reports θ, the realized variance reduction
    (≈ correlation², the whole point of CUPED), and the adjusted
    treatment-control difference. One user-grain aggregation, a 1-row
    moment aggregate broadcast back, one re-aggregation — no extra
    fact-table passes."""
    ev = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias(
            "pre"
        ),
        F.sum(
            F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)
        ).alias("post"),
    ).select(
        (F.col("user_id") % 2).alias("arm"), "pre", "post"
    )
    mom = per_user.agg(
        (F.covar_samp("pre", "post") / F.var_samp("pre")).alias("theta"),
        F.avg("pre").alias("mean_pre"),
        F.var_samp("post").alias("var_post"),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).select(
        "arm",
        (
            F.col("post") - F.col("theta") * (F.col("pre") - F.col("mean_pre"))
        ).alias("y"),
        "theta",
        "var_post",
    )
    return adj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        r6(F.max("theta")).alias("theta"),
        r6(1.0 - F.var_samp("y") / F.max("var_post")).alias("var_reduction"),
        r6(
            F.avg(F.when(F.col("arm") == 1, F.col("y")))
            - F.avg(F.when(F.col("arm") == 0, F.col("y")))
        ).alias("adjusted_diff"),
    )


@query(
    "q_events_eb_rate",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*)::DOUBLE AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END)::DOUBLE AS k
        FROM events GROUP BY user_id
    ),
    mom AS (
        SELECT AVG(k / n) AS m, VAR_SAMP(k / n) AS v FROM per_user
    ),
    prior AS (
        SELECT m * (m * (1 - m) / v - 1) AS alpha,
               (1 - m) * (m * (1 - m) / v - 1) AS beta
        FROM mom
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           CAST(k AS BIGINT) AS n_purchases,
           ROUND((k + alpha) / (n + alpha + beta), 6) AS smoothed_rate
    FROM per_user CROSS JOIN prior
    ORDER BY ROUND((k + alpha) / (n + alpha + beta), 6) DESC, user_id
    LIMIT 10
    """,
)
def q_events_eb_rate(spark, sf_dir):
    """Empirical-Bayes smoothed per-user purchase rate: a Beta prior fit
    by method of moments on the raw per-user rates (α = m·c, β = (1−m)·c,
    c = m(1−m)/v − 1), then the posterior-mean shrinkage (k+α)/(n+α+β).
    Kills the '1 purchase in 2 events = 50% whale' artifact that raw
    top-k rate rankings produce. Top-10 selects on the rounded smoothed
    rate with user_id tie-break. Plan: user-grain aggregation, 1-row
    moment broadcast, rank on O(users) rows."""
    ev = T(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("k"),
    )
    mom = per_user.agg(
        F.avg(F.col("k") / F.col("n")).alias("m"),
        F.var_samp(F.col("k") / F.col("n")).alias("v"),
    )
    c = F.col("m") * (1 - F.col("m")) / F.col("v") - 1
    prior = mom.select(
        (F.col("m") * c).alias("alpha"),
        ((1 - F.col("m")) * c).alias("beta"),
    )
    sm = (F.col("k") + F.col("alpha")) / (
        F.col("n") + F.col("alpha") + F.col("beta")
    )
    return (
        per_user.crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("k").cast("bigint").alias("n_purchases"),
            r6(sm).alias("smoothed_rate"),
        )
        .orderBy(F.desc("smoothed_rate"), "user_id")
        .limit(10)
    )


@query(
    "q_events_qq",
    oracle="""
    WITH vals AS (
        SELECT event_type AS grp, value, COUNT(*) AS cnt
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY event_type, value
    ),
    cum AS (
        SELECT grp, value,
               SUM(cnt) OVER (PARTITION BY grp ORDER BY value
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cw,
               SUM(cnt) OVER (PARTITION BY grp) AS n
        FROM vals
    ),
    ps AS (SELECT CAST(UNNEST([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS DOUBLE) AS p),
    q AS (
        SELECT ps.p, cum.grp, MIN(cum.value) AS qv
        FROM cum JOIN ps ON cum.cw >= ps.p * cum.n
        GROUP BY ps.p, cum.grp
    )
    SELECT ROUND(p, 6) AS p,
           ROUND(MIN(CASE WHEN grp = 'purchase' THEN qv END), 6)
               AS q_purchase,
           ROUND(MIN(CASE WHEN grp = 'click' THEN qv END), 6) AS q_click
    FROM q GROUP BY p
    """,
)
def q_events_qq(spark, sf_dir):
    """Q–Q comparison table of purchase vs click `value` at the nine
    deciles, using DISCRETE quantile semantics (smallest observed value
    whose cumulative count reaches p·n) so both engines pick identical
    sample points — no interpolation, no FP midpoints. The quantile scan
    runs on the distinct-value frame per group; the nine probes are a
    literal array joined against it. Matching decile columns far apart ⇒
    the distributions differ in shape, not just mean."""
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    vals = ev.groupBy(
        F.col("event_type").alias("grp"), "value"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("grp").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("grp")
    cum = vals.select(
        "grp",
        "value",
        F.sum("cnt").over(w_cum).alias("cw"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    ps = spark.range(1, 10).select((F.col("id") / 10.0).alias("p"))
    q = (
        cum.join(F.broadcast(ps), F.col("cw") >= F.col("p") * F.col("n"))
        .groupBy("p", "grp")
        .agg(F.min("value").alias("qv"))
    )
    return q.groupBy(r6("p").alias("p")).agg(
        r6(F.min(F.when(F.col("grp") == "purchase", F.col("qv")))).alias(
            "q_purchase"
        ),
        r6(F.min(F.when(F.col("grp") == "click", F.col("qv")))).alias(
            "q_click"
        ),
    )


@query(
    "q_events_did",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS pre,
               SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS post
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_treat,
           CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_ctrl,
           ROUND(AVG(post - pre) FILTER (WHERE arm = 1), 6) AS diff_treat,
           ROUND(AVG(post - pre) FILTER (WHERE arm = 0), 6) AS diff_ctrl,
           ROUND(AVG(post - pre) FILTER (WHERE arm = 1)
                 - AVG(post - pre) FILTER (WHERE arm = 0), 6) AS did
    FROM per_user
    """,
)
def q_events_did(spark, sf_dir):
    """Difference-in-differences estimator: per-user pre/post spend around
    the Jan-16 cut, arms by user_id parity; DiD = (treat post−pre) −
    (control post−pre), the design that nets out the shared time trend a
    naive post-only comparison absorbs. Same single user-grain aggregation
    as q_events_cuped, finished by conditional averages."""
    ev = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias(
            "pre"
        ),
        F.sum(
            F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)
        ).alias("post"),
    ).select((F.col("user_id") % 2).alias("arm"), "pre", "post")
    d = F.col("post") - F.col("pre")
    dt = F.avg(F.when(F.col("arm") == 1, d))
    dc = F.avg(F.when(F.col("arm") == 0, d))
    return per_user.agg(
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("n_treat"),
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("n_ctrl"),
        r6(dt).alias("diff_treat"),
        r6(dc).alias("diff_ctrl"),
        r6(dt - dc).alias("did"),
    )


@query(
    "q_ml_power",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(VAR_SAMP(value), 6) AS sigma2,
           ROUND(2.0 * VAR_SAMP(value)
                 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                 / (5.0 * 5.0), 6) AS n_per_arm
    FROM events
    """,
)
def q_ml_power(spark, sf_dir):
    """A/B sample-size (power) calculation from measured variance: the
    users-per-arm needed to detect a $5 shift in mean `value` at
    α = 0.05 / power 0.8, n = 2σ²(z₀.₉₇₅+z₀.₈)²/δ² with the z quantiles
    as fixed literals (§2.9 discipline — no engine normal-quantile
    functions, which would diverge). One variance aggregate; the planning
    arithmetic is constant folding."""
    ev = T(spark, sf_dir, "events")
    z = (1.959964 + 0.841621) ** 2
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r6(F.var_samp("value")).alias("sigma2"),
        r6(2.0 * F.var_samp("value") * z / 25.0).alias("n_per_arm"),
    )


@query(
    "q_events_overdispersion",
    oracle="""
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               COUNT(*)::DOUBLE AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           ROUND(AVG(c), 6) AS mean_rate,
           ROUND(VAR_SAMP(c) / AVG(c), 6) AS vmr,
           CASE WHEN ROUND(VAR_SAMP(c) / AVG(c), 6) > 1.5
                THEN 'overdispersed' ELSE 'poisson-like' END AS verdict
    FROM hourly GROUP BY event_type
    """,
)
def q_events_overdispersion(spark, sf_dir):
    """Overdispersion test on hourly arrival counts per event type: the
    variance-to-mean ratio of the count series (Poisson ⇒ VMR ≈ 1),
    flagged past 1.5 on the ROUNDED ratio (grid-stable verdict). The
    diagnostic that decides whether q_ml_poisson_grad's GLM is even the
    right likelihood, or a negative-binomial is needed. One hourly
    pre-aggregation, one moment pass over the tiny series."""
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    vmr = r6(F.var_samp("c") / F.avg("c"))
    return hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        r6(F.avg("c")).alias("mean_rate"),
        vmr.alias("vmr"),
        F.when(vmr > 1.5, "overdispersed")
        .otherwise("poisson-like")
        .alias("verdict"),
    )


@query(
    "q_ml_threshold_table",
    oracle="""
    WITH scored AS (
        SELECT 1.0 / (1.0 + EXP(-(value / 100.0 - 1.0))) AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    ts AS (SELECT CAST(UNNEST(range(1, 10)) AS DOUBLE) / 10.0 AS t)
    SELECT ts.t,
           CAST(SUM(CASE WHEN score >= t AND y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN score >= t AND y = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           ROUND(SUM(CASE WHEN score >= t AND y = 1 THEN 1.0 ELSE 0 END)
                 / NULLIF(SUM(CASE WHEN score >= t THEN 1.0 ELSE 0 END), 0),
                 6) AS precision_,
           ROUND(SUM(CASE WHEN score >= t AND y = 1 THEN 1.0 ELSE 0 END)
                 / SUM(CASE WHEN y = 1 THEN 1.0 ELSE 0 END), 6) AS recall_,
           ROUND(SUM(CASE WHEN score >= t AND y = 0 THEN 1.0 ELSE 0 END)
                 / SUM(CASE WHEN y = 0 THEN 1.0 ELSE 0 END), 6) AS fpr
    FROM scored CROSS JOIN ts
    GROUP BY ts.t
    """,
)
def q_ml_threshold_table(spark, sf_dir):
    """Operating-point table for the fixed logistic scorer σ(value/100−1)
    against the purchase label: tp/fp/precision/recall/FPR at the nine
    decision thresholds 0.1…0.9 — the table a deployment picks its
    cutoff from (q_ml_auc integrates it; this exposes the points). The
    threshold frame is 9 literal rows crossed into one conditional
    aggregation; at scale the same result comes from one pass with 9
    CASE accumulators — either way a single fact-table scan."""
    ev = T(spark, sf_dir, "events")
    scored = ev.select(
        (1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 1.0)))).alias(
            "score"
        ),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    ts = spark.range(1, 10).select(
        (F.col("id").cast("double") / 10.0).alias("t")
    )
    pred = F.col("score") >= F.col("t")
    y1 = F.col("y") == 1
    return (
        scored.crossJoin(F.broadcast(ts))
        .groupBy("t")
        .agg(
            F.sum(F.when(pred & y1, 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(pred & ~y1, 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            r6(
                F.sum(F.when(pred & y1, 1.0).otherwise(0.0))
                / F.nullif(
                    F.sum(F.when(pred, 1.0).otherwise(0.0)), F.lit(0.0)
                )
            ).alias("precision_"),
            r6(
                F.sum(F.when(pred & y1, 1.0).otherwise(0.0))
                / F.sum(F.when(y1, 1.0).otherwise(0.0))
            ).alias("recall_"),
            r6(
                F.sum(F.when(pred & ~y1, 1.0).otherwise(0.0))
                / F.sum(F.when(~y1, 1.0).otherwise(0.0))
            ).alias("fpr"),
        )
    )


@query(
    "q_ml_mcc",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN 1.0 / (1.0 + EXP(-(value / 100.0 - 1.0))) >= 0.5
                    THEN 1 ELSE 0 END AS pred,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    c AS (
        SELECT SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)::DOUBLE
                   AS tp,
               SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)::DOUBLE
                   AS fp,
               SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)::DOUBLE
                   AS fn,
               SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)::DOUBLE
                   AS tn
        FROM scored
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           ROUND((tp * tn - fp * fn)
                 / SQRT((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
                 6) AS mcc
    FROM c
    """,
)
def q_ml_mcc(spark, sf_dir):
    """Matthews correlation coefficient of the fixed logistic classifier
    at the 0.5 cutoff: the full confusion matrix and MCC = (tp·tn −
    fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)) — the single-scalar metric
    that stays honest under the ~80/20 class imbalance where accuracy
    flatters. Exact-integer confusion counts from one conditional
    aggregation; products stay within double range (< 2⁵³)."""
    ev = T(spark, sf_dir, "events")
    scored = ev.select(
        F.when(
            1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 1.0))) >= 0.5, 1
        )
        .otherwise(0)
        .alias("pred"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    c = scored.agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("double")
        .alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("double")
        .alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("double")
        .alias("fn"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("double")
        .alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return c.select(
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        r6(
            (tp * tn - fp * fn)
            / F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        ).alias("mcc"),
    )


@query(
    "q_ml_brier_decomp",
    oracle="""
    WITH scored AS (
        SELECT 1.0 / (1.0 + EXP(-(value / 100.0 - 1.0))) AS s,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0 END AS y
        FROM events
    ),
    base AS (
        SELECT COUNT(*)::DOUBLE AS n, AVG(y) AS ybar,
               AVG((s - y) * (s - y)) AS brier
        FROM scored
    ),
    bins AS (
        SELECT LEAST(CAST(FLOOR(s * 10) AS INT), 9) AS b,
               COUNT(*)::DOUBLE AS nk, AVG(s) AS sk, AVG(y) AS yk
        FROM scored GROUP BY 1
    )
    SELECT CAST(base.n AS BIGINT) AS n,
           ROUND(base.brier, 6) AS brier,
           ROUND(SUM(bins.nk * (bins.sk - bins.yk) * (bins.sk - bins.yk))
                 / base.n, 6) AS reliability,
           ROUND(SUM(bins.nk * (bins.yk - base.ybar)
                     * (bins.yk - base.ybar)) / base.n, 6) AS resolution,
           ROUND(base.ybar * (1 - base.ybar), 6) AS uncertainty
    FROM bins CROSS JOIN base
    GROUP BY base.n, base.brier, base.ybar
    """,
)
def q_ml_brier_decomp(spark, sf_dir):
    """Brier score of the fixed logistic scorer with the Murphy
    decomposition over 10 probability bins: reliability (calibration
    error — want 0), resolution (discrimination — want large), and
    uncertainty (the base-rate floor ȳ(1−ȳ)). Brier ≈ reliability −
    resolution + uncertainty, which is why 'well-calibrated but useless'
    and 'sharp but miscalibrated' models can share a Brier score — the
    decomposition tells them apart. Two aggregations over one scored
    projection."""
    ev = T(spark, sf_dir, "events")
    scored = ev.select(
        (1.0 / (1.0 + F.exp(-(F.col("value") / 100.0 - 1.0)))).alias("s"),
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    base = scored.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("y").alias("ybar"),
        F.avg((F.col("s") - F.col("y")) * (F.col("s") - F.col("y"))).alias(
            "brier"
        ),
    )
    bins = scored.groupBy(
        F.least(F.floor(F.col("s") * 10).cast("int"), F.lit(9)).alias("b")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("nk"),
        F.avg("s").alias("sk"),
        F.avg("y").alias("yk"),
    )
    joined = bins.crossJoin(F.broadcast(base))
    return joined.groupBy("n", "brier", "ybar").agg(
        F.sum(
            F.col("nk")
            * (F.col("sk") - F.col("yk"))
            * (F.col("sk") - F.col("yk"))
        ).alias("rel_raw"),
        F.sum(
            F.col("nk")
            * (F.col("yk") - F.col("ybar"))
            * (F.col("yk") - F.col("ybar"))
        ).alias("res_raw"),
    ).select(
        F.col("n").cast("bigint").alias("n"),
        r6("brier").alias("brier"),
        r6(F.col("rel_raw") / F.col("n")).alias("reliability"),
        r6(F.col("res_raw") / F.col("n")).alias("resolution"),
        r6(F.col("ybar") * (1 - F.col("ybar"))).alias("uncertainty"),
    )


@query(
    "q_ml_hoeffding",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(value) - MIN(value), 6) AS value_range,
           ROUND((MAX(value) - MIN(value)) * (MAX(value) - MIN(value))
                 * LN(2.0 / 0.05) / (2.0 * 1.0 * 1.0), 6)
               AS n_required_eps1,
           ROUND(SQRT((MAX(value) - MIN(value)) * (MAX(value) - MIN(value))
                      * LN(2.0 / 0.05) / (2.0 * COUNT(*))), 6)
               AS eps_at_current_n
    FROM events
    """,
)
def q_ml_hoeffding(spark, sf_dir):
    """Distribution-free sampling bounds via Hoeffding's inequality: with
    observed range R, the sample size guaranteeing the mean within ε=$1
    at 95% confidence (n ≥ R²ln(2/δ)/2ε²), and conversely the ε the
    CURRENT n already guarantees. The assumption-free counterpart to
    q_ml_power's variance-based plan — what you quote when nobody will
    defend a normality assumption. One min/max/count aggregate."""
    ev = T(spark, sf_dir, "events")
    import math

    s = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.max("value") - F.min("value")).alias("r"),
    )
    ln_term = math.log(2.0 / 0.05)
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        r6(F.col("r")).alias("value_range"),
        r6(F.col("r") * F.col("r") * ln_term / 2.0).alias(
            "n_required_eps1"
        ),
        r6(
            F.sqrt(F.col("r") * F.col("r") * ln_term / (2.0 * F.col("n")))
        ).alias("eps_at_current_n"),
    )


@query(
    "q_ml_average_precision",
    oracle="""
    WITH scored AS (
        SELECT value AS score, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    ranked AS (
        SELECT y,
               ROW_NUMBER() OVER (ORDER BY score DESC, event_id) AS rnk,
               SUM(y) OVER (ORDER BY score DESC, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_pos
        FROM scored
    )
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           ROUND(SUM(CASE WHEN y = 1
                          THEN cum_pos / CAST(rnk AS DOUBLE)
                          ELSE 0 END) / SUM(y), 6) AS average_precision
    FROM ranked
    """,
)
def q_ml_average_precision(spark, sf_dir):
    """Average precision (exact PR-AUC) of `value` as a purchase score:
    AP = mean over positives of precision-at-that-positive's-rank, on
    the total order (score DESC, event_id) so tie handling is identical
    on both engines. The imbalance-honest companion to q_ml_auc's ROC
    area — with ~20% positives ROC flatters, PR does not. One global
    rank window (the 100 TB path is the two-pass distributed rank:
    per-partition counts + offset prefix sums), then a single ratio
    aggregate of exact integers."""
    ev = T(spark, sf_dir, "events")
    scored = ev.select(
        F.col("value").alias("score"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    w = Window.orderBy(F.desc("score"), "event_id")
    ranked = scored.select(
        "y",
        F.row_number().over(w).alias("rnk"),
        F.sum("y")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_pos"),
    )
    return ranked.agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        r6(
            F.sum(
                F.when(
                    F.col("y") == 1,
                    F.col("cum_pos") / F.col("rnk").cast("double"),
                ).otherwise(0.0)
            )
            / F.sum("y")
        ).alias("average_precision"),
    )


@query(
    "q_events_uplift_deciles",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS arm,
               SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS pre,
               SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS post
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT arm, post,
               NTILE(5) OVER (ORDER BY pre, user_id) AS pre_quintile
        FROM per_user
    )
    SELECT CAST(pre_quintile AS BIGINT) AS pre_quintile,
           CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_treat,
           CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_ctrl,
           ROUND(AVG(post) FILTER (WHERE arm = 1)
                 - AVG(post) FILTER (WHERE arm = 0), 6) AS uplift
    FROM ranked GROUP BY pre_quintile
    """,
)
def q_events_uplift_deciles(spark, sf_dir):
    """Heterogeneous treatment effect readout: users bucketed into
    quintiles of PRE-period spend (ntile with user_id tie-break —
    deterministic cut points), then the treat-minus-control POST-period
    difference within each bucket — the table that says WHO the
    treatment moved, not just whether it moved the average
    (q_events_did). Same user-grain aggregation as CUPED/DiD, one rank
    window over O(users), conditional averages per bucket."""
    ev = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias(
            "pre"
        ),
        F.sum(
            F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)
        ).alias("post"),
    )
    w = Window.orderBy("pre", "user_id")
    ranked = per_user.select(
        (F.col("user_id") % 2).alias("arm"),
        "post",
        F.ntile(5).over(w).alias("pre_quintile"),
    )
    return ranked.groupBy(
        F.col("pre_quintile").cast("bigint").alias("pre_quintile")
    ).agg(
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("n_treat"),
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("n_ctrl"),
        r6(
            F.avg(F.when(F.col("arm") == 1, F.col("post")))
            - F.avg(F.when(F.col("arm") == 0, F.col("post")))
        ).alias("uplift"),
    )


@query(
    "q_ml_woe_iv",
    oracle="""
    WITH binned AS (
        SELECT LEAST(CAST(FLOOR(value / 25.0) AS INT), 19) AS bin,
               SUM(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END)::DOUBLE AS g,
               SUM(CASE WHEN event_type <> 'purchase' THEN 1
                        ELSE 0 END)::DOUBLE AS b
        FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(g) AS gg, SUM(b) AS bb FROM binned),
    woe AS (
        SELECT bin, g, b,
               LN((g / tot.gg) / (b / tot.bb)) AS w,
               (g / tot.gg - b / tot.bb) * LN((g / tot.gg) / (b / tot.bb))
                   AS iv_term
        FROM binned CROSS JOIN tot
        WHERE g > 0 AND b > 0
    )
    SELECT bin,
           CAST(g AS BIGINT) AS n_good,
           CAST(b AS BIGINT) AS n_bad,
           ROUND(w, 6) AS woe,
           ROUND(iv_term, 6) AS iv_term,
           ROUND(SUM(iv_term) OVER (), 6) AS iv_total
    FROM woe
    """,
)
def q_ml_woe_iv(spark, sf_dir):
    """Weight-of-evidence encoding of `value` (20 fixed-width bins)
    against the purchase label, with per-bin information-value terms and
    the total IV — the credit-scoring feature-screening standard (IV
    < 0.02 ⇒ the feature is useless; > 0.3 ⇒ strong). Bins with a zero
    class are excluded exactly as the WoE definition requires. One
    conditional aggregation; all ratios from exact integers."""
    ev = T(spark, sf_dir, "events")
    binned = ev.groupBy(
        F.least(F.floor(F.col("value") / 25.0).cast("int"), F.lit(19)).alias(
            "bin"
        )
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("g"),
        F.sum(F.when(F.col("event_type") != "purchase", 1).otherwise(0))
        .cast("double")
        .alias("b"),
    )
    tot = binned.agg(F.sum("g").alias("gg"), F.sum("b").alias("bb"))
    g, b, gg, bb = F.col("g"), F.col("b"), F.col("gg"), F.col("bb")
    w = F.log((g / gg) / (b / bb))
    woe = (
        binned.crossJoin(F.broadcast(tot))
        .filter((g > 0) & (b > 0))
        .select(
            "bin",
            g.cast("bigint").alias("n_good"),
            b.cast("bigint").alias("n_bad"),
            r6(w).alias("woe"),
            ((g / gg - b / bb) * w).alias("iv_raw"),
        )
    )
    wall = Window.partitionBy()
    return woe.select(
        "bin",
        "n_good",
        "n_bad",
        "woe",
        r6("iv_raw").alias("iv_term"),
        r6(F.sum("iv_raw").over(wall)).alias("iv_total"),
    )


@query(
    "q_events_srm",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 AS arm, COUNT(*) AS n_events
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT SUM(n_events)::DOUBLE AS total,
               SUM(CASE WHEN arm = 1 THEN n_events ELSE 0 END)::DOUBLE
                   AS n_treat
        FROM arms
    )
    SELECT CAST(n_treat AS BIGINT) AS n_treat,
           CAST(total - n_treat AS BIGINT) AS n_ctrl,
           ROUND((n_treat - total / 2) * (n_treat - total / 2) / (total / 2)
                 + ((total - n_treat) - total / 2)
                   * ((total - n_treat) - total / 2) / (total / 2), 6)
               AS chi2,
           CASE WHEN (n_treat - total / 2) * (n_treat - total / 2)
                     / (total / 2)
                     + ((total - n_treat) - total / 2)
                       * ((total - n_treat) - total / 2) / (total / 2)
                     > 3.841459 THEN 'mismatch' ELSE 'ok' END AS verdict
    FROM s
    """,
)
def q_events_srm(spark, sf_dir):
    """Sample-ratio-mismatch guardrail for the parity-split experiment:
    χ² of the observed treatment/control event counts against the
    expected 50/50, flagged at the fixed 1-dof critical value 3.841459.
    The first check any A/B readout must pass — a biased split
    invalidates q_events_cuped/q_events_did downstream. One conditional
    count; exact-integer inputs."""
    ev = T(spark, sf_dir, "events")
    s = ev.agg(
        F.count(F.lit(1)).cast("double").alias("total"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("double")
        .alias("n_treat"),
    )
    half = F.col("total") / 2
    chi2 = (F.col("n_treat") - half) * (F.col("n_treat") - half) / half + (
        (F.col("total") - F.col("n_treat")) - half
    ) * ((F.col("total") - F.col("n_treat")) - half) / half
    return s.select(
        F.col("n_treat").cast("bigint").alias("n_treat"),
        (F.col("total") - F.col("n_treat")).cast("bigint").alias("n_ctrl"),
        r6(chi2).alias("chi2"),
        F.when(chi2 > 3.841459, "mismatch").otherwise("ok").alias("verdict"),
    )


@query(
    "q_events_segment_migration",
    oracle="""
    WITH halves AS (
        SELECT user_id,
               SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS v1,
               SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value
                        ELSE 0 END) AS v2
        FROM events GROUP BY user_id
    ),
    seg AS (
        SELECT NTILE(4) OVER (ORDER BY v1, user_id) AS seg1,
               NTILE(4) OVER (ORDER BY v2, user_id) AS seg2
        FROM halves
    )
    SELECT CAST(seg1 AS BIGINT) AS seg_before,
           CAST(seg2 AS BIGINT) AS seg_after,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM seg GROUP BY seg1, seg2
    ORDER BY seg_before, seg_after
    """,
)
def q_events_segment_migration(spark, sf_dir):
    """Segment migration matrix: users quartiled by spend in each half of
    the window (ntile with user_id tie-break — deterministic cuts), and
    the 4×4 transition counts between the two segmentations — the
    'are our whales still whales' view behind every retention deck
    (diagonal = stable, below = decaying, above = growing). One
    user-grain aggregation, two rank windows over O(users)."""
    ev = T(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    halves = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0)).alias(
            "v1"
        ),
        F.sum(
            F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0)
        ).alias("v2"),
    )
    w1 = Window.orderBy("v1", "user_id")
    w2 = Window.orderBy("v2", "user_id")
    seg = halves.select(
        F.ntile(4).over(w1).alias("seg1"),
        F.ntile(4).over(w2).alias("seg2"),
    )
    return (
        seg.groupBy(
            F.col("seg1").cast("bigint").alias("seg_before"),
            F.col("seg2").cast("bigint").alias("seg_after"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("seg_before", "seg_after")
    )
