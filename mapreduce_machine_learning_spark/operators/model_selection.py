"""Model-selection and evaluation diagnostics: sample-size learning curves
from prefix sufficient statistics, rank association on binned contingency
grids (Kendall τ-b), and a walk-forward forecast backtest.

The learning curve is the purest expression of the reference's
summation-form idea (Chu et al. NIPS'06): because OLS needs only
(n, Σx, Σy, Σxx, Σxy, Σyy), a model per nested subsample costs ONE pass —
per-bucket moments + a 16-row prefix sum — instead of refitting per
fraction. Subsample membership is md5-based (first hex digit of a row-key
digest), so both engines draw identical deterministic samples (md5 parity
verified, SURVEY §8.4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query
from mapreduce_machine_learning_spark.runtime import checkpoint as _ckpt


@query(
    "q_ml_learning_curve",
    oracle="""
    WITH keyed AS (
        SELECT SUBSTRING(md5(CAST(l_orderkey AS VARCHAR) || '-'
                             || CAST(l_linenumber AS VARCHAR)), 1, 1)
                   AS bucket,
               l_quantity AS x, l_extendedprice AS y
        FROM lineitem
    ),
    per_bucket AS (
        SELECT bucket, COUNT(*)::DOUBLE AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
        FROM keyed GROUP BY bucket
    ),
    prefix AS (
        SELECT bucket,
               SUM(n) OVER w AS n, SUM(sx) OVER w AS sx,
               SUM(sy) OVER w AS sy, SUM(sxx) OVER w AS sxx,
               SUM(sxy) OVER w AS sxy, SUM(syy) OVER w AS syy
        FROM per_bucket
        WINDOW w AS (ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT bucket, CAST(n AS BIGINT) AS cum_n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM prefix
    """,
)
def q_ml_learning_curve(spark, sf_dir):
    """OLS learning curve (y = l_extendedprice on x = l_quantity) over 16
    nested deterministic subsamples: rows land in buckets '0'..'f' by the
    first hex digit of md5(orderkey-linenumber); prefix k trains on buckets
    ≤ k. One scan computes per-bucket sufficient statistics; a 16-row
    window prefix-sum yields every model's slope and R² in closed form —
    16 models for the price of one aggregation, no refits, no second pass.
    At 100 TB the plan is identical: the learning curve is free once the
    moment aggregation (partial+final, map-side combined) has run."""
    li = T(spark, sf_dir, "lineitem").select(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            1,
        ).alias("bucket"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    per_bucket = li.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    prefix = per_bucket.select(
        "bucket",
        *[
            F.sum(c).over(w).alias(c)
            for c in ("n", "sx", "sy", "sxx", "sxy", "syy")
        ],
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return prefix.select(
        "bucket",
        n.cast("bigint").alias("cum_n"),
        r6(cov / varx).alias("slope"),
        r6(cov * cov / (varx * vary)).alias("r2"),
    )


@query(
    "q_ml_kendall_tau",
    oracle="""
    WITH cells AS (
        SELECT CAST(l_quantity AS INT) AS q,
               CAST(FLOOR(l_extendedprice / 5000.0) AS INT) AS pb,
               COUNT(*)::DOUBLE AS m
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT SUM(CASE WHEN c2.pb > c1.pb THEN c1.m * c2.m ELSE 0 END)
                   AS conc,
               SUM(CASE WHEN c2.pb < c1.pb THEN c1.m * c2.m ELSE 0 END)
                   AS disc
        FROM cells c1 JOIN cells c2 ON c2.q > c1.q
    ),
    ties AS (
        SELECT SUM(m)::DOUBLE AS n,
               SUM(m * (m - 1) / 2) AS tie_cells
        FROM cells
    ),
    tx AS (
        SELECT SUM(tq * (tq - 1) / 2) AS tie_x
        FROM (SELECT SUM(m) AS tq FROM cells GROUP BY q)
    ),
    ty AS (
        SELECT SUM(tp * (tp - 1) / 2) AS tie_y
        FROM (SELECT SUM(m) AS tp FROM cells GROUP BY pb)
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           ROUND((conc - disc)
                 / SQRT((n * (n - 1) / 2 - tie_x)
                        * (n * (n - 1) / 2 - tie_y)), 6) AS tau_b
    FROM pairs, ties, tx, ty
    """,
)
def q_ml_kendall_tau(spark, sf_dir):
    """Kendall τ-b between l_quantity and l_extendedprice binned to a
    $5000 price grid: rank association computed on the CONTINGENCY TABLE,
    not row pairs — cells are (≤50 quantities × ~25 price bins), so the
    concordant/discordant double-sum is a ~1k×1k cell join however many
    rows the fact table has (the O(n²) pair enumeration becomes O(cells²);
    the 100 TB path adds a 2-D prefix sum over cells to reach O(cells)).
    Tie corrections use the standard τ-b denominator with marginal tie
    counts. All counts are exact integers on both engines."""
    li = T(spark, sf_dir, "lineitem")
    # the contingency table is consumed five times (both cell-join sides,
    # the grand total, and both marginal tie counts) — materialize the
    # ~1k-cell frame once instead of replaying the fact groupBy per arm
    cells = (
        li.groupBy(
            F.col("l_quantity").cast("int").alias("q"),
            F.floor(F.col("l_extendedprice") / 5000.0)
            .cast("int")
            .alias("pb"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("m"))
        .transform(_ckpt)
    )
    c1 = cells.select(
        F.col("q").alias("q1"), F.col("pb").alias("pb1"), F.col("m").alias("m1")
    )
    c2 = cells.select(
        F.col("q").alias("q2"), F.col("pb").alias("pb2"), F.col("m").alias("m2")
    )
    pairs = c1.join(c2, F.col("q2") > F.col("q1")).agg(
        F.sum(
            F.when(
                F.col("pb2") > F.col("pb1"), F.col("m1") * F.col("m2")
            ).otherwise(0.0)
        ).alias("conc"),
        F.sum(
            F.when(
                F.col("pb2") < F.col("pb1"), F.col("m1") * F.col("m2")
            ).otherwise(0.0)
        ).alias("disc"),
    )
    ties = cells.agg(F.sum("m").alias("n"))
    tie_x = (
        cells.groupBy("q")
        .agg(F.sum("m").alias("tq"))
        .agg(F.sum(F.col("tq") * (F.col("tq") - 1) / 2).alias("tie_x"))
    )
    tie_y = (
        cells.groupBy("pb")
        .agg(F.sum("m").alias("tp"))
        .agg(F.sum(F.col("tp") * (F.col("tp") - 1) / 2).alias("tie_y"))
    )
    n = F.col("n")
    n0 = n * (n - 1) / 2
    return (
        pairs.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(tie_x))
        .crossJoin(F.broadcast(tie_y))
        .select(
            n.cast("bigint").alias("n"),
            F.col("conc").cast("bigint").alias("concordant"),
            F.col("disc").cast("bigint").alias("discordant"),
            r6(
                (F.col("conc") - F.col("disc"))
                / F.sqrt((n0 - F.col("tie_x")) * (n0 - F.col("tie_y")))
            ).alias("tau_b"),
        )
    )


@query(
    "q_events_forecast_eval",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*)::DOUBLE AS cnt
        FROM events GROUP BY 1, 2
    ),
    feat AS (
        SELECT event_type, day, cnt,
               LAG(cnt) OVER w AS naive,
               AVG(cnt) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                   AS ma7,
               ROW_NUMBER() OVER w AS rn
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(ABS(cnt - naive)), 6) AS mae_naive,
           ROUND(AVG(ABS(cnt - ma7)), 6) AS mae_ma7,
           CASE WHEN ROUND(AVG(ABS(cnt - ma7)), 6)
                     < ROUND(AVG(ABS(cnt - naive)), 6)
                THEN 'ma7' ELSE 'naive' END AS winner
    FROM feat WHERE rn >= 9
    GROUP BY event_type
    """,
)
def q_events_forecast_eval(spark, sf_dir):
    """Walk-forward forecast backtest on the daily event-count series, per
    event_type: yesterday's count (naive persistence) vs the trailing
    7-day mean, scored by MAE over days with a full history (row ≥ 9 in
    each series). The fact-table pass is one (type, day) count; both
    forecasts are LAG/moving-AVG windows over the tiny daily frame. The
    winner column compares ROUNDED MAEs, so the verdict is grid-stable
    across engines."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    feat = daily.select(
        "event_type",
        "cnt",
        F.lag("cnt").over(w).alias("naive"),
        F.avg("cnt").over(w.rowsBetween(-7, -1)).alias("ma7"),
        F.row_number().over(w).alias("rn"),
    )
    mae_n = r6(F.avg(F.abs(F.col("cnt") - F.col("naive"))))
    mae_m = r6(F.avg(F.abs(F.col("cnt") - F.col("ma7"))))
    return (
        feat.filter(F.col("rn") >= 9)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            mae_n.alias("mae_naive"),
            mae_m.alias("mae_ma7"),
        )
        .select(
            "event_type",
            "n_days",
            "mae_naive",
            "mae_ma7",
            F.when(F.col("mae_ma7") < F.col("mae_naive"), "ma7")
            .otherwise("naive")
            .alias("winner"),
        )
    )


@query(
    "q_ml_poisson_grad",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               COUNT(*)::DOUBLE AS y
        FROM events GROUP BY 1
    ),
    feats AS (
        SELECT y, 1.0 AS x0, EXTRACT(hour FROM h) / 24.0 AS x1 FROM hourly
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(SUM((y - 1.0) * x0), 6) AS grad0,
           ROUND(SUM((y - 1.0) * x1), 6) AS grad1,
           ROUND(0.001 * SUM((y - 1.0) * x0), 6) AS w0_step,
           ROUND(0.001 * SUM((y - 1.0) * x1), 6) AS w1_step
    FROM feats
    """,
)
def q_ml_poisson_grad(spark, sf_dir):
    """One log-likelihood gradient-ascent step of a Poisson GLM (counts
    regression — the third GLM family next to the engine's linear and
    logistic kernels): y = hourly event count, features (1, hour/24),
    start w = 0 so μ = exp(w·x) = 1 and grad_j = Σ(y−μ)x_j collapses to
    Σ(y−1)x_j; lr = 0.001. The fact-table pass is the hourly count; the
    gradient is a second aggregate over the tiny hourly frame — the exact
    iterative-driver shape of the reference's logistic GD (SURVEY §2.6),
    applied to count data."""
    ev = T(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    feats = hourly.select(
        "y", F.lit(1.0).alias("x0"), (F.hour("h") / 24.0).alias("x1")
    )
    g0 = F.sum((F.col("y") - 1.0) * F.col("x0"))
    g1 = F.sum((F.col("y") - 1.0) * F.col("x1"))
    return feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        r6(g0).alias("grad0"),
        r6(g1).alias("grad1"),
        r6(0.001 * g0).alias("w0_step"),
        r6(0.001 * g1).alias("w1_step"),
    )


@query(
    "q_ml_huber_eval",
    oracle="""
    WITH s AS (
        SELECT COUNT(*)::DOUBLE AS n, SUM(l_quantity) AS sx,
               SUM(l_extendedprice) AS sy,
               SUM(l_quantity * l_quantity) AS sxx,
               SUM(l_quantity * l_extendedprice) AS sxy
        FROM lineitem
    ),
    fit AS (
        SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS intercept
        FROM s
    ),
    resid AS (
        SELECT l_extendedprice - (fit.intercept
                                  + fit.slope * l_quantity) AS r
        FROM lineitem CROSS JOIN fit
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CASE WHEN ABS(r) <= 1000.0 THEN r * r / 2.0
                          ELSE 1000.0 * (ABS(r) - 500.0) END), 2)
               AS mean_huber_loss,
           ROUND(AVG(CASE WHEN ABS(r) > 1000.0 THEN 1.0 ELSE 0.0 END), 6)
               AS outlier_share
    FROM resid
    """,
)
def q_ml_huber_eval(spark, sf_dir):
    """Robust-loss audit of the closed-form OLS fit (y = l_extendedprice
    on l_quantity): mean Huber loss (δ = 1000 — quadratic inside, linear
    outside) and the share of residuals past δ. Pass 1 is the normal-
    equation sufficient statistics; the 1-row fit broadcasts into pass 2's
    residual scan — the same two-scan shape an iteratively-reweighted
    robust regression would loop. Loss is rounded at 2 decimals (magnitude
    ~1e7; r6 would sit inside cross-engine sum noise, SURVEY §2.1)."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
            "intercept"
        ),
    )
    resid = li.crossJoin(F.broadcast(fit)).select(
        (
            F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))
        ).alias("r")
    )
    r = F.col("r")
    huber = F.when(F.abs(r) <= 1000.0, r * r / 2.0).otherwise(
        1000.0 * (F.abs(r) - 500.0)
    )
    return resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg(huber), 2).alias("mean_huber_loss"),
        r6(F.avg(F.when(F.abs(r) > 1000.0, 1.0).otherwise(0.0))).alias(
            "outlier_share"
        ),
    )


@query(
    "q_ml_gmm_loglik",
    oracle="""
    WITH ll AS (
        SELECT COUNT(*)::DOUBLE AS n,
               SUM(LN(0.5 * EXP(-(value - 50.0) * (value - 50.0)
                                / (2.0 * 25.0 * 25.0))
                          / (25.0 * SQRT(2.0 * PI()))
                      + 0.5 * EXP(-(value - 150.0) * (value - 150.0)
                                  / (2.0 * 25.0 * 25.0))
                            / (25.0 * SQRT(2.0 * PI())))) AS loglik
        FROM events
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(loglik, 4) AS loglik,
           ROUND(-2.0 * loglik + 2.0 * 5.0, 4) AS aic,
           ROUND(-2.0 * loglik + 5.0 * LN(n), 4) AS bic
    FROM ll
    """,
)
def q_ml_gmm_loglik(spark, sf_dir):
    """Model-fit scoring for the fixed 2-component GMM of SURVEY §2.9
    (π = .5/.5, μ = 50/150, σ = 25/25) on event values: total
    log-likelihood plus AIC/BIC (k = 5 free parameters) — the convergence
    and model-selection criterion the EM driver (q_ml_gmm_estep/mstep)
    monitors each iteration, as one aggregation. Rounded at 4 decimals:
    the sum has magnitude ~n·6, where round-6 would sit inside cross-
    engine addition-order noise (SURVEY §2.1 magnitude rule)."""
    import math

    ev = T(spark, sf_dir, "events")
    norm = 25.0 * math.sqrt(2.0 * math.pi)
    x = F.col("value")
    dens = (
        0.5 * F.exp(-(x - 50.0) * (x - 50.0) / (2.0 * 25.0 * 25.0)) / norm
        + 0.5 * F.exp(-(x - 150.0) * (x - 150.0) / (2.0 * 25.0 * 25.0)) / norm
    )
    ll = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.log(dens)).alias("loglik"),
    )
    return ll.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("loglik"), 4).alias("loglik"),
        F.round(-2.0 * F.col("loglik") + 10.0, 4).alias("aic"),
        F.round(-2.0 * F.col("loglik") + 5.0 * F.log(F.col("n")), 4).alias(
            "bic"
        ),
    )


@query(
    "q_ml_cooks_distance",
    oracle="""
    WITH s AS (
        SELECT COUNT(*)::DOUBLE AS n, AVG(l_quantity) AS xbar,
               SUM(l_quantity * l_quantity)
                   - COUNT(*) * AVG(l_quantity) * AVG(l_quantity) AS sxx,
               (COUNT(*) * SUM(l_quantity * l_extendedprice)
                - SUM(l_quantity) * SUM(l_extendedprice))
               / (COUNT(*) * SUM(l_quantity * l_quantity)
                  - SUM(l_quantity) * SUM(l_quantity)) AS slope,
               AVG(l_extendedprice) AS ybar,
               SUM(l_extendedprice * l_extendedprice)
                   - COUNT(*) * AVG(l_extendedprice) * AVG(l_extendedprice)
                   AS syy,
               SUM(l_quantity * l_extendedprice)
                   - COUNT(*) * AVG(l_quantity) * AVG(l_extendedprice)
                   AS sxy
        FROM lineitem
    ),
    fit AS (
        SELECT n, xbar, sxx, slope, ybar - slope * xbar AS intercept,
               (syy - slope * sxy) / (n - 2) AS s2
        FROM s
    ),
    pts AS (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice - (fit.intercept
                                  + fit.slope * l_quantity) AS r,
               1.0 / fit.n + (l_quantity - fit.xbar)
                             * (l_quantity - fit.xbar) / fit.sxx AS h,
               fit.s2 AS s2
        FROM lineitem CROSS JOIN fit
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(r * r * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
               AS cooks_d
    FROM pts
    ORDER BY ROUND(r * r * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
             DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def q_ml_cooks_distance(spark, sf_dir):
    """Influence diagnostics for the simple OLS fit: the 10 most
    influential lineitem rows by Cook's distance, Dᵢ = rᵢ²hᵢ /
    (p·s²(1−hᵢ)²) with leverage hᵢ = 1/n + (xᵢ−x̄)²/Sxx and p = 2.
    Completes the regression-diagnostics family (Durbin–Watson, VIF,
    slope t-test) with the per-point view: pass 1 is the sufficient-
    statistics aggregate, whose 1-row fit broadcasts into pass 2's
    closed-form per-row leverage — no hat matrix materialized. Selection
    orders by the ROUNDED distance with the (orderkey, linenumber)
    unique tie-break."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        F.avg("y").alias("ybar"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_raw"),
        F.sum(F.col("y") * F.col("y")).alias("syy_raw"),
    )
    n, xbar, ybar = F.col("n"), F.col("xbar"), F.col("ybar")
    sxx = F.col("sxx_raw") - n * xbar * xbar
    sxy = F.col("sxy_raw") - n * xbar * ybar
    syy = F.col("syy_raw") - n * ybar * ybar
    slope = (n * F.col("sxy_raw") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx_raw") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        "n",
        "xbar",
        sxx.alias("sxx"),
        slope.alias("slope"),
        (ybar - slope * xbar).alias("intercept"),
        ((syy - slope * sxy) / (n - 2)).alias("s2"),
    )
    pts = li.crossJoin(F.broadcast(fit)).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))
        ).alias("r"),
        (
            1.0 / F.col("n")
            + (F.col("x") - F.col("xbar"))
            * (F.col("x") - F.col("xbar"))
            / F.col("sxx")
        ).alias("h"),
        "s2",
    )
    d = (
        F.col("r")
        * F.col("r")
        * F.col("h")
        / (2.0 * F.col("s2") * (1.0 - F.col("h")) * (1.0 - F.col("h")))
    )
    return (
        pts.select(
            "l_orderkey", "l_linenumber", r6(d).alias("cooks_d")
        )
        .orderBy(F.desc("cooks_d"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@query(
    "q_ml_grubbs",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(GREATEST(MAX(value) - AVG(value),
                          AVG(value) - MIN(value))
                 / STDDEV_SAMP(value), 6) AS g_stat,
           CASE WHEN GREATEST(MAX(value) - AVG(value),
                              AVG(value) - MIN(value))
                     / STDDEV_SAMP(value) > 4.0
                THEN 'outlier' ELSE 'clean' END AS verdict
    FROM events
    """,
)
def q_ml_grubbs(spark, sf_dir):
    """Grubbs' extreme-outlier screen on event values: G = max|x − x̄|/s
    from ONE aggregation (max deviation = greatest of the two extremes
    against the mean — no second pass), flagged at the fixed large-n
    critical value 4.0. The cheapest of the anomaly family: where
    q_events_anomaly scans per-bucket z-scores, this is the single-scalar
    tripwire a pipeline runs on every batch."""
    ev = T(spark, sf_dir, "events")
    g = F.greatest(
        F.max("value") - F.avg("value"), F.avg("value") - F.min("value")
    ) / F.stddev_samp("value")
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r6(g).alias("g_stat"),
        F.when(g > 4.0, "outlier").otherwise("clean").alias("verdict"),
    )


@query(
    "q_ml_ratio_ci",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, SUM(o_totalprice) AS x, COUNT(*)::DOUBLE AS y
        FROM orders GROUP BY o_custkey
    ),
    s AS (
        SELECT COUNT(*)::DOUBLE AS n,
               SUM(x) / SUM(y) AS r,
               AVG(y) AS ybar,
               VAR_SAMP(x) AS vx, VAR_SAMP(y) AS vy,
               COVAR_SAMP(x, y) AS cxy
        FROM per_cust
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(r, 6) AS ratio,
           ROUND(SQRT((vx - 2 * r * cxy + r * r * vy)
                      / (n * ybar * ybar)), 6) AS se,
           ROUND(r - 1.959964 * SQRT((vx - 2 * r * cxy + r * r * vy)
                                     / (n * ybar * ybar)), 6) AS ci_lo,
           ROUND(r + 1.959964 * SQRT((vx - 2 * r * cxy + r * r * vy)
                                     / (n * ybar * ybar)), 6) AS ci_hi
    FROM s
    """,
)
def q_ml_ratio_ci(spark, sf_dir):
    """Delta-method confidence interval for a RATIO metric (revenue per
    order, clustered by customer): R̂ = Σx/Σy over per-customer totals,
    Var(R̂) ≈ (σ²ₓ − 2R̂σₓᵧ + R̂²σ²ᵧ)/(n ȳ²) — the linearization every
    experimentation platform uses because ratio metrics violate the
    iid-row assumption a naive t-test makes (the unit of randomization
    is the customer, not the order). One customer-grain aggregation, one
    1-row moment aggregate, closed-form CI with the z quantile as a
    fixed literal."""
    orders = T(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"),
    )
    s = per_cust.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("x") / F.sum("y")).alias("r"),
        F.avg("y").alias("ybar"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r, n, ybar = F.col("r"), F.col("n"), F.col("ybar")
    se = F.sqrt(
        (F.col("vx") - 2 * r * F.col("cxy") + r * r * F.col("vy"))
        / (n * ybar * ybar)
    )
    return s.select(
        n.cast("bigint").alias("n_customers"),
        r6(r).alias("ratio"),
        r6(se).alias("se"),
        r6(r - 1.959964 * se).alias("ci_lo"),
        r6(r + 1.959964 * se).alias("ci_hi"),
    )


@query(
    "q_ml_conformal",
    oracle="""
    WITH split AS (
        SELECT l_quantity AS x, l_extendedprice AS y,
               CASE WHEN SUBSTRING(md5(CAST(l_orderkey AS VARCHAR) || '-'
                                       || CAST(l_linenumber AS VARCHAR)),
                                   1, 1) < '8'
                    THEN 'train' ELSE 'calib' END AS part
        FROM lineitem
    ),
    fit AS (
        SELECT (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
               / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS slope,
               (SUM(y) - (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                         / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                         * SUM(x)) / COUNT(*) AS intercept
        FROM split WHERE part = 'train'
    ),
    calib AS (
        SELECT ABS(s.y - (fit.intercept + fit.slope * s.x)) AS ar
        FROM split s CROSS JOIN fit WHERE s.part = 'calib'
    ),
    cum AS (
        SELECT ar,
               SUM(COUNT(*)) OVER (ORDER BY ar
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cw,
               SUM(COUNT(*)) OVER () AS n
        FROM calib GROUP BY ar
    ),
    qhat AS (
        SELECT MIN(ar) AS q, MAX(n) AS n_calib
        FROM cum WHERE cw >= 0.9 * n
    )
    SELECT CAST(qhat.n_calib AS BIGINT) AS n_calib,
           ROUND(qhat.q, 4) AS q_hat,
           ROUND((SELECT AVG(CASE WHEN ar <= qhat.q THEN 1.0 ELSE 0 END)
                  FROM calib), 6) AS coverage_calib
    FROM qhat
    """,
)
def q_ml_conformal(spark, sf_dir):
    """Split-conformal prediction interval for the OLS regressor: fit on
    the md5-half 'train' split (deterministic row digest — both engines
    draw the same split, §2.9 discipline), take the discrete 90th
    percentile q̂ of absolute calibration residuals, so ŷ ± q̂ covers
    ≥ 90% of calibration points by construction (the reported
    coverage_calib verifies the quantile pick). Distribution-free
    uncertainty from two aggregation passes and one prefix scan — the
    modern answer to 'what interval do I put on this prediction' without
    normality assumptions. q̂ is rounded at 4 (residual magnitude ~1e4,
    tiny slope noise shifts every residual by ~1e-9).

    Coverage is read off the SAME cumulative histogram that picks q̂
    (optimization r13): cw at the q̂ row is by definition the count of
    calibration points with ar ≤ q̂, so coverage_calib = min(cw)/n over
    the qualifying rows — a ratio of the same exact integers the old
    second pass produced (AVG of 0/1 indicators = k exact ones summed,
    divided by the same n; both reduce to the double division k/n).
    That deletes the per-row residual checkpoint (the histogram became
    calib's only consumer) and the whole coverage re-scan: two fact
    passes total — train stats, calib histogram — and scalar math
    after (guide §2.3: the answer was already in the aggregate)."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
        F.when(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                1,
            )
            < "8",
            "train",
        )
        .otherwise("calib")
        .alias("part"),
    )
    tr = li.filter(F.col("part") == "train")
    s = tr.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )
    # single-consumer calib stream: the histogram below is the only thing
    # derived from the per-row residuals now, so nothing is checkpointed —
    # coverage comes from the histogram's own cumulative weights
    by_r = (
        li.filter(F.col("part") == "calib")
        .crossJoin(F.broadcast(fit))
        .select(
            F.abs(
                F.col("y")
                - (F.col("intercept") + F.col("slope") * F.col("x"))
            ).alias("ar")
        )
        .groupBy("ar")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = Window.orderBy("ar").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = by_r.select(
        "ar",
        F.sum("cnt").over(w_cum).alias("cw"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    # the min-ar qualifying row IS q̂, and cw is increasing in ar, so
    # min(cw) over the qualifying rows = |{ar ≤ q̂}| — coverage for free
    return cum.filter(F.col("cw") >= 0.9 * F.col("n")).agg(
        F.max("n").cast("bigint").alias("n_calib"),
        F.round(F.min("ar"), 4).alias("q_hat"),
        r6(F.min("cw") / F.max("n")).alias("coverage_calib"),
    )


@query(
    "q_ml_jarque_bera",
    oracle="""
    WITH s AS (
        SELECT COUNT(*)::DOUBLE AS n,
               (COUNT(*) * SUM(l_quantity * l_extendedprice)
                - SUM(l_quantity) * SUM(l_extendedprice))
               / (COUNT(*) * SUM(l_quantity * l_quantity)
                  - SUM(l_quantity) * SUM(l_quantity)) AS slope,
               AVG(l_extendedprice) AS ybar, AVG(l_quantity) AS xbar
        FROM lineitem
    ),
    resid AS (
        SELECT l_extendedprice
               - (s.ybar - s.slope * s.xbar + s.slope * l_quantity) AS r
        FROM lineitem CROSS JOIN s
    ),
    mom AS (
        SELECT COUNT(*)::DOUBLE AS n, AVG(r) AS mu,
               SUM(r * r) / COUNT(*) AS m2r,
               SUM(r * r * r) / COUNT(*) AS m3r,
               SUM(r * r * r * r) / COUNT(*) AS m4r
        FROM resid
    ),
    c AS (
        SELECT n,
               m2r - mu * mu AS m2,
               m3r - 3 * mu * (m2r - mu * mu) - mu * mu * mu AS m3,
               m4r - 4 * mu * m3r + 6 * mu * mu * m2r
                   - 3 * mu * mu * mu * mu AS m4
        FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(m3 / POW(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis,
           ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
                            + POW(m4 / (m2 * m2) - 3.0, 2) / 4.0), 2)
               AS jb_stat
    FROM c
    """,
)
def q_ml_jarque_bera(spark, sf_dir):
    """Jarque–Bera normality test on the OLS residuals (y =
    l_extendedprice on l_quantity): skewness and excess kurtosis from
    one raw-moment pass (Σr..Σr⁴ with the broadcast fit, central moments
    by the binomial expansion), JB = n/6(S² + K²/4). The diagnostic that
    says whether the t/F machinery (q_ml_slope_inference, q_ml_anova)
    can be trusted on these errors — completing the residual-diagnostic
    family (Durbin–Watson for autocorrelation, Cook's D for influence,
    this for distribution shape). JB rounded at 2 (it grows with n)."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.avg("x").alias("xbar"),
        F.avg("y").alias("ybar"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = s.select(
        slope.alias("slope"), "xbar", "ybar"
    )
    resid = li.crossJoin(F.broadcast(fit)).select(
        (
            F.col("y")
            - (
                F.col("ybar")
                - F.col("slope") * F.col("xbar")
                + F.col("slope") * F.col("x")
            )
        ).alias("r")
    )
    r = F.col("r")
    mom = resid.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("r").alias("mu"),
        (F.sum(r * r) / F.count(F.lit(1))).alias("m2r"),
        (F.sum(r * r * r) / F.count(F.lit(1))).alias("m3r"),
        (F.sum(r * r * r * r) / F.count(F.lit(1))).alias("m4r"),
    )
    mu = F.col("mu")
    m2 = F.col("m2r") - mu * mu
    m3 = F.col("m3r") - 3 * mu * (F.col("m2r") - mu * mu) - mu * mu * mu
    m4 = (
        F.col("m4r")
        - 4 * mu * F.col("m3r")
        + 6 * mu * mu * F.col("m2r")
        - 3 * mu * mu * mu * mu
    )
    skew = m3 / F.pow(m2, 1.5)
    exk = m4 / (m2 * m2) - 3.0
    return mom.select(
        F.col("n").cast("bigint").alias("n"),
        r6(skew).alias("skewness"),
        r6(exk).alias("excess_kurtosis"),
        F.round(
            F.col("n") / 6.0 * (F.pow(skew, 2) + F.pow(exk, 2) / 4.0), 2
        ).alias("jb_stat"),
    )


@query(
    "q_ml_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*)::DOUBLE AS c
        FROM events GROUP BY 1
    ),
    signed AS (
        SELECT day,
               CASE WHEN c > (SELECT AVG(c) FROM daily) THEN 1
                    ELSE 0 END AS s
        FROM daily
    ),
    runs AS (
        SELECT s,
               CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                         OR s <> LAG(s) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS new_run
        FROM signed
    ),
    agg AS (
        SELECT SUM(new_run)::DOUBLE AS r,
               SUM(s)::DOUBLE AS n1,
               SUM(1 - s)::DOUBLE AS n2
        FROM runs
    )
    SELECT CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS n_runs,
           ROUND((r - (2 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))),
                 6) AS z_stat
    FROM agg
    """,
)
def q_ml_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test for randomness of the daily event-count
    series: days flagged above/below the mean, consecutive same-sign
    days merged into runs, z-scored against the null expectation
    2n₁n₂/(n₁+n₂)+1. Too FEW runs = trend/regime persistence; too MANY =
    oscillation — the nonparametric companion to q_ml_durbin_watson that
    needs no residual model at all. One LAG pass over the 30-row daily
    frame."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    wall = Window.partitionBy()
    signed = daily.select(
        "day",
        F.when(F.col("c") > F.avg("c").over(wall), 1).otherwise(0).alias("s"),
    )
    w = Window.orderBy("day")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.col("s") != F.lag("s").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").cast("double").alias("r"),
        F.sum("s").cast("double").alias("n1"),
        F.sum(1 - F.col("s")).cast("double").alias("n2"),
    )
    rr, n1, n2 = F.col("r"), F.col("n1"), F.col("n2")
    e = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2
        * n1
        * n2
        * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    return agg.select(
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        rr.cast("bigint").alias("n_runs"),
        r6((rr - e) / F.sqrt(var)).alias("z_stat"),
    )


@query(
    "q_ml_var_merge",
    oracle="""
    WITH bucketed AS (
        SELECT SUBSTRING(md5(CAST(event_id AS VARCHAR)), 1, 1) AS bucket,
               value
        FROM events
    ),
    per_bucket AS (
        SELECT bucket, COUNT(*)::DOUBLE AS n, AVG(value) AS m,
               SUM(value * value) - COUNT(*) * AVG(value) * AVG(value)
                   AS m2
        FROM bucketed GROUP BY bucket
    ),
    merged AS (
        SELECT SUM(n) AS nn,
               SUM(n * m) / SUM(n) AS grand,
               SUM(m2) AS sum_m2,
               SUM(n * m * m) AS sum_nm2
        FROM per_bucket
    ),
    direct AS (SELECT VAR_SAMP(value) AS v FROM events)
    SELECT CAST(merged.nn AS BIGINT) AS n,
           CAST((SELECT COUNT(*) FROM per_bucket) AS BIGINT) AS n_buckets,
           ROUND((merged.sum_m2 + merged.sum_nm2
                  - merged.nn * merged.grand * merged.grand)
                 / (merged.nn - 1), 6) AS var_merged,
           ROUND(direct.v, 6) AS var_direct
    FROM merged, direct
    """,
)
def q_ml_var_merge(spark, sf_dir):
    """Parallel-variance mergeability check (Chan et al.): per-partition
    sufficient statistics (n, mean, M2) over 16 md5 buckets, merged with
    the exact combine rule M2 = ΣM2ᵢ + Σnᵢ(meanᵢ − grand)², must equal
    the direct single-pass VAR_SAMP to round-6. This identity is the
    foundation the whole summation-form family stands on — it is WHY
    partial+final aggregation, treeAggregate, and every sketch merge in
    this engine are exact for second moments. Declaring it as a query
    keeps the property continuously verified against an independent
    engine."""
    ev = T(spark, sf_dir, "events")
    bucketed = ev.select(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).alias(
            "bucket"
        ),
        "value",
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        (
            F.sum(F.col("value") * F.col("value"))
            - F.count(F.lit(1)) * F.avg("value") * F.avg("value")
        ).alias("m2"),
    )
    merged = per_bucket.agg(
        F.sum("n").alias("nn"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"),
        F.sum("m2").alias("sum_m2"),
        F.sum(F.col("n") * F.col("m") * F.col("m")).alias("sum_nm2"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    direct = ev.agg(F.var_samp("value").alias("v"))
    var_merged = (
        F.col("sum_m2")
        + F.col("sum_nm2")
        - F.col("nn") * F.col("grand") * F.col("grand")
    ) / (F.col("nn") - 1)
    return merged.crossJoin(F.broadcast(direct)).select(
        F.col("nn").cast("bigint").alias("n"),
        "n_buckets",
        r6(var_merged).alias("var_merged"),
        r6(F.col("v")).alias("var_direct"),
    )


@query(
    "q_ml_ccc",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*)::DOUBLE AS c
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT c AS y, LAG(c) OVER (ORDER BY day) AS x FROM daily
    ),
    m AS (
        SELECT COUNT(*)::DOUBLE AS n, AVG(x) AS mx, AVG(y) AS my,
               VAR_POP(x) AS vx, VAR_POP(y) AS vy,
               COVAR_POP(x, y) AS cxy
        FROM pairs WHERE x IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(cxy / SQRT(vx * vy), 6) AS pearson_r,
           ROUND(2 * cxy / (vx + vy + (mx - my) * (mx - my)), 6) AS ccc
    FROM m
    """,
)
def q_ml_ccc(spark, sf_dir):
    """Lin's concordance correlation between the naive persistence
    forecast (yesterday's count) and the actual daily count: CCC =
    2σxy/(σx²+σy²+(μx−μy)²) — agreement with the 45° line, not just
    linear association, so a biased or rescaled forecast is penalized
    where Pearson r (reported beside it) would not be. Population
    moments over the paired daily frame."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    w = Window.orderBy("day")
    pairs = daily.select(
        F.col("c").alias("y"), F.lag("c").over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    m = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
        F.covar_pop("x", "y").alias("cxy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_days"),
        r6(F.col("cxy") / F.sqrt(F.col("vx") * F.col("vy"))).alias(
            "pearson_r"
        ),
        r6(
            2 * F.col("cxy")
            / (
                F.col("vx")
                + F.col("vy")
                + (F.col("mx") - F.col("my")) * (F.col("mx") - F.col("my"))
            )
        ).alias("ccc"),
    )


@query(
    "q_ml_pinball",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*)::DOUBLE AS cnt
        FROM events GROUP BY 1, 2
    ),
    feat AS (
        SELECT cnt,
               AVG(cnt) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                   AS ma7,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS rn
        FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(AVG(CASE WHEN cnt >= ma7 THEN 0.5 * (cnt - ma7)
                          ELSE 0.5 * (ma7 - cnt) END), 6) AS pinball_p50,
           ROUND(AVG(CASE WHEN cnt >= ma7 THEN 0.9 * (cnt - ma7)
                          ELSE 0.1 * (ma7 - cnt) END), 6) AS pinball_p90
    FROM feat WHERE rn >= 9
    """,
)
def q_ml_pinball(spark, sf_dir):
    """Pinball (quantile) loss of the trailing-7-day-mean forecast at
    τ = 0.5 and τ = 0.9: the asymmetric loss that scores a forecast AS A
    QUANTILE — p90 pinball penalizes under-forecasting 9× more than
    over-forecasting, which is how capacity forecasts should be scored
    (q_events_forecast_eval's MAE treats both errors alike). Same daily
    frame and windows as the MAE backtest, one extra CASE."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("day")
    feat = daily.select(
        "cnt",
        F.avg("cnt").over(w.rowsBetween(-7, -1)).alias("ma7"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") >= 9)
    err = F.col("cnt") - F.col("ma7")

    def pinball(tau):
        return F.avg(
            F.when(err >= 0, tau * err).otherwise((tau - 1) * err)
        )

    return feat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        r6(pinball(0.5)).alias("pinball_p50"),
        r6(pinball(0.9)).alias("pinball_p90"),
    )
