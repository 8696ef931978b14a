"""Classical two-sample statistical tests and rank statistics, in one-pass
aggregate form (SURVEY.md §2.6 extension — the same summation-form discipline
as the reference's ML kernels: scan → keyed partial aggregation → tiny
driver-side arithmetic, per Chu et al. NIPS'06).

Scale notes (100 TB): every query below reduces to (a) one hash aggregation
over the fact table keyed by the test variable's DISTINCT VALUE, then (b)
window/aggregate arithmetic over the distinct-value frame, which is orders of
magnitude smaller than the data (2-decimal measures → ≤ ~50k distinct
values regardless of row count). The single-partition window over that frame
is deliberate: it runs on O(|distinct values|), never O(rows). If the value
domain were unbounded, the scale path is range-partitioned ranking (compute
per-partition counts, prefix-sum partition offsets on the driver — the
classic distributed-rank two-pass).

Determinism: ranks are AVERAGE ranks computed arithmetically from counts
(cum − cnt + (cnt+1)/2), not engine rank() functions, so tie semantics are
identical on both engines by construction. All outputs are O(1)-magnitude
statistics rounded to 6 places (SURVEY §2.1 rule 1).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query


def _two_sample(spark, sf_dir, a="purchase", b="click"):
    """Shared distinct-value frame for the two-sample tests: one row per
    distinct `value` among events of the two types, with per-group counts."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_type").isin(a, b))
    return ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("event_type") == a, 1).otherwise(0)).alias("cnt_a"),
    )


@query(
    "q_ml_welch_ttest",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
               AS n_click,
           ROUND(AVG(value) FILTER (WHERE event_type = 'purchase'), 6)
               AS mean_purchase,
           ROUND(AVG(value) FILTER (WHERE event_type = 'click'), 6)
               AS mean_click,
           ROUND((AVG(value) FILTER (WHERE event_type = 'purchase')
                  - AVG(value) FILTER (WHERE event_type = 'click'))
                 / SQRT(VAR_SAMP(value) FILTER (WHERE event_type = 'purchase')
                            / COUNT(*) FILTER (WHERE event_type = 'purchase')
                        + VAR_SAMP(value) FILTER (WHERE event_type = 'click')
                            / COUNT(*) FILTER (WHERE event_type = 'click')),
                 6) AS t_stat,
           ROUND(POW(VAR_SAMP(value) FILTER (WHERE event_type = 'purchase')
                         / COUNT(*) FILTER (WHERE event_type = 'purchase')
                     + VAR_SAMP(value) FILTER (WHERE event_type = 'click')
                         / COUNT(*) FILTER (WHERE event_type = 'click'), 2)
                 / (POW(VAR_SAMP(value) FILTER (WHERE event_type = 'purchase')
                            / COUNT(*) FILTER (WHERE event_type = 'purchase'),
                        2)
                        / (COUNT(*) FILTER (WHERE event_type = 'purchase') - 1)
                    + POW(VAR_SAMP(value) FILTER (WHERE event_type = 'click')
                              / COUNT(*) FILTER (WHERE event_type = 'click'),
                          2)
                        / (COUNT(*) FILTER (WHERE event_type = 'click') - 1)),
                 6) AS df_welch
    FROM events
    WHERE event_type IN ('purchase', 'click')
    """,
)
def q_ml_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test of `value` between purchase and click
    events: per-group n/mean/var_samp in ONE conditional-aggregation pass
    (no shuffle beyond the final 1-row agg — partial aggregation does all
    the work map-side), then the t statistic and Welch–Satterthwaite
    degrees of freedom as driver-free column arithmetic."""
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    p = F.when(F.col("event_type") == "purchase", F.col("value"))
    c = F.when(F.col("event_type") == "click", F.col("value"))
    agg = ev.agg(
        F.count(p).alias("n1"),
        F.count(c).alias("n2"),
        F.avg(p).alias("m1"),
        F.avg(c).alias("m2"),
        F.var_samp(p).alias("v1"),
        F.var_samp(c).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    df_w = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
        r6("m1").alias("mean_purchase"),
        r6("m2").alias("mean_click"),
        r6((F.col("m1") - F.col("m2")) / F.sqrt(se2)).alias("t_stat"),
        r6(df_w).alias("df_welch"),
    )


@query(
    "q_ml_mannwhitney",
    oracle="""
    WITH vals AS (
        SELECT value, COUNT(*) AS cnt,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS cnt_a
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY value
    ),
    ranked AS (
        SELECT cnt, cnt_a,
               SUM(cnt) OVER (ORDER BY value
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
               (cnt * cnt * cnt - cnt)::DOUBLE AS tie3
        FROM vals
    ),
    s AS (
        SELECT CAST(SUM(cnt_a) AS BIGINT) AS n1,
               CAST(SUM(cnt - cnt_a) AS BIGINT) AS n2,
               SUM(cnt_a * (cum - cnt + (cnt + 1) / 2.0)) AS r1,
               SUM(tie3) AS tie_term
        FROM ranked
    )
    SELECT n1, n2,
           ROUND(r1 - n1 * (n1 + 1) / 2.0, 6) AS u_stat,
           ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / SQRT(n1 * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - tie_term / ((n1 + n2)::DOUBLE
                                         * (n1 + n2 - 1)))),
                 6) AS z_score
    FROM s
    """,
)
def q_ml_mannwhitney(spark, sf_dir):
    """Mann–Whitney U test (purchase vs click `value`), tie-corrected.
    Average ranks come from the distinct-value frame: cum − cnt + (cnt+1)/2
    gives every member of a tie group its average rank without any engine
    rank() call, so both engines agree by arithmetic identity. The window
    runs over distinct values only (2-decimal domain → bounded), never the
    raw rows; the normal-approximation z uses the standard tie-corrected
    variance n1·n2/12·((n+1) − Σ(t³−t)/(n(n−1)))."""
    vals = _two_sample(spark, sf_dir)
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    ranked = vals.select(
        "cnt",
        "cnt_a",
        F.sum("cnt").over(w).alias("cum"),
        (F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("double")
        .alias("tie3"),
    )
    s = ranked.agg(
        F.sum("cnt_a").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("bigint").alias("n2"),
        F.sum(
            F.col("cnt_a")
            * (F.col("cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0)
        ).alias("r1"),
        F.sum("tie3").alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    sigma2 = (
        n1 * n2 / 12.0
        * ((n + 1) - F.col("tie_term") / (n.cast("double") * (n - 1)))
    )
    return s.select(
        "n1",
        "n2",
        r6(u1).alias("u_stat"),
        r6((u1 - n1 * n2 / 2.0) / F.sqrt(sigma2)).alias("z_score"),
    )


@query(
    "q_ml_ks_test",
    oracle="""
    WITH vals AS (
        SELECT value, COUNT(*) AS cnt,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS cnt_a
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY value
    ),
    tot AS (
        SELECT SUM(cnt_a)::DOUBLE AS n1, SUM(cnt - cnt_a)::DOUBLE AS n2
        FROM vals
    ),
    ecdf AS (
        SELECT SUM(cnt_a) OVER (ORDER BY value
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) / tot.n1 AS f1,
               SUM(cnt - cnt_a) OVER (ORDER BY value
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) / tot.n2 AS f2
        FROM vals, tot
    )
    SELECT CAST((SELECT n1 FROM tot) AS BIGINT) AS n_purchase,
           CAST((SELECT n2 FROM tot) AS BIGINT) AS n_click,
           ROUND(MAX(ABS(f1 - f2)), 6) AS ks_d
    FROM ecdf
    """,
)
def q_ml_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov D (purchase vs click `value`): both
    empirical CDFs evaluated on the shared distinct-value grid via running
    sums, D = max|F1 − F2|. The supremum over the pooled sample is exact —
    evaluating only at observed points loses nothing because ECDFs are step
    functions jumping at those points."""
    vals = _two_sample(spark, sf_dir)
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = vals.agg(
        F.sum("cnt_a").cast("double").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("double").alias("n2"),
    )
    ecdf = vals.crossJoin(F.broadcast(tot)).select(
        (F.sum("cnt_a").over(w) / F.col("n1")).alias("f1"),
        (F.sum(F.col("cnt") - F.col("cnt_a")).over(w) / F.col("n2")).alias(
            "f2"
        ),
        "n1",
        "n2",
    )
    return ecdf.agg(
        F.max(F.col("n1").cast("bigint")).alias("n_purchase"),
        F.max(F.col("n2").cast("bigint")).alias("n_click"),
        r6(F.max(F.abs(F.col("f1") - F.col("f2")))).alias("ks_d"),
    )


@query(
    "q_ml_spearman",
    oracle="""
    WITH rx AS (
        SELECT l_quantity AS v,
               SUM(COUNT(*)) OVER (ORDER BY l_quantity
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                   - COUNT(*) + (COUNT(*) + 1) / 2.0 AS avg_rank
        FROM lineitem GROUP BY l_quantity
    ),
    ry AS (
        SELECT l_extendedprice AS v,
               SUM(COUNT(*)) OVER (ORDER BY l_extendedprice
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                   - COUNT(*) + (COUNT(*) + 1) / 2.0 AS avg_rank
        FROM lineitem GROUP BY l_extendedprice
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CORR(rx.avg_rank, ry.avg_rank), 6) AS spearman_rho
    FROM lineitem l
    JOIN rx ON l.l_quantity = rx.v
    JOIN ry ON l.l_extendedprice = ry.v
    """,
)
def q_ml_spearman(spark, sf_dir):
    """Spearman rank correlation between l_quantity and l_extendedprice:
    average ranks per distinct value (arithmetic tie rule as in
    q_ml_mannwhitney), Pearson CORR over the per-row rank pairs — computed
    from sufficient statistics, never by materializing the pairs. The
    quantity rank (≤50 distinct ints) is a broadcast map; ONE
    groupBy(l_extendedprice) then carries, per distinct price, the row
    count plus Σrank_x and Σrank_x² of its rows — the same exchange the
    price-rank window needs (r14; previously the fact table was shuffled
    by price a second time for a rank join and a 600k-row CORR pass ran
    on the join output). rank_y comes off the window; CORR's five moment
    sums are then exact group algebra: Σxy = Σ_p rank_y(p)·Σrank_x(p),
    Σy = Σ cnt·rank_y, Σy² = Σ cnt·rank_y², Σx/Σx² pass through.
    FP margin (re-check when fixture SFs change): the raw-moment
    covariance cancellation leaves cross-engine deltas ≤1.5e-14 vs the
    DuckDB oracle while the unrounded rho sits ≥2.4e-7 from the nearest
    round-6 boundary at sf0.001/0.01/0.1 — a ≥2.8e7× margin."""
    li = T(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    w = Window.orderBy("l_quantity").rowsBetween(Window.unboundedPreceding, 0)
    g = li.groupBy("l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    rx = g.select(
        F.col("l_quantity").alias("v"),
        (
            F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("rank_x"),
    )
    gp = (
        li.join(F.broadcast(rx), li.l_quantity == rx.v)
        .groupBy("l_extendedprice")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("rank_x").alias("s_rx"),
            F.sum(F.col("rank_x") * F.col("rank_x")).alias("s_rx2"),
        )
    )
    wp = Window.orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = gp.select(
        "cnt",
        "s_rx",
        "s_rx2",
        (
            F.sum("cnt").over(wp) - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("rank_y"),
    )
    stats = ranked.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("s_rx").alias("sx"),
        F.sum("s_rx2").alias("sxx_r"),
        F.sum(F.col("cnt") * F.col("rank_y")).alias("sy"),
        F.sum(F.col("cnt") * F.col("rank_y") * F.col("rank_y")).alias("syy_r"),
        F.sum(F.col("rank_y") * F.col("s_rx")).alias("sxy_r"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy_r") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx_r") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy_r") - F.col("sy") * F.col("sy") / n
    return stats.select("n", r6(cov / F.sqrt(vx * vy)).alias("spearman_rho"))


@query(
    "q_events_benford",
    oracle="""
    WITH digits AS (
        SELECT SUBSTRING(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS first_digit
        FROM events WHERE value > 0
    ),
    counted AS (
        SELECT first_digit, COUNT(*) AS n,
               SUM(COUNT(*)) OVER () AS total
        FROM digits GROUP BY first_digit
    )
    SELECT first_digit,
           CAST(n AS BIGINT) AS n,
           ROUND(n / total::DOUBLE, 6) AS observed_p,
           ROUND(LOG10(1.0 + 1.0 / CAST(first_digit AS INT)), 6)
               AS benford_p
    FROM counted
    """,
)
def q_events_benford(spark, sf_dir):
    """Benford's-law first-significant-digit audit of event values. The
    digit is extracted ARITHMETICALLY from exact integer cents
    (round(value·100) → bigint → leading decimal digit via string), not
    via floor(log10(x)) — values sit on a 2-decimal grid, and libm log10
    can land 1 ulp below an integer at exact powers of 10, flipping the
    digit on one engine only. Integer→string is exact on both engines.
    Output: per-digit count, observed frequency, and the Benford
    expectation log10(1+1/d)."""
    ev = T(spark, sf_dir, "events").filter(F.col("value") > 0)
    digits = ev.select(
        F.substring(
            F.round(F.col("value") * 100, 0).cast("bigint").cast("string"),
            1,
            1,
        ).alias("first_digit")
    )
    counted = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy()
    return counted.select(
        "first_digit",
        F.col("n").cast("bigint").alias("n"),
        r6(F.col("n") / F.sum("n").over(w).cast("double")).alias(
            "observed_p"
        ),
        r6(
            F.log10(1.0 + 1.0 / F.col("first_digit").cast("int"))
        ).alias("benford_p"),
    )


@query(
    "q_events_kaplan_meier",
    oracle="""
    WITH horizon AS (
        SELECT MAX(ts) - INTERVAL 6 HOUR AS cutoff FROM events
    ),
    users AS (
        SELECT user_id,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
               CASE WHEN MAX(ts) < (SELECT cutoff FROM horizon)
                    THEN 1 ELSE 0 END AS is_death
        FROM events GROUP BY user_id
    ),
    by_dur AS (
        SELECT dur_us, SUM(is_death) AS deaths, COUNT(*) AS m
        FROM users GROUP BY dur_us
    ),
    risk AS (
        SELECT dur_us, deaths,
               SUM(m) OVER (ORDER BY dur_us DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS at_risk
        FROM by_dur
    ),
    km AS (
        SELECT dur_us, deaths, at_risk,
               EXP(SUM(LN(1.0 - deaths / at_risk::DOUBLE))
                   OVER (ORDER BY dur_us
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)) AS s
        FROM risk
    )
    SELECT ROUND(dur_us / 86400000000.0, 6) AS dur_days,
           CAST(deaths AS BIGINT) AS deaths,
           CAST(at_risk AS BIGINT) AS at_risk,
           ROUND(s, 6) AS survival
    FROM km
    WHERE deaths > 0
    ORDER BY dur_us
    LIMIT 30
    """,
)
def q_events_kaplan_meier(spark, sf_dir):
    """Kaplan–Meier survival curve of user lifetime (seconds between first
    and last event). A user is an observed churn ("death") if their last
    event precedes the global horizon MAX(ts) − 6 hours (the data spans
    30 days with near-continuous user activity, so a 6-hour quiet tail is
    the churn signal); later users are
    right-censored. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) with the at-risk count nᵢ a
    REVERSE running sum over the distinct-duration frame and the product
    realized as exp(Σ ln) — a prefix-sum, so the whole estimator is two
    windows over O(distinct durations) rows after one per-user aggregate.
    First 30 death times reported (factor stays positive away from the
    terminal time, keeping ln() well-defined on both engines). Durations
    are exact integer microseconds (µs-truncated loader, SURVEY §1.2)."""
    ev = T(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 6 HOUR")).alias("cutoff")
    )
    users = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            (
                F.unix_micros("last_ts") - F.unix_micros("first_ts")
            ).alias("dur_us"),
            F.when(F.col("last_ts") < F.col("cutoff"), 1)
            .otherwise(0)
            .alias("is_death"),
        )
    )
    by_dur = users.groupBy("dur_us").agg(
        F.sum("is_death").alias("deaths"), F.count(F.lit(1)).alias("m")
    )
    w_desc = Window.orderBy(F.desc("dur_us")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_dur.select(
        "dur_us", "deaths", F.sum("m").over(w_desc).alias("at_risk")
    )
    w_asc = Window.orderBy("dur_us").rowsBetween(
        Window.unboundedPreceding, 0
    )
    km = risk.select(
        "dur_us",
        "deaths",
        "at_risk",
        F.exp(
            F.sum(
                F.log(1.0 - F.col("deaths") / F.col("at_risk").cast("double"))
            ).over(w_asc)
        ).alias("s"),
    )
    # Sort/limit on the exact integer dur_us BEFORE projecting it away:
    # ordering on the rounded dur_days (~86 ms resolution) could select a
    # different 30-row prefix than the oracle's ORDER BY dur_us when distinct
    # durations fall within the rounding quantum at the cutoff.
    return (
        km.filter(F.col("deaths") > 0)
        .orderBy("dur_us")
        .limit(30)
        .select(
            r6(F.col("dur_us") / 86400000000.0).alias("dur_days"),
            F.col("deaths").cast("bigint").alias("deaths"),
            F.col("at_risk").cast("bigint").alias("at_risk"),
            r6("s").alias("survival"),
        )
    )


@query(
    "q_ml_two_proportions",
    oracle="""
    WITH s AS (
        SELECT SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::DOUBLE
                   AS n1,
               SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::DOUBLE
                   AS n2,
               SUM(CASE WHEN user_id % 2 = 1
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END)::DOUBLE AS k1,
               SUM(CASE WHEN user_id % 2 = 0
                             AND event_type = 'purchase'
                        THEN 1 ELSE 0 END)::DOUBLE AS k2
        FROM events
    )
    SELECT CAST(n1 AS BIGINT) AS n_treat,
           CAST(n2 AS BIGINT) AS n_ctrl,
           ROUND(k1 / n1, 6) AS rate_treat,
           ROUND(k2 / n2, 6) AS rate_ctrl,
           ROUND((k1 / n1 - k2 / n2)
                 / SQRT(((k1 + k2) / (n1 + n2))
                        * (1 - (k1 + k2) / (n1 + n2))
                        * (1 / n1 + 1 / n2)), 6) AS z_stat
    FROM s
    """,
)
def q_ml_two_proportions(spark, sf_dir):
    """Two-proportion z-test of purchase rate between the parity arms,
    pooled-variance form: z = (p̂₁−p̂₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) — the
    binary-outcome counterpart of q_ml_welch_ttest and the test behind
    every conversion-rate readout. One conditional count aggregation;
    all ratios from exact integers."""
    ev = T(spark, sf_dir, "events")
    t_arm = F.col("user_id") % 2 == 1
    is_p = F.col("event_type") == "purchase"
    s = ev.agg(
        F.sum(F.when(t_arm, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(~t_arm, 1).otherwise(0)).cast("double").alias("n2"),
        F.sum(F.when(t_arm & is_p, 1).otherwise(0))
        .cast("double")
        .alias("k1"),
        F.sum(F.when(~t_arm & is_p, 1).otherwise(0))
        .cast("double")
        .alias("k2"),
    )
    n1, n2, k1, k2 = F.col("n1"), F.col("n2"), F.col("k1"), F.col("k2")
    pooled = (k1 + k2) / (n1 + n2)
    z = (k1 / n1 - k2 / n2) / F.sqrt(
        pooled * (1 - pooled) * (1 / n1 + 1 / n2)
    )
    return s.select(
        n1.cast("bigint").alias("n_treat"),
        n2.cast("bigint").alias("n_ctrl"),
        r6(k1 / n1).alias("rate_treat"),
        r6(k2 / n2).alias("rate_ctrl"),
        r6(z).alias("z_stat"),
    )


@query(
    "q_events_exp_fit",
    oracle="""
    WITH gaps AS (
        SELECT (epoch_us(ts)
                - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)))
               / 1000000.0 AS gap_s
        FROM events
    ),
    g AS (SELECT gap_s FROM gaps WHERE gap_s IS NOT NULL AND gap_s > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(1.0 / AVG(gap_s), 6) AS lambda_per_s,
           ROUND(AVG(CASE WHEN gap_s > 3600.0 THEN 1.0 ELSE 0 END), 6)
               AS p_gap_gt_1h_emp,
           ROUND(EXP(-3600.0 / AVG(gap_s)), 6) AS p_gap_gt_1h_model
    FROM g
    """,
)
def q_events_exp_fit(spark, sf_dir):
    """Exponential fit of per-user inter-arrival gaps (MLE λ = 1/mean)
    with a one-point goodness check: the empirical P(gap > 1h) against
    the fitted e^{−λt}. A big empirical excess over the model is the
    heavy-tail signature (sessions + dormancy, not a Poisson user), and
    the quantitative justification for the 30-minute session gap used by
    q_stream_session. One LAG window keyed by user, one moment
    aggregate; gaps are exact-µs integers scaled once."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / 1000000.0
        ).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull() & (F.col("gap_s") > 0))
    return gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        r6(1.0 / F.avg("gap_s")).alias("lambda_per_s"),
        r6(
            F.avg(F.when(F.col("gap_s") > 3600.0, 1.0).otherwise(0.0))
        ).alias("p_gap_gt_1h_emp"),
        r6(F.exp(-3600.0 / F.avg("gap_s"))).alias("p_gap_gt_1h_model"),
    )


@query(
    "q_ml_cohens_d",
    oracle="""
    WITH s AS (
        SELECT COUNT(*) FILTER (WHERE event_type = 'purchase')::DOUBLE
                   AS n1,
               COUNT(*) FILTER (WHERE event_type = 'click')::DOUBLE AS n2,
               AVG(value) FILTER (WHERE event_type = 'purchase') AS m1,
               AVG(value) FILTER (WHERE event_type = 'click') AS m2,
               VAR_SAMP(value) FILTER (WHERE event_type = 'purchase')
                   AS v1,
               VAR_SAMP(value) FILTER (WHERE event_type = 'click') AS v2
        FROM events WHERE event_type IN ('purchase', 'click')
    )
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_click,
           ROUND((m1 - m2) / SQRT(((n1 - 1) * v1 + (n2 - 1) * v2)
                                  / (n1 + n2 - 2)), 6) AS cohens_d,
           ROUND((m1 - m2) / SQRT(((n1 - 1) * v1 + (n2 - 1) * v2)
                                  / (n1 + n2 - 2))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g
    FROM s
    """,
)
def q_ml_cohens_d(spark, sf_dir):
    """Standardized effect size for the purchase-vs-click value
    comparison: Cohen's d on the pooled standard deviation, plus the
    small-sample Hedges' g correction (1 − 3/(4N−9)). The companion
    number to q_ml_welch_ttest's significance — at 100 TB every t-test
    is 'significant', and the effect size is the only column worth
    reading. Same single conditional-moment aggregation."""
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    p = F.when(F.col("event_type") == "purchase", F.col("value"))
    c = F.when(F.col("event_type") == "click", F.col("value"))
    s = ev.agg(
        F.count(p).cast("double").alias("n1"),
        F.count(c).cast("double").alias("n2"),
        F.avg(p).alias("m1"),
        F.avg(c).alias("m2"),
        F.var_samp(p).alias("v1"),
        F.var_samp(c).alias("v2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    pooled = F.sqrt(
        ((n1 - 1) * F.col("v1") + (n2 - 1) * F.col("v2")) / (n1 + n2 - 2)
    )
    d = (F.col("m1") - F.col("m2")) / pooled
    return s.select(
        n1.cast("bigint").alias("n_purchase"),
        n2.cast("bigint").alias("n_click"),
        r6(d).alias("cohens_d"),
        r6(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))).alias("hedges_g"),
    )


@query(
    "q_ml_wilson_ci",
    oracle="""
    WITH s AS (
        SELECT COUNT(*)::DOUBLE AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END)::DOUBLE AS k
        FROM events
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k,
           ROUND(k / n, 6) AS rate,
           ROUND((k / n + 1.959964 * 1.959964 / (2 * n)
                  - 1.959964 * SQRT((k / n) * (1 - k / n) / n
                                    + 1.959964 * 1.959964 / (4 * n * n)))
                 / (1 + 1.959964 * 1.959964 / n), 6) AS wilson_lo,
           ROUND((k / n + 1.959964 * 1.959964 / (2 * n)
                  + 1.959964 * SQRT((k / n) * (1 - k / n) / n
                                    + 1.959964 * 1.959964 / (4 * n * n)))
                 / (1 + 1.959964 * 1.959964 / n), 6) AS wilson_hi
    FROM s
    """,
)
def q_ml_wilson_ci(spark, sf_dir):
    """Wilson score interval for the global purchase rate — the binomial
    CI that stays inside [0,1] and behaves at small k where the naive
    Wald interval collapses (the reason it is the default in every
    serious experimentation system). z = 1.959964 as a fixed literal;
    one counting aggregate, closed-form bounds."""
    ev = T(spark, sf_dir, "events")
    s = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("k"),
    )
    z = 1.959964
    n, k = F.col("n"), F.col("k")
    phat = k / n
    center = phat + z * z / (2 * n)
    half = z * F.sqrt(phat * (1 - phat) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    return s.select(
        n.cast("bigint").alias("n"),
        k.cast("bigint").alias("k"),
        r6(phat).alias("rate"),
        r6((center - half) / denom).alias("wilson_lo"),
        r6((center + half) / denom).alias("wilson_hi"),
    )


@query(
    "q_events_powerlaw",
    oracle="""
    WITH counts AS (
        SELECT user_id, COUNT(*)::DOUBLE AS c FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rnk
        FROM counts
    ),
    logs AS (
        SELECT LN(rnk) AS x, LN(c) AS y FROM ranked WHERE rnk <= 100
    ),
    fit AS (
        SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
        FROM logs
    )
    SELECT CAST(n AS BIGINT) AS n_users_fit,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS powerlaw_slope,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM fit
    """,
)
def q_events_powerlaw(spark, sf_dir):
    """Rank-size power-law fit of user activity: OLS of ln(count) on
    ln(rank) over the top-100 users (rank DESC by count, user_id
    tie-break) — slope ≈ −α is the concentration exponent, R² says how
    power-law-like the audience actually is. The user-domain twin of
    q_text_zipf: same closed-form regression, different heavy tail.
    One user-grain count, one rank window over O(users), a 100-row
    moment fit."""
    ev = T(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    w = Window.orderBy(F.desc("c"), "user_id")
    logs = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 100)
        .select(F.log("rnk").alias("x"), F.log("c").alias("y"))
    )
    fit = logs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = n * F.col("sxy") - sx * sy
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    return fit.select(
        n.cast("bigint").alias("n_users_fit"),
        r6(cov / vx).alias("powerlaw_slope"),
        r6(cov * cov / (vx * vy)).alias("r2"),
    )


@query(
    "q_ml_gumbel",
    oracle="""
    WITH maxima AS (
        SELECT date_trunc('day', ts) AS day, MAX(value) AS mx
        FROM events GROUP BY 1
    ),
    mom AS (
        SELECT COUNT(*)::DOUBLE AS n, AVG(mx) AS m,
               STDDEV_SAMP(mx) AS s
        FROM maxima
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           ROUND(m - 0.5772156649 * (s * SQRT(6.0) / PI()), 6) AS mu,
           ROUND(s * SQRT(6.0) / PI(), 6) AS beta,
           ROUND(1.0 - EXP(-EXP(-(400.0 - (m - 0.5772156649
                                           * (s * SQRT(6.0) / PI())))
                                / (s * SQRT(6.0) / PI()))), 6)
               AS p_exceed_400
    FROM mom
    """,
)
def q_ml_gumbel(spark, sf_dir):
    """Extreme-value analysis by block maxima: daily maxima of `value`
    fitted to a Gumbel distribution by method of moments (β = s√6/π,
    μ = m − γβ with Euler–Mascheroni γ as a fixed literal), and the
    fitted exceedance probability P(daily max > 400) — the tail question
    ('how often will we see a day worse than X?') that mean/variance
    monitoring cannot answer. One block-max aggregation over the daily
    frame, then closed-form moments."""
    import math

    ev = T(spark, sf_dir, "events")
    maxima = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.max("value").alias("mx")
    )
    mom = maxima.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("mx").alias("m"),
        F.stddev_samp("mx").alias("s"),
    )
    beta = F.col("s") * math.sqrt(6.0) / math.pi
    mu = F.col("m") - 0.5772156649 * beta
    return mom.select(
        F.col("n").cast("bigint").alias("n_blocks"),
        r6(mu).alias("mu"),
        r6(beta).alias("beta"),
        r6(1.0 - F.exp(-F.exp(-(400.0 - mu) / beta))).alias(
            "p_exceed_400"
        ),
    )


@query(
    "q_events_macro_micro",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*)::DOUBLE AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END)::DOUBLE AS k
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(SUM(k) / SUM(n), 6) AS micro_rate,
           ROUND(AVG(k / n), 6) AS macro_rate,
           ROUND(AVG(k / n) - SUM(k) / SUM(n), 6) AS aggregation_gap
    FROM per_user
    """,
)
def q_events_macro_micro(spark, sf_dir):
    """Micro- vs macro-averaged purchase rate: pooled Σk/Σn against the
    unweighted mean of per-user rates. The gap is the Simpson's-paradox
    dial — nonzero whenever heavy users convert differently from light
    ones, and the reason 'average conversion' must name its averaging
    unit. Single user-grain aggregation; both averages from the same
    frame."""
    ev = T(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("k"),
    )
    micro = F.sum("k") / F.sum("n")
    macro = F.avg(F.col("k") / F.col("n"))
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        r6(micro).alias("micro_rate"),
        r6(macro).alias("macro_rate"),
        r6(macro - micro).alias("aggregation_gap"),
    )


@query(
    "q_ml_anova",
    oracle="""
    WITH g AS (
        SELECT event_type, COUNT(*)::DOUBLE AS n, AVG(value) AS m,
               SUM(value * value) AS sxx
        FROM events GROUP BY event_type
    ),
    tot AS (
        SELECT SUM(n) AS nn, SUM(n * m) / SUM(n) AS grand,
               COUNT(*)::DOUBLE AS k
        FROM g
    ),
    ss AS (
        SELECT SUM(g.sxx - g.n * g.m * g.m) AS ssw,
               SUM(g.n * (g.m - tot.grand) * (g.m - tot.grand)) AS ssb,
               MAX(tot.nn) AS nn, MAX(tot.k) AS k
        FROM g CROSS JOIN tot
    )
    SELECT CAST(nn AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k_groups,
           ROUND(ssb, 0) AS ssb,
           ROUND(ssw, 0) AS ssw,
           ROUND((ssb / (k - 1)) / (ssw / (nn - k)), 6) AS f_stat
    FROM ss
    """,
)
def q_ml_anova(spark, sf_dir):
    """One-way ANOVA of `value` across the five event types: F =
    (SSB/(k−1)) / (SSW/(N−k)) with both sums of squares derived from ONE
    conditional-moment aggregation (per-group n, mean, Σx²) — no second
    pass, no residual materialization. The omnibus complement to the
    pairwise q_ml_welch_ttest. Sums of squares are rounded at integer
    grain (magnitude ~1e7, SURVEY §2.1 magnitude rule); F is O(1)."""
    ev = T(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        F.sum(F.col("value") * F.col("value")).alias("sxx"),
    )
    ss = g.agg(
        F.sum("n").alias("nn"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("grand"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("sxx") - F.col("n") * F.col("m") * F.col("m")).alias(
            "ssw"
        ),
        F.sum(F.col("n") * F.col("m") * F.col("m")).alias("sb_raw"),
    )
    ssb = F.col("sb_raw") - F.col("nn") * F.col("grand") * F.col("grand")
    return ss.select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k_groups"),
        F.round(ssb, 0).alias("ssb"),
        F.round(F.col("ssw"), 0).alias("ssw"),
        r6(
            (ssb / (F.col("k") - 1)) / (F.col("ssw") / (F.col("nn") - F.col("k")))
        ).alias("f_stat"),
    )


@query(
    "q_ml_precision_at_k",
    oracle="""
    WITH q AS (
        SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
        FROM embeddings WHERE vec_id < 20
    ),
    pairs AS (
        SELECT q.q_id, q.q_label, e.vec_id, e.label,
               UNNEST(e.embedding) AS x, UNNEST(q.q_emb) AS y
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.q_id
    ),
    sims AS (
        SELECT q_id, q_label, vec_id, label,
               SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                   / (SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                      * SQRT(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
                   AS cos
        FROM pairs GROUP BY q_id, q_label, vec_id, label
    ),
    ranked AS (
        SELECT q_id, q_label, label,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY ROUND(cos, 6) DESC, vec_id)
                   AS rn
        FROM sims
    )
    SELECT q_id AS vec_id, q_label AS label,
           ROUND(AVG(CASE WHEN label = q_label THEN 1.0 ELSE 0.0 END), 6)
               AS p_at_10
    FROM ranked WHERE rn <= 10
    GROUP BY q_id, q_label
    """,
)
def q_ml_precision_at_k(spark, sf_dir):
    """Retrieval quality: precision@10 for the first 20 query vectors —
    the fraction of each query's 10 nearest neighbours (brute-force
    cosine, self excluded) sharing the query's label. The neighbour set is
    selected on the ROUNDED similarity with vec_id tie-break (grid-stable,
    same rule as q_ml_knn). Queries are a 20-row broadcast against the
    embedding table; at 100 TB the candidate pass is one scan with the
    per-query top-k kept by partial TakeOrdered (or the IVF/LSH pruned
    variants, q_ann_*) — never a materialized all-pairs matrix."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    from mapreduce_machine_learning_spark.functions import cosine

    pairs = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    sims = pairs.select(
        "q_id",
        "q_label",
        "vec_id",
        "label",
        r6(cosine("embedding", "q_emb")).alias("cos_r"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_r"), "vec_id")
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy(
            F.col("q_id").alias("vec_id"), F.col("q_label").alias("label")
        )
        .agg(
            r6(
                F.avg(
                    F.when(F.col("label") == F.col("q_label"), 1.0).otherwise(
                        0.0
                    )
                )
            ).alias("p_at_10")
        )
    )


@query(
    "q_ml_gamma_fit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value) * AVG(value) / VAR_SAMP(value), 6)
               AS shape_k,
           ROUND(VAR_SAMP(value) / AVG(value), 6) AS scale_theta,
           ROUND(AVG(value), 6) AS mean_check
    FROM events WHERE value > 0
    """,
)
def q_ml_gamma_fit(spark, sf_dir):
    """Gamma distribution fit of event values by method of moments
    (shape k = m²/v, scale θ = v/m, so kθ recovers the mean) — the
    right-skewed positive-support model that complements the
    exponential (q_events_exp_fit, the k=1 special case) and Gumbel
    (q_ml_gumbel, the extremes) fits: together a small distribution-
    fitting toolkit, each a single moment aggregation."""
    ev = T(spark, sf_dir, "events").filter(F.col("value") > 0)
    m, v = F.avg("value"), F.var_samp("value")
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        r6(m * m / v).alias("shape_k"),
        r6(v / m).alias("scale_theta"),
        r6(m).alias("mean_check"),
    )
