"""ML capability surface (SURVEY.md §2.6) — the reference's algorithms as
deterministic data-parallel cores.

The reference repo implements linear regression (normal equations in
summation form), logistic regression (full-batch GD), naive Bayes/GDA
(per-class moments), k-means (Lloyd), GMM (EM) and k-NN as Hadoop/mrjob
MapReduce jobs [SURVEY §1.1; /root/reference is empty — no file:line cites
possible]. Each query below is the single-pass kernel of one of those
algorithms: mappers accumulating sufficient statistics = partial aggregation;
the reducer's global sum = final aggregation; the tiny dense solve stays on
the driver (Chu et al., NIPS'06). Iterative drivers + MLlib mirrors live in
``mapreduce_machine_learning_spark/ml_iterative.py`` (pytest-verified against
numpy closed forms).

All constants are the fixed literals of SURVEY §2.9 — embedded identically in
both engines' formulas, so cross-engine results agree to FP noise far below
the rounding grid.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r0, r6
from mapreduce_machine_learning_spark.functions import cosine
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query
from mapreduce_machine_learning_spark.runtime import checkpoint as _ckpt

SQRT_2PI = math.sqrt(2.0 * math.pi)


@query(
    "q_ml_linreg_stats",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(l_quantity) AS sx,
               SUM(l_extendedprice) AS sy,
               SUM(l_quantity * l_quantity) AS sxx,
               SUM(l_quantity * l_extendedprice) AS sxy
        FROM lineitem
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(sx, 6) AS sum_x,
           ROUND(sy, 0) AS sum_y,
           ROUND(sxx, 6) AS sum_xx,
           ROUND(sxy, 0) AS sum_xy,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept
    FROM s
    """,
)
def q_ml_linreg_stats(spark, sf_dir):
    """Simple OLS via the summation form: one aggregation pass collects
    (n, Σx, Σy, Σxx, Σxy); slope/intercept are scalar arithmetic on the
    aggregated row — exactly the reference's mapper-sums + single-reducer
    solve, with the solve folded into the projection. Slope noise is
    ~1e-10 (denominator is exact — quantities are integral doubles)."""
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = T(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("bigint").alias("n"),
        r6(sx).alias("sum_x"),
        r0(sy).alias("sum_y"),
        r6(sxx).alias("sum_xx"),
        r0(sxy).alias("sum_xy"),
        r6(slope).alias("slope"),
        r6((sy - slope * sx) / n).alias("intercept"),
    )


@query(
    "q_ml_linreg_gram",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS g00,
           ROUND(SUM(l_quantity), 6) AS g01,
           ROUND(SUM(l_discount), 6) AS g02,
           ROUND(SUM(l_tax), 6) AS g03,
           ROUND(SUM(l_quantity * l_quantity), 6) AS g11,
           ROUND(SUM(l_quantity * l_discount), 6) AS g12,
           ROUND(SUM(l_quantity * l_tax), 6) AS g13,
           ROUND(SUM(l_discount * l_discount), 6) AS g22,
           ROUND(SUM(l_discount * l_tax), 6) AS g23,
           ROUND(SUM(l_tax * l_tax), 6) AS g33,
           ROUND(SUM(l_extendedprice), 0) AS b0,
           ROUND(SUM(l_quantity * l_extendedprice), 0) AS b1,
           ROUND(SUM(l_discount * l_extendedprice), 0) AS b2,
           ROUND(SUM(l_tax * l_extendedprice), 0) AS b3
    FROM lineitem
    """,
)
def q_ml_linreg_gram(spark, sf_dir):
    """Multi-feature normal equations: the upper triangle of XᵀX and Xᵀy for
    features (1, quantity, discount, tax) → y = extendedprice. This is the
    reference's Gram-matrix mapper accumulation verbatim; the driver would
    np.linalg.solve the 4×4 (see ml_iterative.linreg_normal). At any scale
    the shuffle payload is 14 doubles per partition."""
    q, d, t, y = (
        F.col("l_quantity"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_extendedprice"),
    )
    return T(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("g00"),
        r6(F.sum(q)).alias("g01"),
        r6(F.sum(d)).alias("g02"),
        r6(F.sum(t)).alias("g03"),
        r6(F.sum(q * q)).alias("g11"),
        r6(F.sum(q * d)).alias("g12"),
        r6(F.sum(q * t)).alias("g13"),
        r6(F.sum(d * d)).alias("g22"),
        r6(F.sum(d * t)).alias("g23"),
        r6(F.sum(t * t)).alias("g33"),
        r0(F.sum(y)).alias("b0"),
        r0(F.sum(q * y)).alias("b1"),
        r0(F.sum(d * y)).alias("b2"),
        r0(F.sum(t * y)).alias("b3"),
    )


@query(
    "q_ml_gnb_params",
    oracle="""
    WITH cls AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(value) AS mu,
               VAR_SAMP(value) AS var
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           ROUND(n / SUM(n) OVER (), 6) AS prior,
           ROUND(mu, 6) AS mean_value,
           ROUND(var, 6) AS var_value
    FROM cls
    """,
)
def q_ml_gnb_params(spark, sf_dir):
    """Gaussian naive Bayes / GDA parameter pass: per-class prior, mean and
    sample variance of the feature in ONE aggregation — the reference's
    NB job shape. (MLlib mirror: NaiveBayes in ml_iterative.)"""
    from pyspark.sql import Window

    cls = (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("value").alias("mu"),
            F.var_samp("value").alias("var"),
        )
    )
    total = F.sum("n").over(Window.partitionBy())
    return cls.select(
        "event_type",
        r6(F.col("n") / total).alias("prior"),
        r6(F.col("mu")).alias("mean_value"),
        r6(F.col("var")).alias("var_value"),
    )


@query(
    "q_ml_logreg_grad",
    oracle="""
    WITH g AS (
        -- CAST: bare literals are DECIMAL in DuckDB; keep everything DOUBLE
        SELECT SUM(CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   AS grad0,
               SUM((CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   * (value / 100.0)) AS grad1
        FROM events
    )
    SELECT ROUND(grad0, 6) AS grad_0,
           ROUND(grad1, 6) AS grad_1,
           ROUND(-0.1 * grad0, 6) AS w0_next,
           ROUND(-0.1 * grad1, 6) AS w1_next
    FROM g
    """,
)
def q_ml_logreg_grad(spark, sf_dir):
    """One full-batch gradient-descent step for logistic regression from
    w = 0: σ(0) = 0.5, so grad_j = Σ(0.5 − y)·x_j with features (1, value/100)
    and label y = [event_type = 'purchase']; next weights = −0.1·grad
    (SURVEY §2.9 literals). The reference re-submits a MapReduce job per step;
    here each step is one agg over a cached DataFrame
    (ml_iterative.logreg_gd runs the full loop)."""
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    resid = 0.5 - y
    g = T(spark, sf_dir, "events").agg(
        F.sum(resid).alias("grad0"),
        F.sum(resid * (F.col("value") / 100.0)).alias("grad1"),
    )
    return g.select(
        r6(F.col("grad0")).alias("grad_0"),
        r6(F.col("grad1")).alias("grad_1"),
        r6(-0.1 * F.col("grad0")).alias("w0_next"),
        r6(-0.1 * F.col("grad1")).alias("w1_next"),
    )


_KM_CENTROIDS = ((50.0, 6.0), (100.0, 12.0), (150.0, 18.0))


def _km_case_sql() -> str:
    d = [
        f"(POW(value - {v}, 2) + POW(hr - {h}, 2))" for v, h in _KM_CENTROIDS
    ]
    return (
        f"CASE WHEN {d[0]} <= {d[1]} AND {d[0]} <= {d[2]} THEN 0 "
        f"WHEN {d[1]} <= {d[2]} THEN 1 ELSE 2 END"
    )


@query(
    "q_ml_kmeans_step",
    oracle=f"""
    WITH pts AS (
        SELECT value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr FROM events
    )
    SELECT {_km_case_sql()} AS cluster,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(value), 6) AS mean_value,
           ROUND(AVG(hr), 6) AS mean_hour
    FROM pts
    GROUP BY cluster
    """,
)
def q_ml_kmeans_step(spark, sf_dir):
    """One Lloyd iteration on 2-D points (value, hour(ts)) with the fixed k=3
    centroids of SURVEY §2.9. Assignment is a pure-expression argmin (CASE
    with <= so ties go to the lowest centroid id — same text both engines);
    the M-step means are one groupBy. The reference runs this as a full
    MapReduce job per iteration; ml_iterative.kmeans_fit loops over a cached
    frame with broadcast centroids."""
    pts = T(spark, sf_dir, "events").select(
        "value", F.hour("ts").cast("double").alias("hr")
    )
    d = [
        F.pow(F.col("value") - v, 2) + F.pow(F.col("hr") - h, 2)
        for v, h in _KM_CENTROIDS
    ]
    cluster = (
        F.when((d[0] <= d[1]) & (d[0] <= d[2]), 0)
        .when(d[1] <= d[2], 1)
        .otherwise(2)
    )
    return (
        pts.withColumn("cluster", cluster)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r6(F.avg("value")).alias("mean_value"),
            r6(F.avg("hr")).alias("mean_hour"),
        )
    )


_GMM = dict(pi1=0.5, pi2=0.5, mu1=50.0, mu2=150.0, s1=25.0, s2=25.0)


@query(
    "q_ml_gmm_estep",
    oracle=f"""
    WITH r AS (
        SELECT value,
               ({_GMM["pi1"]} * EXP(-POW((value - {_GMM["mu1"]}) / {_GMM["s1"]}, 2) / 2.0)
                    / ({_GMM["s1"]} * CAST({SQRT_2PI!r} AS DOUBLE))) AS p1,
               ({_GMM["pi2"]} * EXP(-POW((value - {_GMM["mu2"]}) / {_GMM["s2"]}, 2) / 2.0)
                    / ({_GMM["s2"]} * CAST({SQRT_2PI!r} AS DOUBLE))) AS p2
        FROM events
    )
    SELECT ROUND(SUM(p1 / (p1 + p2)), 6) AS sum_r1,
           ROUND(SUM(p1 / (p1 + p2) * value), 6) AS sum_r1x,
           ROUND(SUM(p2 / (p1 + p2)), 6) AS sum_r2,
           ROUND(SUM(p2 / (p1 + p2) * value), 6) AS sum_r2x
    FROM r
    """,
)
def q_ml_gmm_estep(spark, sf_dir):
    """One EM E-step of a 1-D two-component GMM with fixed (π, μ, σ)
    (SURVEY §2.9): responsibilities from the Gaussian pdf, then the M-step
    numerators Σr and Σr·x — per-component sufficient statistics, the same
    mapper-responsibilities/reducer-sums split as the reference's GMM job.
    √(2π) is embedded as the same double literal in both engines."""
    v = F.col("value")

    def pdf(pi, mu, s):
        return pi * F.exp(-F.pow((v - mu) / s, 2) / 2.0) / (s * SQRT_2PI)

    p1 = pdf(_GMM["pi1"], _GMM["mu1"], _GMM["s1"])
    p2 = pdf(_GMM["pi2"], _GMM["mu2"], _GMM["s2"])
    r1 = p1 / (p1 + p2)
    r2 = p2 / (p1 + p2)
    return T(spark, sf_dir, "events").agg(
        r6(F.sum(r1)).alias("sum_r1"),
        r6(F.sum(r1 * v)).alias("sum_r1x"),
        r6(F.sum(r2)).alias("sum_r2"),
        r6(F.sum(r2 * v)).alias("sum_r2x"),
    )


@query(
    "q_ml_knn",
    oracle="""
    WITH pairs AS (
        SELECT e.vec_id,
               UNNEST(e.embedding) AS x,
               UNNEST(q.embedding) AS y
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
    ),
    sims AS (
        SELECT vec_id,
               SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                   / (SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                      * SQRT(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS cos
        FROM pairs GROUP BY vec_id
    )
    SELECT vec_id, ROUND(cos, 6) AS cos_sim
    FROM sims
    ORDER BY ROUND(cos, 6) DESC, vec_id
    LIMIT 10
    """,
)
def q_ml_knn(spark, sf_dir):
    """k-NN: top-10 neighbours of the vec_id=0 embedding by cosine similarity
    (query vector excluded; k and query per SURVEY §2.9). Brute-force
    dot-product via zip_with+aggregate in double precision; ordering is on the
    ROUNDED similarity with vec_id tie-break, so the selected set is stable
    against sub-grid FP noise. 100 TB path: the LSH-bucketed variant
    (q_llm_sim_threshold's blocking) or IVF partition pruning — brute force
    stays the exact baseline. Also aliased as q_llm_knn (SURVEY §2.8)."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    pairs = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    cos = cosine("embedding", "q_embedding")
    return (
        pairs.select("vec_id", r6(cos).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def _km_case_sql_dyn() -> str:
    d = [
        f"(POW(value - c{i}v, 2) + POW(hr - c{i}h, 2))" for i in range(3)
    ]
    return (
        f"CASE WHEN {d[0]} <= {d[1]} AND {d[0]} <= {d[2]} THEN 0 "
        f"WHEN {d[1]} <= {d[2]} THEN 1 ELSE 2 END"
    )


@query(
    "q_ml_kmeans_iter2",
    oracle=f"""
    WITH pts AS (
        SELECT value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr FROM events
    ),
    a1 AS (SELECT value, hr, {_km_case_sql()} AS cluster FROM pts),
    c1 AS (
        SELECT cluster, ROUND(AVG(value), 6) AS mv, ROUND(AVG(hr), 6) AS mh
        FROM a1 GROUP BY cluster
    ),
    cp AS (
        SELECT
            COALESCE(MAX(CASE WHEN cluster = 0 THEN mv END), {_KM_CENTROIDS[0][0]}) AS c0v,
            COALESCE(MAX(CASE WHEN cluster = 0 THEN mh END), {_KM_CENTROIDS[0][1]}) AS c0h,
            COALESCE(MAX(CASE WHEN cluster = 1 THEN mv END), {_KM_CENTROIDS[1][0]}) AS c1v,
            COALESCE(MAX(CASE WHEN cluster = 1 THEN mh END), {_KM_CENTROIDS[1][1]}) AS c1h,
            COALESCE(MAX(CASE WHEN cluster = 2 THEN mv END), {_KM_CENTROIDS[2][0]}) AS c2v,
            COALESCE(MAX(CASE WHEN cluster = 2 THEN mh END), {_KM_CENTROIDS[2][1]}) AS c2h
        FROM c1
    ),
    a2 AS (
        SELECT p.value, p.hr, {_km_case_sql_dyn()} AS cluster
        FROM pts p CROSS JOIN cp
    )
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(value), 6) AS mean_value,
           ROUND(AVG(hr), 6) AS mean_hour
    FROM a2 GROUP BY cluster
    """,
)
def q_ml_kmeans_iter2(spark, sf_dir):
    """TWO Lloyd iterations entirely in-plan — the reference re-submits a
    MapReduce job per iteration with centroids shipped through the job conf;
    here iteration 1's M-step (a 3-row aggregate) is pivoted to a single row
    and CROSS-JOINED back (Spark: broadcast of one row = the conf shipment,
    zero shuffle of the fact side), so iteration 2's assignment runs in the
    same Catalyst plan with no driver round-trip. Updated centroids are
    ROUNDED to 6 places on both engines before re-assignment, making the
    iteration-2 decision boundary bitwise identical cross-engine (raw AVG
    noise ~1e-13 would otherwise sit exactly on argmin ties). Empty clusters
    fall back to their seed centroid via COALESCE on both sides."""
    pts = T(spark, sf_dir, "events").select(
        "value", F.hour("ts").cast("double").alias("hr")
    )
    d0 = [
        F.pow(F.col("value") - v, 2) + F.pow(F.col("hr") - h, 2)
        for v, h in _KM_CENTROIDS
    ]
    assign1 = (
        F.when((d0[0] <= d0[1]) & (d0[0] <= d0[2]), 0)
        .when(d0[1] <= d0[2], 1)
        .otherwise(2)
    )
    c1 = (
        pts.withColumn("cluster", assign1)
        .groupBy("cluster")
        .agg(r6(F.avg("value")).alias("mv"), r6(F.avg("hr")).alias("mh"))
    )

    def pick(i, col, seed):
        return F.coalesce(
            F.max(F.when(F.col("cluster") == i, F.col(col))), F.lit(seed)
        ).alias(f"c{i}{'v' if col == 'mv' else 'h'}")

    cp = c1.agg(
        *[
            pick(i, col, seed[0] if col == "mv" else seed[1])
            for i, seed in enumerate(_KM_CENTROIDS)
            for col in ("mv", "mh")
        ]
    )
    d1 = [
        F.pow(F.col("value") - F.col(f"c{i}v"), 2)
        + F.pow(F.col("hr") - F.col(f"c{i}h"), 2)
        for i in range(3)
    ]
    assign2 = (
        F.when((d1[0] <= d1[1]) & (d1[0] <= d1[2]), 0)
        .when(d1[1] <= d1[2], 1)
        .otherwise(2)
    )
    return (
        pts.crossJoin(F.broadcast(cp))
        .withColumn("cluster", assign2)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r6(F.avg("value")).alias("mean_value"),
            r6(F.avg("hr")).alias("mean_hour"),
        )
    )


@query(
    "q_ml_gnb_predict",
    oracle="""
    WITH pts AS (
        SELECT value AS v, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    cls AS (
        SELECT y, CAST(COUNT(*) AS DOUBLE) AS n,
               ROUND(AVG(v), 6) AS mu_v, ROUND(VAR_SAMP(v), 6) AS var_v,
               ROUND(AVG(hr), 6) AS mu_h, ROUND(VAR_SAMP(hr), 6) AS var_h
        FROM pts GROUP BY y
    ),
    prm AS (
        SELECT
            ROUND(MAX(CASE WHEN y = 1 THEN n END)
                  / SUM(n), 6) AS p1,
            MAX(CASE WHEN y = 1 THEN mu_v END) AS mu_v1,
            MAX(CASE WHEN y = 1 THEN var_v END) AS var_v1,
            MAX(CASE WHEN y = 1 THEN mu_h END) AS mu_h1,
            MAX(CASE WHEN y = 1 THEN var_h END) AS var_h1,
            MAX(CASE WHEN y = 0 THEN mu_v END) AS mu_v0,
            MAX(CASE WHEN y = 0 THEN var_v END) AS var_v0,
            MAX(CASE WHEN y = 0 THEN mu_h END) AS mu_h0,
            MAX(CASE WHEN y = 0 THEN var_h END) AS var_h0
        FROM cls
    ),
    scored AS (
        SELECT y,
               CASE WHEN
                   (LN(p1) - 0.5 * LN(var_v1) - POW(v - mu_v1, 2) / (2 * var_v1)
                            - 0.5 * LN(var_h1) - POW(hr - mu_h1, 2) / (2 * var_h1))
                   >
                   (LN(1 - p1) - 0.5 * LN(var_v0) - POW(v - mu_v0, 2) / (2 * var_v0)
                            - 0.5 * LN(var_h0) - POW(hr - mu_h0, 2) / (2 * var_h0))
                   THEN 1 ELSE 0 END AS pred
        FROM pts CROSS JOIN prm
    )
    SELECT y AS actual, pred, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM scored GROUP BY y, pred
    """,
)
def q_ml_gnb_predict(spark, sf_dir):
    """Gaussian naive Bayes TRAIN + PREDICT in one plan: fit per-class
    (prior, mean, variance) for features (value, hour) on the binary label
    [event_type = 'purchase'], pivot the 2-class parameter table to one row,
    broadcast it back over the events, score both class log-likelihoods
    per row, and report the confusion matrix. This closes the loop the
    reference leaves to a separate prediction job after its NB parameter
    job. All learned parameters are rounded to 6 places on both engines
    before scoring, so the per-row decision expression is evaluated on
    bitwise-identical inputs — the argmax boundary cannot flip cross-engine.
    Fact table is never shuffled: train is one hash-agg, predict is a
    broadcast of one row, confusion is a 4-group hash-agg."""
    pts = T(spark, sf_dir, "events").select(
        F.col("value").alias("v"),
        F.hour("ts").cast("double").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cls = pts.groupBy("y").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        r6(F.avg("v")).alias("mu_v"),
        r6(F.var_samp("v")).alias("var_v"),
        r6(F.avg("hr")).alias("mu_h"),
        r6(F.var_samp("hr")).alias("var_h"),
    )

    def pk(y, col):
        return F.max(F.when(F.col("y") == y, F.col(col))).alias(f"{col}{y}")

    prm = cls.agg(
        r6(
            F.max(F.when(F.col("y") == 1, F.col("n"))) / F.sum("n")
        ).alias("p1"),
        pk(1, "mu_v"), pk(1, "var_v"), pk(1, "mu_h"), pk(1, "var_h"),
        pk(0, "mu_v"), pk(0, "var_v"), pk(0, "mu_h"), pk(0, "var_h"),
    )

    def loglik(prior, s):
        return (
            F.log(prior)
            - 0.5 * F.log(F.col(f"var_v{s}"))
            - F.pow(F.col("v") - F.col(f"mu_v{s}"), 2)
            / (2 * F.col(f"var_v{s}"))
            - 0.5 * F.log(F.col(f"var_h{s}"))
            - F.pow(F.col("hr") - F.col(f"mu_h{s}"), 2)
            / (2 * F.col(f"var_h{s}"))
        )

    scored = pts.crossJoin(F.broadcast(prm)).select(
        F.col("y").alias("actual"),
        F.when(
            loglik(F.col("p1"), 1) > loglik(1 - F.col("p1"), 0), 1
        ).otherwise(0).alias("pred"),
    )
    return scored.groupBy("actual", "pred").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@query(
    "q_ml_gda_params",
    oracle="""
    WITH pts AS (
        SELECT event_type, value AS v,
               CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr
        FROM events
    ),
    mu AS (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
               ROUND(AVG(v), 6) AS mu_v, ROUND(AVG(hr), 6) AS mu_h
        FROM pts GROUP BY event_type
    ),
    cent AS (
        SELECT p.event_type, m.n, m.mu_v, m.mu_h,
               (p.v - m.mu_v) AS dv, (p.hr - m.mu_h) AS dh
        FROM pts p JOIN mu m ON p.event_type = m.event_type
    ),
    pooled AS (
        SELECT SUM(dv * dv) AS svv, SUM(dv * dh) AS svh, SUM(dh * dh) AS shh,
               CAST(COUNT(*) AS DOUBLE) AS n_total
        FROM cent
    )
    SELECT m.event_type,
           ROUND(m.n / p.n_total, 6) AS prior,
           m.mu_v, m.mu_h,
           ROUND(p.svv / (p.n_total - 5), 6) AS cov_vv,
           ROUND(p.svh / (p.n_total - 5), 6) AS cov_vh,
           ROUND(p.shh / (p.n_total - 5), 6) AS cov_hh
    FROM mu m CROSS JOIN pooled p
    """,
)
def q_ml_gda_params(spark, sf_dir):
    """Gaussian discriminant analysis parameter pass: per-class priors and
    2-D means (value, hour) PLUS the pooled within-class covariance shared
    by all classes — the piece that distinguishes GDA from naive Bayes in
    the reference's lineup. Computed in two-pass CENTERED form: class means
    first (rounded to 6 on both engines, then broadcast back), then
    Σ(x−μ_c)(x−μ_c)ᵀ accumulated globally and divided by N−K. The centered
    sums stay at magnitude ~n·var (~1e7 at sf0.1, noise ~1e-9 absolute), so
    round-6 holds — the one-pass E[x²]−E[x]² form would cancel two ~1e10
    sums and lose the grid. K=5 event classes."""
    pts = T(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").alias("v"),
        F.hour("ts").cast("double").alias("hr"),
    )
    mu = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        r6(F.avg("v")).alias("mu_v"),
        r6(F.avg("hr")).alias("mu_h"),
    )
    cent = pts.join(F.broadcast(mu), "event_type").select(
        "event_type", "n", "mu_v", "mu_h",
        (F.col("v") - F.col("mu_v")).alias("dv"),
        (F.col("hr") - F.col("mu_h")).alias("dh"),
    )
    pooled = cent.agg(
        F.sum(F.col("dv") * F.col("dv")).alias("svv"),
        F.sum(F.col("dv") * F.col("dh")).alias("svh"),
        F.sum(F.col("dh") * F.col("dh")).alias("shh"),
        F.count(F.lit(1)).cast("double").alias("n_total"),
    )
    return mu.crossJoin(F.broadcast(pooled)).select(
        "event_type",
        r6(F.col("n") / F.col("n_total")).alias("prior"),
        "mu_v", "mu_h",
        r6(F.col("svv") / (F.col("n_total") - 5)).alias("cov_vv"),
        r6(F.col("svh") / (F.col("n_total") - 5)).alias("cov_vh"),
        r6(F.col("shh") / (F.col("n_total") - 5)).alias("cov_hh"),
    )


@query(
    "q_ml_gmm_mstep",
    oracle=f"""
    WITH r AS (
        SELECT value,
               ({_GMM["pi1"]} * EXP(-POW((value - {_GMM["mu1"]}) / {_GMM["s1"]}, 2) / 2.0)
                    / ({_GMM["s1"]} * CAST({SQRT_2PI!r} AS DOUBLE))) AS p1,
               ({_GMM["pi2"]} * EXP(-POW((value - {_GMM["mu2"]}) / {_GMM["s2"]}, 2) / 2.0)
                    / ({_GMM["s2"]} * CAST({SQRT_2PI!r} AS DOUBLE))) AS p2
        FROM events
    ),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(p1 / (p1 + p2)) AS r1,
               SUM(p1 / (p1 + p2) * value) AS r1x,
               SUM(p1 / (p1 + p2) * value * value) AS r1xx,
               SUM(p2 / (p1 + p2)) AS r2,
               SUM(p2 / (p1 + p2) * value) AS r2x,
               SUM(p2 / (p1 + p2) * value * value) AS r2xx
        FROM r
    )
    SELECT ROUND(r1 / n, 6) AS pi1_next,
           ROUND(r1x / r1, 6) AS mu1_next,
           ROUND(SQRT(r1xx / r1 - (r1x / r1) * (r1x / r1)), 6) AS sigma1_next,
           ROUND(r2 / n, 6) AS pi2_next,
           ROUND(r2x / r2, 6) AS mu2_next,
           ROUND(SQRT(r2xx / r2 - (r2x / r2) * (r2x / r2)), 6) AS sigma2_next
    FROM s
    """,
)
def q_ml_gmm_mstep(spark, sf_dir):
    """The full EM iteration the reference's GMM job performs: E-step
    responsibilities (fixed SURVEY §2.9 params) feed weighted power sums
    (Σr, Σrx, Σrx²) per component, and the M-step update
    π' = Σr/n, μ' = Σrx/Σr, σ' = √(Σrx²/Σr − μ'²) is scalar arithmetic on
    the single aggregated row — mapper/reducer/driver collapsed into one
    agg + projection. The σ' expression cancels two same-magnitude ratios
    (both ~1e3–1e4 from values ~1e2): ratio-normalized first, so the
    difference keeps ~9 significant digits — round-6 safe, unlike raw
    Σrx² − (Σrx)²/Σr at 1e10 scale."""
    v = F.col("value")

    def pdf(pi, mu, s):
        return pi * F.exp(-F.pow((v - mu) / s, 2) / 2.0) / (s * SQRT_2PI)

    p1 = pdf(_GMM["pi1"], _GMM["mu1"], _GMM["s1"])
    p2 = pdf(_GMM["pi2"], _GMM["mu2"], _GMM["s2"])
    r1 = p1 / (p1 + p2)
    r2 = p2 / (p1 + p2)
    s = T(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(r1).alias("r1"),
        F.sum(r1 * v).alias("r1x"),
        F.sum(r1 * v * v).alias("r1xx"),
        F.sum(r2).alias("r2"),
        F.sum(r2 * v).alias("r2x"),
        F.sum(r2 * v * v).alias("r2xx"),
    )
    mu1 = F.col("r1x") / F.col("r1")
    mu2 = F.col("r2x") / F.col("r2")
    return s.select(
        r6(F.col("r1") / F.col("n")).alias("pi1_next"),
        r6(mu1).alias("mu1_next"),
        r6(F.sqrt(F.col("r1xx") / F.col("r1") - mu1 * mu1)).alias(
            "sigma1_next"
        ),
        r6(F.col("r2") / F.col("n")).alias("pi2_next"),
        r6(mu2).alias("mu2_next"),
        r6(F.sqrt(F.col("r2xx") / F.col("r2") - mu2 * mu2)).alias(
            "sigma2_next"
        ),
    )


@query(
    "q_ml_logreg_iter2",
    oracle="""
    WITH g1 AS (
        SELECT SUM(CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   AS grad0,
               SUM((CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   * (value / 100.0)) AS grad1
        FROM events
    ),
    w AS (
        SELECT ROUND(-0.1 * grad0, 6) AS w0, ROUND(-0.1 * grad1, 6) AS w1
        FROM g1
    ),
    g2 AS (
        SELECT w.w0, w.w1,
               SUM(1.0 / (1.0 + EXP(-(w.w0 + w.w1 * (value / 100.0))))
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   AS grad0,
               SUM((1.0 / (1.0 + EXP(-(w.w0 + w.w1 * (value / 100.0))))
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   * (value / 100.0)) AS grad1
        FROM events CROSS JOIN w
        GROUP BY w.w0, w.w1
    )
    SELECT ROUND(grad0, 6) AS grad_0,
           ROUND(grad1, 6) AS grad_1,
           ROUND(w0 - 0.1 * grad0, 6) AS w0_next,
           ROUND(w1 - 0.1 * grad1, 6) AS w1_next
    FROM g2
    """,
)
def q_ml_logreg_iter2(spark, sf_dir):
    """TWO full-batch logistic-regression GD steps in one plan — the
    iterative twin of q_ml_logreg_grad, same shape as q_ml_kmeans_iter2:
    step 1's weights (a 1-row aggregate, ROUNDED to 6 on both engines so
    step 2's sigmoid sees bitwise-identical w) are cross-joined back over
    the events as a broadcast, and step 2's gradient Σ(σ(wᵀx) − y)·x runs
    in the same Catalyst plan with no driver round-trip. The reference
    resubmits one MapReduce job per step with weights in the job conf —
    this is that loop, fused. Gradient magnitudes ~1e3 over n~1e5 rows:
    summation noise ~1e-10, round-6 safe."""
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    x1 = F.col("value") / 100.0
    ev = T(spark, sf_dir, "events")
    g1 = ev.agg(
        F.sum(0.5 - y).alias("grad0"),
        F.sum((0.5 - y) * x1).alias("grad1"),
    )
    w = g1.select(
        r6(-0.1 * F.col("grad0")).alias("w0"),
        r6(-0.1 * F.col("grad1")).alias("w1"),
    )
    sig = 1.0 / (1.0 + F.exp(-(F.col("w0") + F.col("w1") * x1)))
    g2 = (
        ev.crossJoin(F.broadcast(w))
        .groupBy("w0", "w1")
        .agg(
            F.sum(sig - y).alias("grad0"),
            F.sum((sig - y) * x1).alias("grad1"),
        )
    )
    return g2.select(
        r6(F.col("grad0")).alias("grad_0"),
        r6(F.col("grad1")).alias("grad_1"),
        r6(F.col("w0") - 0.1 * F.col("grad0")).alias("w0_next"),
        r6(F.col("w1") - 0.1 * F.col("grad1")).alias("w1_next"),
    )


@query(
    "q_ml_knn_classify",
    oracle="""
    WITH pairs AS (
        SELECT e.vec_id, e.label,
               UNNEST(e.embedding) AS x,
               UNNEST(q.embedding) AS y
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
    ),
    sims AS (
        SELECT vec_id, label,
               ROUND(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                   / (SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                      * SQRT(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 6)
                   AS cos
        FROM pairs GROUP BY vec_id, label
    ),
    topk AS (
        SELECT label FROM sims ORDER BY cos DESC, vec_id LIMIT 10
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS votes,
           ROUND(COUNT(*) / CAST(10.0 AS DOUBLE), 6) AS weight
    FROM topk GROUP BY label
    ORDER BY votes DESC, label
    """,
)
def q_ml_knn_classify(spark, sf_dir):
    """k-NN CLASSIFICATION — the vote the reference's kNN job takes after
    finding neighbours: the k=10 nearest embeddings to vec_id=0 (by rounded
    cosine with vec_id tie-break, so the neighbour SET is cross-engine
    stable) vote with their labels; output is the vote tally, whose top row
    is the prediction. Same brute-force top-k core as q_ml_knn (broadcast
    query vector, TakeOrdered — no shuffle of the embedding side), plus a
    10-row reduce for the tally."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    pairs = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    cos = cosine("embedding", "q_embedding")
    topk = (
        pairs.select("vec_id", "label", r6(cos).alias("cos"))
        .orderBy(F.desc("cos"), "vec_id")
        .limit(10)
    )
    return (
        topk.groupBy("label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .select(
            "label",
            "votes",
            r6(F.col("votes") / 10.0).alias("weight"),
        )
        .orderBy(F.desc("votes"), "label")
    )


@query(
    "q_ml_linreg_eval",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(l_quantity) AS sx,
               SUM(l_extendedprice) AS sy,
               SUM(l_quantity * l_quantity) AS sxx,
               SUM(l_quantity * l_extendedprice) AS sxy
        FROM lineitem
    ),
    w AS (
        SELECT ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) AS intercept
        FROM s
    ),
    r AS (
        SELECT l_extendedprice AS y,
               w.slope * l_quantity + w.intercept AS yhat,
               w.slope AS slope, w.intercept AS intercept
        FROM lineitem CROSS JOIN w
    ),
    m AS (SELECT AVG(y) AS ybar FROM r)
    SELECT MAX(r.slope) AS slope,
           MAX(r.intercept) AS intercept,
           ROUND(SQRT(SUM((r.y - r.yhat) * (r.y - r.yhat))
                      / COUNT(*)), 6) AS rmse,
           ROUND(1.0 - SUM((r.y - r.yhat) * (r.y - r.yhat))
                       / SUM((r.y - m.ybar) * (r.y - m.ybar)), 6) AS r2
    FROM r CROSS JOIN m
    """,
)
def q_ml_linreg_eval(spark, sf_dir):
    """TRAIN + EVALUATE simple OLS in one plan: the summation-form fit of
    q_ml_linreg_stats becomes a one-row weight aggregate (ROUNDED to 6 on
    both engines, the iter2 pattern), broadcast back over lineitem, and
    scored — RMSE and R² from centered residual sums. Residuals are
    O(1e3-1e4) per row, their squared sums ~1e12 but both RMSE and R² are
    RATIOS of same-order sums, restoring round-6 stability (the raw SSE
    would need rmil). Three passes over the fact, zero fact-side shuffles:
    fit agg, mean agg, residual agg."""
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    li = T(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    w = s.select(
        r6(slope).alias("slope"),
        r6((sy - slope * sx) / n).alias("intercept"),
    )
    ybar = li.agg(F.avg(y).alias("ybar"))
    resid = y - (F.col("slope") * x + F.col("intercept"))
    dev = y - F.col("ybar")
    return (
        li.crossJoin(F.broadcast(w))
        .crossJoin(F.broadcast(ybar))
        .agg(
            F.max("slope").alias("slope"),
            F.max("intercept").alias("intercept"),
            r6(
                F.sqrt(F.sum(resid * resid) / F.count(F.lit(1)))
            ).alias("rmse"),
            r6(1.0 - F.sum(resid * resid) / F.sum(dev * dev)).alias("r2"),
        )
    )


@query(
    "q_ml_logreg_predict",
    oracle="""
    WITH g1 AS (
        SELECT SUM(CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   AS grad0,
               SUM((CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   * (value / 100.0)) AS grad1
        FROM events
    ),
    w AS (
        SELECT ROUND(-0.1 * grad0, 6) AS w0, ROUND(-0.1 * grad1, 6) AS w1
        FROM g1
    ),
    p AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS actual,
               CASE WHEN 1.0 / (1.0 + EXP(-(w.w0 + w.w1 * (value / 100.0))))
                    > 0.5 THEN 1 ELSE 0 END AS pred
        FROM events CROSS JOIN w
    )
    SELECT actual, pred, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM p GROUP BY actual, pred
    """,
)
def q_ml_logreg_predict(spark, sf_dir):
    """Logistic-regression PREDICTION after one GD step: the step-1 weights
    (rounded, broadcast — the same in-plan parameter shipment as
    q_ml_logreg_iter2) score every event with σ(wᵀx) > 0.5 and the
    confusion matrix comes back as a 4-group aggregate. Together with
    q_ml_gnb_predict this closes the reference's train-then-classify loop
    for both of its classifier families. The 0.5 decision boundary on
    bitwise-identical weights and inputs cannot flip cross-engine."""
    yb = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    y = yb.cast("double")
    x1 = F.col("value") / 100.0
    ev = T(spark, sf_dir, "events")
    g1 = ev.agg(
        F.sum(0.5 - y).alias("grad0"),
        F.sum((0.5 - y) * x1).alias("grad1"),
    )
    w = g1.select(
        r6(-0.1 * F.col("grad0")).alias("w0"),
        r6(-0.1 * F.col("grad1")).alias("w1"),
    )
    sig = 1.0 / (1.0 + F.exp(-(F.col("w0") + F.col("w1") * x1)))
    return (
        ev.crossJoin(F.broadcast(w))
        .select(
            yb.alias("actual"),
            F.when(sig > 0.5, 1).otherwise(0).alias("pred"),
        )
        .groupBy("actual", "pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_ml_pca",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(value) AS sx,
               SUM(CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)) AS sy,
               SUM(value * value) AS sxx,
               SUM(value * CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)) AS sxy,
               SUM(CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)
                   * CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)) AS syy
        FROM events
    ),
    c AS (
        SELECT (sxx - sx * sx / n) / (n - 1) AS cxx,
               (sxy - sx * sy / n) / (n - 1) AS cxy,
               (syy - sy * sy / n) / (n - 1) AS cyy
        FROM s
    ),
    e AS (
        SELECT cxx, cxy, cyy,
               (cxx + cyy) / 2
                   + SQRT(((cxx - cyy) / 2) * ((cxx - cyy) / 2) + cxy * cxy)
                   AS l1,
               (cxx + cyy) / 2
                   - SQRT(((cxx - cyy) / 2) * ((cxx - cyy) / 2) + cxy * cxy)
                   AS l2
        FROM c
    )
    SELECT ROUND(cxx, 6) AS var_value,
           ROUND(cyy, 6) AS var_hour,
           ROUND(cxy, 6) AS cov,
           ROUND(l1, 6) AS lambda1,
           ROUND(l2, 6) AS lambda2,
           ROUND(l1 / (l1 + l2), 6) AS explained1,
           ROUND(DEGREES(ATAN2(l1 - cxx, cxy)), 6) AS pc1_angle_deg
    FROM e
    """,
)
def q_ml_pca(spark, sf_dir):
    """PCA on the 2-D feature matrix (value, hour(ts)): sample covariance
    from ONE summation-form pass (n, Σx, Σy, Σxx, Σxy, Σyy — the Chu et
    al. '06 pattern again), then the 2×2 symmetric eigenproblem solved in
    CLOSED FORM inside the plan (λ = mean ± sqrt(gap² + cov²), principal
    axis angle from atan2) — no iteration, no driver math, no collect. At
    100 TB the only distributed work is the single map-side-combined
    aggregate; everything after is constant-time scalar expressions on a
    1-row frame. Dividing the raw sums by n shrinks the ~2e-6 cross-engine
    accumulation noise by the row count, so round-6 is stable for every
    output (ARCHITECTURE.md rounding policy). For d ≫ 2 the same pass
    yields the Gram matrix and the eigensolve moves to numpy on the driver
    — d², not n, sized."""
    ev = T(spark, sf_dir, "events")
    x = F.col("value")
    y = F.hour("ts").cast("double")
    s = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    cxx = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    cxy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    cyy = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    c = s.select(cxx.alias("cxx"), cxy.alias("cxy"), cyy.alias("cyy"))
    mean = (F.col("cxx") + F.col("cyy")) / 2
    root = F.sqrt(
        ((F.col("cxx") - F.col("cyy")) / 2) ** 2 + F.col("cxy") ** 2
    )
    e = c.select(
        "cxx", "cxy", "cyy",
        (mean + root).alias("l1"),
        (mean - root).alias("l2"),
    )
    return e.select(
        r6(F.col("cxx")).alias("var_value"),
        r6(F.col("cyy")).alias("var_hour"),
        r6(F.col("cxy")).alias("cov"),
        r6(F.col("l1")).alias("lambda1"),
        r6(F.col("l2")).alias("lambda2"),
        r6(F.col("l1") / (F.col("l1") + F.col("l2"))).alias("explained1"),
        r6(
            F.degrees(F.atan2(F.col("l1") - F.col("cxx"), F.col("cxy")))
        ).alias("pc1_angle_deg"),
    )


@query(
    "q_ml_auc",
    oracle="""
    WITH g1 AS (
        SELECT SUM(CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   AS grad0,
               SUM((CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   * (value / 100.0)) AS grad1
        FROM events
    ),
    w AS (
        SELECT ROUND(-0.1 * grad0, 6) AS w0, ROUND(-0.1 * grad1, 6) AS w1
        FROM g1
    ),
    scored AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
               1.0 / (1.0 + EXP(-(w.w0 + w.w1 * (value / 100.0)))) AS score,
               event_id
        FROM events CROSS JOIN w
    ),
    ranked AS (
        SELECT label,
               ROW_NUMBER() OVER (ORDER BY score, event_id) AS rnk
        FROM scored
    )
    SELECT CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(SUM(1 - label) AS BIGINT) AS n_neg,
           ROUND((SUM(CASE WHEN label = 1 THEN CAST(rnk AS DOUBLE) END)
                  - SUM(label) * (SUM(label) + 1.0) / 2.0)
                 / (SUM(label) * SUM(1 - label)), 6) AS auc
    FROM ranked
    """,
)
def q_ml_auc(spark, sf_dir):
    """ROC AUC of the one-step logistic scores via the Mann-Whitney rank
    statistic: AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻). Ranks come from
    row_number over (score, event_id) — the explicit unique tie-break makes
    the statistic a pure function of the data, identical on both engines
    (bitwise-equal scores from bitwise-equal weights). Rank sums are exact
    integers; only the final ratio rounds. The global sort is the cost at
    scale — the production path replaces exact ranks with a fixed-width
    score histogram (trapezoidal AUC over bins, one aggregate, no sort);
    this query is the exact baseline for that approximation."""
    yb = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    y = yb.cast("double")
    x1 = F.col("value") / 100.0
    ev = T(spark, sf_dir, "events")
    g1 = ev.agg(
        F.sum(0.5 - y).alias("grad0"),
        F.sum((0.5 - y) * x1).alias("grad1"),
    )
    w = g1.select(
        r6(-0.1 * F.col("grad0")).alias("w0"),
        r6(-0.1 * F.col("grad1")).alias("w1"),
    )
    sig = 1.0 / (1.0 + F.exp(-(F.col("w0") + F.col("w1") * x1)))
    from pyspark.sql import Window

    scored = ev.crossJoin(F.broadcast(w)).select(
        yb.alias("label"), sig.alias("score"), "event_id"
    )
    ranked = scored.select(
        "label",
        F.row_number()
        .over(Window.orderBy("score", "event_id"))
        .cast("double")
        .alias("rnk"),
    )
    lbl = F.col("label")
    npos = F.sum(lbl.cast("double"))
    nneg = F.sum(1.0 - lbl)
    return ranked.agg(
        npos.cast("bigint").alias("n_pos"),
        nneg.cast("bigint").alias("n_neg"),
        r6(
            (F.sum(F.when(lbl == 1, F.col("rnk"))) - npos * (npos + 1.0) / 2.0)
            / (npos * nneg)
        ).alias("auc"),
    )


@query(
    "q_ml_perceptron",
    oracle="""
    WITH m AS (
        SELECT CASE WHEN event_type = 'purchase' THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(-1.0 AS DOUBLE) END AS y,
               value / 100.0 AS x1
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_misclassified,
           ROUND(0.1 * SUM(y), 6) AS delta_w0,
           ROUND(0.1 * SUM(y * x1), 6) AS delta_w1
    FROM m
    WHERE y * (0.05 + 0.1 * x1) <= 0
    """,
)
def q_ml_perceptron(spark, sf_dir):
    """One perceptron update in summation form: with fixed weights
    w=(0.05, 0.1) over features (1, value/100), every event with margin
    y·(wᵀx) ≤ 0 is misclassified and contributes η·y·x to the batch
    update (η=0.1). One filtered aggregate — the whole step ships three
    numbers, never rows, exactly how the reference's gradient jobs emit
    per-mapper partial sums. The margin sign on bitwise-identical inputs
    cannot flip cross-engine; Σy is integer-exact and Σy·x1 is magnitude
    ~1e3, far inside round-6 stability."""
    ev = T(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(-1.0)
    x1 = F.col("value") / 100.0
    return (
        ev.select(y.alias("y"), x1.alias("x1"))
        .filter(F.col("y") * (0.05 + 0.1 * F.col("x1")) <= 0)
        .agg(
            F.count(F.lit(1)).alias("n_misclassified"),
            r6(0.1 * F.sum("y")).alias("delta_w0"),
            r6(0.1 * F.sum(F.col("y") * F.col("x1"))).alias("delta_w1"),
        )
    )


@query(
    "q_ml_crossval",
    oracle="""
    WITH f AS (
        SELECT l_quantity AS x, l_extendedprice AS y,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
                    || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 5 AS fold
        FROM lineitem
    ),
    s AS (
        SELECT fold, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx,
               SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM f GROUP BY fold
    ),
    t AS (
        SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
               SUM(sxx) AS tsxx, SUM(sxy) AS tsxy
        FROM s
    ),
    p AS (
        SELECT fold,
               ROUND(((tn - n) * (tsxy - sxy) - (tsx - sx) * (tsy - sy))
                     / ((tn - n) * (tsxx - sxx) - (tsx - sx) * (tsx - sx)),
                     6) AS slope,
               ROUND(((tsy - sy)
                      - ((tn - n) * (tsxy - sxy) - (tsx - sx) * (tsy - sy))
                        / ((tn - n) * (tsxx - sxx) - (tsx - sx) * (tsx - sx))
                        * (tsx - sx)) / (tn - n), 6) AS intercept
        FROM s CROSS JOIN t
    )
    SELECT f.fold, p.slope, p.intercept,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(SQRT(SUM((f.y - (p.slope * f.x + p.intercept))
                          * (f.y - (p.slope * f.x + p.intercept)))
                      / COUNT(*)), 6) AS rmse
    FROM f JOIN p ON f.fold = p.fold
    GROUP BY f.fold, p.slope, p.intercept
    ORDER BY f.fold
    """,
)
def q_ml_crossval(spark, sf_dir):
    """5-fold cross-validation of the OLS model in ONE plan — the showcase
    of summation-form composability: per-fold sufficient statistics are
    computed once (5 rows × 5 numbers), each fold's TRAINING stats are the
    algebraic complement (total − fold) so no row is ever read twice for
    training, and the held-out RMSE pass joins 5 broadcast parameter rows
    back to the fact. Fold assignment is the reproducible md5 bucket of the
    unique (orderkey, linenumber) row key — rerun- and
    relayout-stable, like every split in this engine. ONE fact pass
    total (optimization r13; was stats + a second held-out eval scan):
    with sum(y²) added to the per-fold statistics, the held-out RMSE is
    itself a closed form of the fold's own sufficient statistics and its
    complement-trained params — Σ(y−sx−i)² = syy − 2s·sxy − 2i·sy +
    s²·sxx + 2si·sx + i²·n — so the eval "pass" is scalar math on the
    5-row stats frame (guide §2.3: the aggregate already contained the
    answer). The reference would run 10 MapReduce jobs (5 trains +
    5 tests) over the same bytes. Params round-6 before scoring on both
    engines (the iter2 pattern) so the residual polynomial is evaluated
    from bitwise-identical coefficients. FP honesty: the closed form
    cancels ~2 decimal digits (syy ≈ 1e15 down to Σresid² ≈ 1e13), so
    it sits ~1e-11 off the oracle's per-row sum — measured against the
    round-6 grid the nearest boundary is ≥ 3.5e-8 away on every fold at
    sf0.001/0.01/0.1 (≥ 2,000× the delta, evidence in
    OPTIMIZATION_r13.md); parity re-proven under all four layout
    modes."""
    li = T(spark, sf_dir, "lineitem")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("l_orderkey").cast("string"),
                        F.lit("|"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    f = li.select(
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
        fold.alias("fold"),
    )
    # materialize the 5-row stats frame: it feeds t, p and (via p) the eval
    # join, and Catalyst performs no cross-subtree CSE — without this the
    # physical plan scans the fact table 6×, not the 2 passes the design
    # promises (pinned by test_crossval_two_fact_scans_and_broadcast_params)
    s = f.groupBy("fold").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).transform(_ckpt)
    t = s.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    trn = F.col("tn") - F.col("n")
    trx = F.col("tsx") - F.col("sx")
    try_ = F.col("tsy") - F.col("sy")
    trxx = F.col("tsxx") - F.col("sxx")
    trxy = F.col("tsxy") - F.col("sxy")
    slope = (trn * trxy - trx * try_) / (trn * trxx - trx * trx)
    p = s.crossJoin(F.broadcast(t)).select(
        "fold",
        r6(slope).alias("slope"),
        r6((try_ - slope * trx) / trn).alias("intercept"),
    )
    # held-out Σ(y − s·x − i)² expanded over the fold's own sufficient
    # statistics — no second fact scan (docstring: FP margin evidence)
    sl, ic = F.col("slope"), F.col("intercept")
    ss_resid = (
        F.col("syy")
        - 2 * sl * F.col("sxy")
        - 2 * ic * F.col("sy")
        + sl * sl * F.col("sxx")
        + 2 * sl * ic * F.col("sx")
        + ic * ic * F.col("n")
    )
    return (
        p.join(s, "fold")
        .select(
            "fold",
            "slope",
            "intercept",
            F.col("n").cast("bigint").alias("n_test"),
            # clamp at 0 (ADVICE r13): the expansion cancels ~2 decimal
            # digits, and under a near-perfect fit the true Σresid² → 0
            # can land an ulp NEGATIVE, turning sqrt into NaN; the clamp
            # is a no-op whenever the value is representable (≥ 0 by
            # definition) and the documented ≥2000× margin to the round-6
            # grid covers every nonzero case. Re-check that margin when
            # fixture scale factors change (docstring).
            r6(F.sqrt(F.greatest(ss_resid, F.lit(0.0)) / F.col("n"))).alias(
                "rmse"
            ),
        )
        .orderBy("fold")
    )


@query(
    "q_ml_feature_hash",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT UNNEST(string_split(text, ' ')) AS token
        FROM documents
    ),
    b AS (
        SELECT token,
               CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16
                   AS bucket
        FROM tok
    ),
    load AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM b GROUP BY bucket
    )
    SELECT n_tokens AS bucket_load,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM load GROUP BY n_tokens
    ORDER BY bucket_load
    """,
)
def q_ml_feature_hash(spark, sf_dir):
    """The hashing trick's collision audit: vocabulary → md5 % 16 feature
    buckets, reported as the bucket-load histogram (how many buckets carry
    k distinct tokens). This is the kernel that lets a 100 TB text model
    use a FIXED-width feature vector with no vocabulary dictionary — and
    the audit tells you the collision rate that width costs. The md5 bucket
    is the engine's standard reproducible hash (identical hex both
    engines); work after the distinct-token agg is |vocab|-sized."""
    tok = (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("bigint") % 16
    )
    load = (
        tok.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    return (
        load.groupBy(F.col("n_tokens").alias("bucket_load"))
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("bucket_load")
    )


@query(
    "q_ml_auc_binned",
    oracle="""
    WITH g1 AS (
        SELECT SUM(CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   AS grad0,
               SUM((CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   * (value / 100.0)) AS grad1
        FROM events
    ),
    w AS (
        SELECT ROUND(-0.1 * grad0, 6) AS w0, ROUND(-0.1 * grad1, 6) AS w1
        FROM g1
    ),
    z AS (
        SELECT w.w0 + w.w1 * (value / 100.0) AS margin,
               CASE WHEN event_type = 'purchase' THEN CAST(1 AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS pos
        FROM events CROSS JOIN w
    ),
    rng AS (SELECT MIN(margin) AS lo, MAX(margin) AS hi FROM z),
    binned AS (
        SELECT LEAST(CAST(FLOOR((z.margin - rng.lo) / (rng.hi - rng.lo)
                   * 100) AS BIGINT), 99) AS bin,
               pos
        FROM z CROSS JOIN rng
    ),
    bins AS (
        SELECT bin, SUM(pos) AS npos, SUM(1 - pos) AS nneg
        FROM binned GROUP BY bin
    ),
    cum AS (
        SELECT bin, npos, nneg,
               COALESCE(SUM(nneg) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS neg_below
        FROM bins
    )
    SELECT CAST(SUM(npos) AS BIGINT) AS n_pos,
           CAST(SUM(nneg) AS BIGINT) AS n_neg,
           ROUND(SUM(npos * (neg_below + nneg / 2))
                 / (SUM(npos) * SUM(nneg)), 6) AS auc_binned
    FROM cum
    """,
)
def q_ml_auc_binned(spark, sf_dir):
    """The SCALE path for q_ml_auc: decision margins quantized into 100
    min-max bins, AUC from the bin histogram via the midpoint (trapezoidal)
    rule — Σ pos_b·(neg_below + neg_b/2) / (n⁺n⁻). The MARGIN is binned,
    not σ(margin): AUC only uses the ordering, which the sigmoid preserves,
    and the one-step weights are large enough that σ saturates (every score
    in one bin) while the margin spreads informatively. No global sort: a
    min/max scalar pass, one 100-group aggregate (map-side combined) and a
    window over 100 rows — constant post-scan cost at any corpus size.
    Margins are bitwise-identical on both engines, so binning cannot
    disagree; the histogram is exact-integer. Compare q_ml_auc for the
    exact rank statistic this approximates (~1e-3 apart at 100 bins) —
    the trade every production evaluator makes."""
    yb = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    y = yb.cast("double")
    x1 = F.col("value") / 100.0
    ev = T(spark, sf_dir, "events")
    g1 = ev.agg(
        F.sum(0.5 - y).alias("grad0"),
        F.sum((0.5 - y) * x1).alias("grad1"),
    )
    # 1-row weight frame; the margin pass replays per consumer (range +
    # binning — the honest two-pass binning floor), and without the
    # checkpoint each replay re-ran the gradient pass too
    w = _ckpt(
        g1.select(
            r6(-0.1 * F.col("grad0")).alias("w0"),
            r6(-0.1 * F.col("grad1")).alias("w1"),
        )
    )
    z = ev.crossJoin(F.broadcast(w)).select(
        (F.col("w0") + F.col("w1") * x1).alias("margin"), y.alias("pos")
    )
    rng = z.agg(F.min("margin").alias("lo"), F.max("margin").alias("hi"))
    binned = z.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("margin") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 100
            ).cast("bigint"),
            F.lit(99),
        ).alias("bin"),
        "pos",
    )
    bins = binned.groupBy("bin").agg(
        F.sum("pos").alias("npos"), F.sum(1.0 - F.col("pos")).alias("nneg")
    )
    from pyspark.sql import Window

    wcum = (
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = bins.withColumn(
        "neg_below", F.coalesce(F.sum("nneg").over(wcum), F.lit(0.0))
    )
    return cum.agg(
        F.sum("npos").cast("bigint").alias("n_pos"),
        F.sum("nneg").cast("bigint").alias("n_neg"),
        r6(
            F.sum(F.col("npos") * (F.col("neg_below") + F.col("nneg") / 2))
            / (F.sum("npos") * F.sum("nneg"))
        ).alias("auc_binned"),
    )


@query(
    "q_ml_als_step",
    oracle="""
    WITH r AS (
        SELECT user_id, event_type,
               CAST(COUNT(*) AS DOUBLE) AS rating
        FROM events GROUP BY user_id, event_type
    ),
    v0 AS (
        SELECT event_type,
               CAST(LENGTH(event_type) AS DOUBLE) / 10 AS v
        FROM (SELECT DISTINCT event_type FROM events)
    ),
    u AS (
        SELECT user_id,
               SUM(rating * v) / SUM(v * v) AS u
        FROM r JOIN v0 USING (event_type)
        GROUP BY user_id
    )
    SELECT event_type,
           ROUND(MAX(v), 6) AS v_init,
           ROUND(SUM(rating * u) / SUM(u * u), 6) AS v_next,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM r JOIN v0 USING (event_type) JOIN u USING (user_id)
    GROUP BY event_type
    """,
)
def q_ml_als_step(spark, sf_dir):
    """One full alternation of rank-1 ALS on the implicit (user ×
    event_type) ratings matrix (rating = interaction count): fix
    deterministic item factors v₀ (name-length seeded — no rand()), solve
    every user factor in closed form uᵢ = Σⱼrᵢⱼvⱼ / Σⱼvⱼ², then re-solve
    the item factors vⱼ = Σᵢrᵢⱼuᵢ / Σᵢuᵢ² — the matrix-factorization
    recommender kernel in its summation form. Plans as: one fact agg keyed
    (user, type) [the only corpus-sized shuffle], a broadcast 5-row factor
    join, a user-keyed agg (|users| rows), and a 5-group re-agg — each
    ALS half-step ships factors, never ratings, exactly how distributed
    ALS scales. Ratings are exact integers; factors are ratios of
    identically-accumulated sums, round-6 stable."""
    ev = T(spark, sf_dir, "events")
    r = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("rating")
    )
    v0 = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.length("event_type").cast("double") / 10).alias("v"),
        )
    )
    # the ratings×factors matrix both ALS half-steps read — checkpointed
    # so the user solve and the item re-solve share one fact-table pass.
    # NB rv is the AGGREGATED ratings matrix (one row per (user, type)
    # pair, ≤ |types|·|users| ≪ |events|), not the raw fact table:
    # persisting the ratings and shipping only factors between half-steps
    # is the standard distributed-ALS memory shape
    rv = _ckpt(r.join(F.broadcast(v0), "event_type"))
    u = rv.groupBy("user_id").agg(
        (
            F.sum(F.col("rating") * F.col("v"))
            / F.sum(F.col("v") * F.col("v"))
        ).alias("u")
    )
    return (
        rv.join(u, "user_id")
        .groupBy("event_type")
        .agg(
            r6(F.max("v")).alias("v_init"),
            r6(
                F.sum(F.col("rating") * F.col("u"))
                / F.sum(F.col("u") * F.col("u"))
            ).alias("v_next"),
            F.count(F.lit(1)).alias("n_users"),
        )
    )


@query(
    "q_ml_nb_multinomial",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    cnt AS (
        SELECT lang AS clang, tok, CAST(COUNT(*) AS DOUBLE) AS c
        FROM tok GROUP BY clang, tok
    ),
    tot AS (
        SELECT lang AS tlang, CAST(COUNT(*) AS DOUBLE) AS t
        FROM tok GROUP BY tlang
    ),
    vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v FROM tok),
    prior AS (
        SELECT lang AS plang, CAST(COUNT(*) AS DOUBLE) AS nd
        FROM documents GROUP BY plang
    ),
    ntot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    test AS (
        SELECT doc_id, lang AS actual, tok, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok WHERE doc_id < 100 GROUP BY doc_id, actual, tok
    ),
    scored AS (
        SELECT t.doc_id, t.actual, p.plang AS cand,
               ROUND(LN(p.nd / ntot.n)
                     + SUM(t.tf * LN((COALESCE(c.c, 0) + 1.0)
                                     / (tt.t + vocab.v))), 6) AS score
        FROM test t
        CROSS JOIN prior p
        CROSS JOIN ntot
        CROSS JOIN vocab
        JOIN tot tt ON tt.tlang = p.plang
        LEFT JOIN cnt c ON c.clang = p.plang AND c.tok = t.tok
        GROUP BY t.doc_id, t.actual, p.plang, p.nd, ntot.n, tt.t, vocab.v
    ),
    pred AS (
        SELECT doc_id, actual, cand,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rn
        FROM scored
    )
    SELECT actual AS lang, cand AS predicted,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pred WHERE rn = 1
    GROUP BY lang, predicted
    """,
)
def q_ml_nb_multinomial(spark, sf_dir):
    """Multinomial Naive Bayes, trained AND applied in one plan — the
    token-count variant of the reference's naive-Bayes job [SURVEY §1.1]:
    train per-language token likelihoods with Laplace smoothing over the
    whole corpus, score docs 0–99 against all five languages, predict the
    argmax, and output the language confusion matrix. The sparse-scoring
    shape is the part that scales: a doc is scored only on tokens it
    CONTAINS (tf ⋈ per-class counts on (class, token) — never a dense
    doc × vocab product), while the model side (class priors, totals,
    vocabulary size, and the |V|·|classes| count table) stays broadcast-
    small. Unseen-token mass is handled by scoring tf against
    COALESCE(c,0)+1. All five languages share one 31-token vocabulary in
    this corpus, so scores separate on frequency profile only — per-doc
    scores are ROUNDED to 6 places on both engines before the (score DESC,
    lang) argmax, putting FP summation-order noise (~1e-11 on magnitudes
    ~1e2) far below the decision grid."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    # one (lang, token) count frame — |classes|·|vocab| rows, the model
    # itself — materialized once; the class totals and vocabulary size are
    # aggregates OF THE MODEL, so the corpus explode runs once for
    # training instead of three times
    cnt = (
        tok.groupBy(F.col("lang").alias("clang"), "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .transform(_ckpt)
    )
    tot = cnt.groupBy(F.col("clang").alias("tlang")).agg(
        F.sum("c").alias("t")
    )
    vocab = cnt.agg(
        F.countDistinct("tok").cast("double").alias("v")
    )
    prior = d.groupBy(F.col("lang").alias("plang")).agg(
        F.count(F.lit(1)).cast("double").alias("nd")
    )
    ntot = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    test = (
        tok.filter(F.col("doc_id") < 100)
        .groupBy("doc_id", F.col("lang").alias("actual"), "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    scored = (
        test.crossJoin(F.broadcast(prior))
        .crossJoin(F.broadcast(ntot))
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(tot), F.col("tlang") == F.col("plang"))
        .join(
            F.broadcast(cnt),
            (F.col("clang") == F.col("plang")) & (cnt.tok == test.tok),
            "left",
        )
        .groupBy(
            "doc_id", "actual", F.col("plang").alias("cand"),
            "nd", "n", "t", "v",
        )
        .agg(
            F.sum(
                F.col("tf")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0.0)) + 1.0)
                    / (F.col("t") + F.col("v"))
                )
            ).alias("ll")
        )
        .select(
            "doc_id",
            "actual",
            "cand",
            r6(F.log(F.col("nd") / F.col("n")) + F.col("ll")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(
            F.col("actual").alias("lang"),
            F.col("cand").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_ml_tree_split",
    oracle="""
    WITH h AS (
        SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bin,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS pos
        FROM events GROUP BY bin
    ),
    cum AS (
        SELECT bin,
               SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS nl,
               SUM(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS posl
        FROM h
    ),
    tot AS (
        SELECT SUM(n) AS n_tot, SUM(pos) AS pos_tot, MAX(bin) AS max_bin
        FROM h
    ),
    s AS (
        SELECT CAST((bin + 1) * 25.0 AS DOUBLE) AS threshold,
               CAST(nl AS BIGINT) AS n_left,
               CAST(n_tot - nl AS BIGINT) AS n_right,
               posl / CAST(nl AS DOUBLE) AS pl,
               (pos_tot - posl) / CAST(n_tot - nl AS DOUBLE) AS pr,
               nl / CAST(n_tot AS DOUBLE) AS wl,
               (n_tot - nl) / CAST(n_tot AS DOUBLE) AS wr
        FROM cum CROSS JOIN tot
        WHERE bin < max_bin
    )
    SELECT threshold, n_left, n_right,
           ROUND(wl * 2 * pl * (1 - pl) + wr * 2 * pr * (1 - pr), 6)
               AS gini_split
    FROM s
    """,
)
def q_ml_tree_split(spark, sf_dir):
    """Distributed decision-stump split finding — the PLANET pattern
    (Panda et al., VLDB'09) that scales tree induction: mappers build a
    per-bin class histogram of the feature (value, 25-wide equal bins,
    label = purchase), and the split scan runs over the TINY histogram, not
    the data — cumulative left/right class counts at every bin boundary
    give the weighted Gini impurity of each candidate threshold. One
    map-side-combined aggregation over the fact table; then a ~20-row
    window. At 100 TB the histogram stays ~20 rows per (node, feature) —
    this is why binned split finding is the scalable formulation. All
    counts are exact integers; Gini is a round-6 ratio of exact integers.
    The best split is the row minimizing gini_split; all candidates are
    returned so the caller (a tree-growing driver loop) picks per node."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    h = (
        ev.select(
            F.floor(F.col("value") / 25).cast("bigint").alias("bin"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("is_pos"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_pos").alias("pos"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "bin",
        F.sum("n").over(w).alias("nl"),
        F.sum("pos").over(w).alias("posl"),
    )
    tot = h.agg(
        F.sum("n").alias("n_tot"),
        F.sum("pos").alias("pos_tot"),
        F.max("bin").alias("max_bin"),
    )
    s = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("bin") < F.col("max_bin"))
        .select(
            ((F.col("bin") + 1) * 25.0).alias("threshold"),
            F.col("nl").alias("n_left"),
            (F.col("n_tot") - F.col("nl")).alias("n_right"),
            (F.col("posl") / F.col("nl").cast("double")).alias("pl"),
            (
                (F.col("pos_tot") - F.col("posl"))
                / (F.col("n_tot") - F.col("nl")).cast("double")
            ).alias("pr"),
            (F.col("nl") / F.col("n_tot").cast("double")).alias("wl"),
            (
                (F.col("n_tot") - F.col("nl"))
                / F.col("n_tot").cast("double")
            ).alias("wr"),
        )
    )
    return s.select(
        "threshold",
        "n_left",
        "n_right",
        r6(
            F.col("wl") * 2 * F.col("pl") * (1 - F.col("pl"))
            + F.col("wr") * 2 * F.col("pr") * (1 - F.col("pr"))
        ).alias("gini_split"),
    )


@query(
    "q_ml_kmeans_init",
    oracle="""
    WITH pts AS (
        SELECT event_id, value AS x,
               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS y
        FROM events
    ),
    c0 AS (SELECT x, y FROM pts ORDER BY event_id LIMIT 1),
    d0 AS (
        SELECT p.event_id, p.x, p.y,
               (p.x - c0.x) * (p.x - c0.x)
             + (p.y - c0.y) * (p.y - c0.y) AS dist
        FROM pts p CROSS JOIN c0
    ),
    c1 AS (SELECT x, y FROM d0 ORDER BY dist DESC, event_id LIMIT 1),
    d1 AS (
        SELECT d0.event_id, d0.x, d0.y,
               LEAST(d0.dist,
                     (d0.x - c1.x) * (d0.x - c1.x)
                   + (d0.y - c1.y) * (d0.y - c1.y)) AS dist
        FROM d0 CROSS JOIN c1
    ),
    c2 AS (SELECT x, y FROM d1 ORDER BY dist DESC, event_id LIMIT 1)
    SELECT 0 AS step, ROUND(x, 6) AS cx, ROUND(y, 6) AS cy FROM c0
    UNION ALL
    SELECT 1, ROUND(x, 6), ROUND(y, 6) FROM c1
    UNION ALL
    SELECT 2, ROUND(x, 6), ROUND(y, 6) FROM c2
    """,
)
def q_ml_kmeans_init(spark, sf_dir):
    """Deterministic farthest-point (maximin) k-means initialization, k=3,
    on the (value, hour) plane — the derandomized cousin of k-means++ (and
    of k-means∥, Bahmani et al., VLDB'12, which samples where this takes
    the argmax): c0 = the point with the lowest event_id, then each next
    centroid is the point maximizing its distance to the nearest chosen
    centroid, ties broken by event_id. Each round is one broadcast of the
    ≤k chosen centroids + one TakeOrdered pass over the points — k passes
    total, no shuffle of the fact table, the exact plan shape an iterative
    driver would run at scale (here unrolled for k=3 into one plan).
    Distances are identical double expressions of identical inputs on both
    engines, so the argmax rows match bit-for-bit; output coordinates are
    round-6."""
    ev = T(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.col("value").alias("x"),
        F.hour("ts").cast("double").alias("y"),
    )
    # each 1-row centroid frame is consumed TWICE (next distance pass +
    # output row), and uncached consumers re-run the whole upstream
    # argmax pass — the plan scanned events 7× instead of the docstring's
    # k passes (measured round 4). Checkpointing the 1-row frames
    # restores one pass per round.
    c0 = _ckpt(
        pts.orderBy("event_id")
        .limit(1)
        .select(F.col("x").alias("c0x"), F.col("y").alias("c0y"))
    )
    d0 = pts.crossJoin(F.broadcast(c0)).select(
        "event_id",
        "x",
        "y",
        (
            (F.col("x") - F.col("c0x")) * (F.col("x") - F.col("c0x"))
            + (F.col("y") - F.col("c0y")) * (F.col("y") - F.col("c0y"))
        ).alias("dist"),
    )
    c1 = _ckpt(
        d0.orderBy(F.col("dist").desc(), "event_id")
        .limit(1)
        .select(F.col("x").alias("c1x"), F.col("y").alias("c1y"))
    )
    d1 = d0.crossJoin(F.broadcast(c1)).select(
        "event_id",
        "x",
        "y",
        F.least(
            F.col("dist"),
            (F.col("x") - F.col("c1x")) * (F.col("x") - F.col("c1x"))
            + (F.col("y") - F.col("c1y")) * (F.col("y") - F.col("c1y")),
        ).alias("dist"),
    )
    c2 = _ckpt(
        d1.orderBy(F.col("dist").desc(), "event_id")
        .limit(1)
        .select(F.col("x").alias("c2x"), F.col("y").alias("c2y"))
    )
    out0 = c0.select(
        F.lit(0).alias("step"),
        F.round("c0x", 6).alias("cx"),
        F.round("c0y", 6).alias("cy"),
    )
    out1 = c1.select(
        F.lit(1).alias("step"),
        F.round("c1x", 6).alias("cx"),
        F.round("c1y", 6).alias("cy"),
    )
    out2 = c2.select(
        F.lit(2).alias("step"),
        F.round("c2x", 6).alias("cx"),
        F.round("c2y", 6).alias("cy"),
    )
    return out0.unionByName(out1).unionByName(out2)


@query(
    "q_ml_eval_metrics",
    oracle="""
    WITH c AS (
        SELECT
            SUM(CASE WHEN value > 100 AND event_type = 'purchase'
                     THEN 1 ELSE 0 END) AS tp,
            SUM(CASE WHEN value > 100 AND event_type <> 'purchase'
                     THEN 1 ELSE 0 END) AS fp,
            SUM(CASE WHEN value <= 100 AND event_type = 'purchase'
                     THEN 1 ELSE 0 END) AS fn,
            SUM(CASE WHEN value <= 100 AND event_type <> 'purchase'
                     THEN 1 ELSE 0 END) AS tn
        FROM events
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           ROUND((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
               AS accuracy,
           ROUND(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
           ROUND(tp / CAST(tp + fn AS DOUBLE), 6) AS recall,
           ROUND(2.0 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
    FROM c
    """,
)
def q_ml_eval_metrics(spark, sf_dir):
    """Classifier evaluation — the metric kernel that closes the train →
    predict → EVALUATE loop around the ML surface (AUC lives in q_ml_auc;
    this is the thresholded-prediction family): confusion counts for the
    fixed rule `predict purchase iff value > 100`, then accuracy /
    precision / recall / F1. The distributed part is ONE conditional-sum
    aggregate — four integers are the complete sufficient statistics, so at
    100 TB evaluation costs a single map-side-combined pass regardless of
    model or data size; the metric algebra is constant-time on those four
    numbers (kept in-plan here so the oracle checks it too). Counts exact;
    metrics are round-6 ratios of exact integers."""
    ev = T(spark, sf_dir, "events")
    pred = F.col("value") > 100
    actual = F.col("event_type") == "purchase"
    c = ev.agg(
        F.sum(F.when(pred & actual, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~actual, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & actual, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & ~actual, 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        r6((tp + tn) / (tp + fp + fn + tn).cast("double")).alias("accuracy"),
        r6(tp / (tp + fp).cast("double")).alias("precision"),
        r6(tp / (tp + fn).cast("double")).alias("recall"),
        r6(2.0 * tp / (2 * tp + fp + fn).cast("double")).alias("f1"),
    )


@query(
    "q_ml_calibration",
    oracle="""
    WITH p AS (
        SELECT 1.0 / (1.0 + EXP(-(-1.5 + 0.8 * value / 100.0))) AS prob,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events
    )
    SELECT CAST(FLOOR(prob * 10) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(prob), 6) AS avg_predicted,
           ROUND(AVG(y), 6) AS observed_rate,
           ROUND(ABS(AVG(prob) - AVG(y)), 6) AS calibration_gap
    FROM p GROUP BY bin
    """,
)
def q_ml_calibration(spark, sf_dir):
    """Probability-calibration (reliability) curve — the third leg of the
    evaluation surface beside ranking (q_ml_auc) and thresholded metrics
    (q_ml_eval_metrics): score every event with the fixed logistic model
    σ(−1.5 + 0.8·value/100), bucket predictions into 10 probability bins,
    and compare mean predicted probability against the observed purchase
    rate per bin (the per-bin |gap| is what ECE sums). One map-side scoring
    expression + one tiny aggregate — at 100 TB calibration costs a single
    pass, like every sufficient-statistics kernel here. The σ formula is
    textually identical on both engines; bin edges are FLOOR on a smooth
    double (boundary flips need ~1e-16 coincidences — the accepted
    q_text_quality pattern); outputs are round-6."""
    ev = T(spark, sf_dir, "events")
    prob = 1.0 / (1.0 + F.exp(-(-1.5 + 0.8 * F.col("value") / 100.0)))
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    p = ev.select(prob.alias("prob"), y.alias("y"))
    return (
        p.groupBy(F.floor(F.col("prob") * 10).cast("bigint").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.avg("prob")).alias("avg_predicted"),
            r6(F.avg("y")).alias("observed_rate"),
            r6(F.abs(F.avg("prob") - F.avg("y"))).alias("calibration_gap"),
        )
    )


@query(
    "q_ml_cluster_quality",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(UNNEST(embedding) AS DOUBLE) AS val
        FROM embeddings
    ),
    cent AS (
        SELECT label, dim, AVG(val) AS c
        FROM ex GROUP BY label, dim
    ),
    dist_row AS (
        SELECT ex.vec_id, ex.label,
               SUM(POW(ex.val - cent.c, 2)) AS d2
        FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
        GROUP BY ex.vec_id, ex.label
    ),
    intra AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               AVG(SQRT(d2)) AS mean_intra
        FROM dist_row GROUP BY label
    ),
    cc AS (
        SELECT a.label AS la, b.label AS lb,
               SQRT(SUM(POW(a.c - b.c, 2))) AS cdist
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
        GROUP BY a.label, b.label
    ),
    nearest AS (
        SELECT la AS label, MIN(cdist) AS nearest_centroid
        FROM cc GROUP BY la
    )
    SELECT i.label, i.n_vecs,
           ROUND(i.mean_intra, 6) AS mean_intra,
           ROUND(n.nearest_centroid, 6) AS nearest_centroid,
           ROUND(n.nearest_centroid / i.mean_intra, 6) AS separation
    FROM intra i JOIN nearest n ON i.label = n.label
    """,
)
def q_ml_cluster_quality(spark, sf_dir):
    """Cluster-separability report over the embedding space — the
    evaluation companion to the k-means family: per label, the mean L2
    distance of members to their label centroid (cohesion), the distance to
    the nearest other centroid (separation), and their ratio (a
    Dunn-/silhouette-style index; > 1 ⟹ clusters are farther apart than
    they are wide). The scalable shape is the dimension-exploded form:
    centroids are a (label, dim)-keyed AVG — a map-side-combined aggregate
    whose state is |labels|·dim cells regardless of row count — and
    per-row distances come from joining the BROADCAST centroid table back
    (at 100 TB the explode is the column-to-row pivot Tungsten handles in
    codegen; the alternative fold over array columns computes the same sums
    JVM-side — see q_llm_multimodal — but the exploded form shares the
    centroid join). Float→double widening is exact on both engines;
    centroid components differ only by summation-order ulps, washed out by
    round-6 on O(1) magnitudes."""
    em = T(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "valf"),
    ).select("vec_id", "label", "dim", F.col("valf").cast("double").alias("val"))
    # |labels|·dim cells, consumed by the member-distance join and both
    # centroid-pair sides — uncached, each consumer re-derived it from a
    # fresh embeddings explode (4 scans measured round 4; 2 with this:
    # the exploded frame itself stays unpersisted, fact-scans are the
    # map-shaped part)
    cent = _ckpt(ex.groupBy("label", "dim").agg(F.avg("val").alias("c")))
    dist_row = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.pow(F.col("val") - F.col("c"), 2)).alias("d2"))
    )
    intra = dist_row.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.avg(F.sqrt("d2")).alias("mean_intra"),
    )
    a = cent.select(
        F.col("label").alias("la"), "dim", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("lb"), F.col("dim").alias("dimb"),
        F.col("c").alias("cb"),
    )
    cc = (
        a.join(
            F.broadcast(b),
            (F.col("dim") == F.col("dimb")) & (F.col("la") != F.col("lb")),
        )
        .groupBy("la", "lb")
        .agg(F.sqrt(F.sum(F.pow(F.col("ca") - F.col("cb"), 2))).alias("cdist"))
    )
    nearest = cc.groupBy(F.col("la").alias("label")).agg(
        F.min("cdist").alias("nearest_centroid")
    )
    return (
        intra.join(F.broadcast(nearest), "label")
        .select(
            "label",
            "n_vecs",
            r6("mean_intra").alias("mean_intra"),
            r6("nearest_centroid").alias("nearest_centroid"),
            r6(F.col("nearest_centroid") / F.col("mean_intra")).alias(
                "separation"
            ),
        )
    )


@query(
    "q_ml_logreg_newton",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(value / 100.0) AS sv,
               SUM((value / 100.0) * (value / 100.0)) AS svv,
               SUM(CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   AS g0,
               SUM((CAST(0.5 AS DOUBLE)
                   - CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
                   * (value / 100.0)) AS g1
        FROM events
    ), h AS (
        SELECT g0, g1,
               0.25 * n AS h00, 0.25 * sv AS h01, 0.25 * svv AS h11
        FROM s
    )
    SELECT ROUND(g0, 6) AS grad_0,
           ROUND(g1, 6) AS grad_1,
           ROUND(-(h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01), 6)
               AS w0_next,
           ROUND(-(h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01), 6)
               AS w1_next
    FROM h
    """,
)
def q_ml_logreg_newton(spark, sf_dir):
    """One Newton-Raphson step for logistic regression from w = 0 — the
    second-order sibling of ``q_ml_logreg_grad``. At w = 0 every σ is 0.5, so
    the Hessian collapses to 0.25·XᵀX and the step is a closed 2×2 solve:
    gradient AND Hessian are sufficient statistics accumulated in one partial
    aggregation (5 doubles per partition regardless of input size — the
    summation form of Chu et al. NIPS'06, which the reference's GD jobs
    follow but never extend to second order). At 100 TB the plan is one scan
    + one 5-double shuffle; the dense solve is O(d³) on the driver and here
    is inlined as the explicit 2×2 inverse so both engines share the exact
    formula text."""
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    resid = 0.5 - y
    v = F.col("value") / 100.0
    s = T(spark, sf_dir, "events").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(v).alias("sv"),
        F.sum(v * v).alias("svv"),
        F.sum(resid).alias("g0"),
        F.sum(resid * v).alias("g1"),
    )
    h00, h01, h11 = 0.25 * F.col("n"), 0.25 * F.col("sv"), 0.25 * F.col("svv")
    det = h00 * h11 - h01 * h01
    return s.select(
        r6(F.col("g0")).alias("grad_0"),
        r6(F.col("g1")).alias("grad_1"),
        r6(-(h11 * F.col("g0") - h01 * F.col("g1")) / det).alias("w0_next"),
        r6(-(h00 * F.col("g1") - h01 * F.col("g0")) / det).alias("w1_next"),
    )


@query(
    "q_ml_softmax_grad",
    oracle="""
    WITH tot AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_all,
               SUM(value / 100.0) AS sv_all
        FROM events
    ), cls AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n_c,
               SUM(value / 100.0) AS sv_c
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           ROUND(0.2 * n_all - n_c, 6) AS grad_0,
           ROUND(0.2 * sv_all - sv_c, 6) AS grad_1,
           ROUND(-0.1 * (0.2 * n_all - n_c), 6) AS w0_next,
           ROUND(-0.1 * (0.2 * sv_all - sv_c), 6) AS w1_next
    FROM cls CROSS JOIN tot
    """,
)
def q_ml_softmax_grad(spark, sf_dir):
    """One full-batch gradient step of multiclass softmax regression from
    W = 0 over the 5 event-type classes, features (1, value/100). At W = 0
    every class probability is exactly 1/5, so the per-class gradient
    factorizes into (0.2·global − per-class) sufficient statistics: one
    groupBy(event_type) agg + one global agg, joined by a 1-row broadcast.
    This is the reference's binary-logreg MapReduce pattern generalized to
    K classes with zero extra passes — per-class partial sums all come out
    of the same shuffle. lr = 0.1 per SURVEY §2.9."""
    ev = T(spark, sf_dir, "events")
    v = F.col("value") / 100.0
    tot = ev.agg(
        F.count("*").cast("double").alias("n_all"),
        F.sum(v).alias("sv_all"),
    )
    cls = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_c"),
        F.sum(v).alias("sv_c"),
    )
    g0 = 0.2 * F.col("n_all") - F.col("n_c")
    g1 = 0.2 * F.col("sv_all") - F.col("sv_c")
    return cls.crossJoin(F.broadcast(tot)).select(
        "event_type",
        r6(g0).alias("grad_0"),
        r6(g1).alias("grad_1"),
        r6(-0.1 * g0).alias("w0_next"),
        r6(-0.1 * g1).alias("w1_next"),
    )


@query(
    "q_ml_chi2",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS hi,
               CAST(COUNT(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2
    ), m AS (
        SELECT event_type, hi, o,
               SUM(o) OVER (PARTITION BY event_type) AS row_tot,
               SUM(o) OVER (PARTITION BY hi) AS col_tot,
               SUM(o) OVER () AS n
        FROM cells
    )
    SELECT ROUND(SUM(POW(o - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 6) AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT hi) - 1) AS BIGINT) AS dof
    FROM m
    """,
)
def q_ml_chi2(spark, sf_dir):
    """Pearson chi-square test of independence between event_type and a
    value>100 indicator — the feature-selection statistic a Naive-Bayes user
    (the reference ships NB) runs before training. Contingency cells come
    from ONE groupBy over the fact table; marginals are window sums over the
    ≤10-row cell frame, so the heavy shuffle moves only cell counts. At
    100 TB the post-scan state is K×2 doubles — scale-invariant."""
    ev = T(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.when(F.col("value") > 100.0, 1).otherwise(0).alias("hi"),
    ).agg(F.count("*").cast("double").alias("o"))
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("hi")
    w_all = Window.partitionBy()
    m = cells.select(
        "event_type",
        "hi",
        "o",
        F.sum("o").over(w_row).alias("row_tot"),
        F.sum("o").over(w_col).alias("col_tot"),
        F.sum("o").over(w_all).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return m.agg(
        r6(F.sum(F.pow(F.col("o") - e, 2) / e)).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("hi") - 1)
        ).cast("bigint").alias("dof"),
    )


@query(
    "q_ml_mutual_info",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS n_ls
        FROM documents GROUP BY 1, 2
    ), m AS (
        SELECT n_ls,
               SUM(n_ls) OVER (PARTITION BY lang) AS n_l,
               SUM(n_ls) OVER (PARTITION BY source) AS n_s,
               SUM(n_ls) OVER () AS n
        FROM cells
    ), agg AS (
        SELECT SUM((n_ls / n) * LN(n_ls * n / (n_l * n_s))) AS mi,
               -SUM((n_ls / n) * LN(n_l / n)) AS h_lang_dup,
               -SUM((n_ls / n) * LN(n_s / n)) AS h_source_dup
        FROM m
    )
    SELECT ROUND(mi, 6) AS mi_nats,
           ROUND(h_lang_dup, 6) AS h_lang,
           ROUND(h_source_dup, 6) AS h_source,
           ROUND(mi / SQRT(h_lang_dup * h_source_dup), 6) AS nmi
    FROM agg
    """,
)
def q_ml_mutual_info(spark, sf_dir):
    """Mutual information MI(lang; source) over documents, in nats, plus the
    marginal entropies and normalized MI — the dependence screen for
    categorical features. Joint cells from one groupBy; marginals as window
    sums over the ≤100-row cell frame (Σ_cells p(l,s)·ln(p(l)/1) telescopes
    to the marginal entropy, so no second scan). Everything after the first
    aggregation is O(|lang|·|source|) — independent of corpus size."""
    docs = T(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("n_ls")
    )
    m = cells.select(
        "n_ls",
        F.sum("n_ls").over(Window.partitionBy("lang")).alias("n_l"),
        F.sum("n_ls").over(Window.partitionBy("source")).alias("n_s"),
        F.sum("n_ls").over(Window.partitionBy()).alias("n"),
    )
    p = F.col("n_ls") / F.col("n")
    agg = m.agg(
        F.sum(
            p * F.log(F.col("n_ls") * F.col("n") / (F.col("n_l") * F.col("n_s")))
        ).alias("mi"),
        (-F.sum(p * F.log(F.col("n_l") / F.col("n")))).alias("h_lang_dup"),
        (-F.sum(p * F.log(F.col("n_s") / F.col("n")))).alias("h_source_dup"),
    )
    return agg.select(
        r6(F.col("mi")).alias("mi_nats"),
        r6(F.col("h_lang_dup")).alias("h_lang"),
        r6(F.col("h_source_dup")).alias("h_source"),
        r6(
            F.col("mi") / F.sqrt(F.col("h_lang_dup") * F.col("h_source_dup"))
        ).alias("nmi"),
    )


@query(
    "q_ml_ridge_stats",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(l_quantity) AS sx,
               SUM(l_extendedprice) AS sy,
               SUM(l_quantity * l_quantity) AS sxx,
               SUM(l_quantity * l_extendedprice) AS sxy
        FROM lineitem
    ), c AS (
        SELECT n, sx, sy,
               sxx - sx * sx / n AS cxx,
               sxy - sx * sy / n AS cxy
        FROM s
    )
    SELECT ROUND(cxy / cxx, 6) AS slope_ols,
           ROUND(cxy / (cxx + 100.0), 6) AS slope_ridge,
           ROUND((sy - (cxy / (cxx + 100.0)) * sx) / n, 6) AS intercept_ridge,
           ROUND((cxy / (cxx + 100.0)) / (cxy / cxx), 6) AS shrink_ratio
    FROM c
    """,
)
def q_ml_ridge_stats(spark, sf_dir):
    """Ridge regression (λ = 100, not penalizing the intercept) on
    x=l_quantity, y=l_extendedprice via centered sufficient statistics —
    the same 5-double summation-form pass as ``q_ml_linreg_stats`` with the
    closed-form shrinkage applied at the driver: slope = Sxy/(Sxx+λ).
    Demonstrates that regularized linear models cost exactly the same single
    scan as OLS; the OLS slope and shrink ratio are emitted alongside for
    the cross-check. At 100 TB: one scan, one 5-double shuffle."""
    li = T(spark, sf_dir, "lineitem")
    x, yv = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(yv).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * yv).alias("sxy"),
    )
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    slope_ridge = cxy / (cxx + 100.0)
    return s.select(
        r6(cxy / cxx).alias("slope_ols"),
        r6(slope_ridge).alias("slope_ridge"),
        r6((F.col("sy") - slope_ridge * F.col("sx")) / F.col("n")).alias(
            "intercept_ridge"
        ),
        r6(slope_ridge / (cxy / cxx)).alias("shrink_ratio"),
    )


@query(
    "q_ml_svm_step",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE -1.0 END AS y,
               value / 100.0 AS x1
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(-AVG(y), 6) AS grad_0,
           ROUND(-AVG(y * x1), 6) AS grad_1,
           ROUND(0.1 * AVG(y), 6) AS w0_next,
           ROUND(0.1 * AVG(y * x1), 6) AS w1_next
    FROM pts
    """,
)
def q_ml_svm_step(spark, sf_dir):
    """One full-batch subgradient step for a linear SVM (hinge loss,
    Pegasos-style) from w = 0: at w = 0 every point violates the margin
    (y·⟨w,x⟩ = 0 < 1), so the subgradient is λw − (1/n)Σy·x = −avg(y·x)
    and the step-η=0.1 update is w ← η·avg(y·x). Features (1, value/100),
    label ±1 on event_type='purchase' (the §2.9 feature convention). Like
    the reference's gradient jobs, the whole step is summation-form: the
    shuffle carries two partial sums, never rows."""
    ev = T(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(-1.0)
    x1 = F.col("value") / 100.0
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        r6(-F.avg(y)).alias("grad_0"),
        r6(-F.avg(y * x1)).alias("grad_1"),
        r6(0.1 * F.avg(y)).alias("w0_next"),
        r6(0.1 * F.avg(y * x1)).alias("w1_next"),
    )


@query(
    "q_ml_adaboost_stump",
    oracle="""
    WITH pts AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE -1.0 END AS y,
               CASE WHEN value >= 100.0 THEN 1.0 ELSE -1.0 END AS h
        FROM events
    ),
    e AS (
        SELECT COUNT(*) AS n,
               AVG(CASE WHEN h <> y THEN 1.0 ELSE 0.0 END) AS eps
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(eps, 6) AS eps,
           ROUND(0.5 * ln((1 - eps) / eps), 6) AS alpha,
           ROUND((1 - eps) * exp(-0.5 * ln((1 - eps) / eps)), 6)
               AS z_correct,
           ROUND(eps * exp(0.5 * ln((1 - eps) / eps)), 6) AS z_wrong
    FROM e
    """,
)
def q_ml_adaboost_stump(spark, sf_dir):
    """One AdaBoost round with uniform starting weights and the fixed stump
    h(x) = sign(value ≥ 100): weighted error ε, vote α = ½ln((1−ε)/ε), and
    the two halves of the re-weighting normalizer Z — correct mass
    (1−ε)e^{−α} and wrong mass ε·e^{α}, which AdaBoost provably equalizes
    at √(ε(1−ε)) each, a free cross-engine invariant. ε is a count ratio
    (integer-exact both sides) and everything downstream is scalar math on
    one row, so round-6 parity is safe."""
    ev = T(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(-1.0)
    h = F.when(F.col("value") >= 100.0, 1.0).otherwise(-1.0)
    e = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.when(h != y, 1.0).otherwise(0.0)).alias("eps"),
    )
    alpha = 0.5 * F.log((1 - F.col("eps")) / F.col("eps"))
    return e.select(
        F.col("n").cast("bigint").alias("n"),
        r6(F.col("eps")).alias("eps"),
        r6(alpha).alias("alpha"),
        r6((1 - F.col("eps")) * F.exp(-alpha)).alias("z_correct"),
        r6(F.col("eps") * F.exp(alpha)).alias("z_wrong"),
    )


@query(
    "q_ml_itemcf",
    oracle="""
    WITH cnt AS (
        SELECT user_id, event_type, COUNT(*)::DOUBLE AS c
        FROM events GROUP BY user_id, event_type
    ),
    norms AS (
        SELECT event_type, sqrt(SUM(c * c)) AS nrm
        FROM cnt GROUP BY event_type
    ),
    dots AS (
        SELECT a.event_type AS item_a, b.event_type AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               SUM(a.c * b.c) AS dot
        FROM cnt a JOIN cnt b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT item_a, item_b, n_users,
           ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.event_type = item_a
    JOIN norms nb ON nb.event_type = item_b
    """,
)
def q_ml_itemcf(spark, sf_dir):
    """Item-item collaborative filtering: cosine similarity between event
    types over the user×item interaction-count matrix — the classic
    Amazon-style item-CF kernel, in summation form. The user-keyed
    self-join explodes only within a user's item set (≤5 items here; at
    100 TB cap or sample per-user item lists, the standard guard), then
    one groupBy(item, item) reduces to |items|² partial sums; norms are an
    |items|-row broadcast join. No driver-side matrix ever materializes."""
    ev = T(spark, sf_dir, "events")
    # the interaction matrix — consumed by the norm table and both
    # self-join sides; checkpointed so the fact table is scanned once,
    # not once per consumer
    cnt = _ckpt(
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    norms = cnt.groupBy("event_type").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nrm")
    )
    a, b = cnt.alias("a"), cnt.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
        )
    )
    na = norms.select(
        F.col("event_type").alias("item_a"), F.col("nrm").alias("na")
    )
    nb = norms.select(
        F.col("event_type").alias("item_b"), F.col("nrm").alias("nb")
    )
    return (
        dots.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_users",
            r6(F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
    )


@query(
    "q_ml_gbdt_round",
    oracle="""
    WITH base AS (SELECT AVG(value) AS f0 FROM events),
    resid AS (
        SELECT CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr,
               value - f0 AS r
        FROM events, base
    ),
    thr AS (SELECT UNNEST([6.0, 12.0, 18.0])::DOUBLE AS threshold),
    split AS (
        SELECT threshold,
               CAST(SUM(CASE WHEN hr < threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_left,
               CAST(SUM(CASE WHEN hr >= threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_right,
               SUM(CASE WHEN hr < threshold THEN r ELSE 0 END)
                   / SUM(CASE WHEN hr < threshold THEN 1 ELSE 0 END)
                   AS leaf_l,
               SUM(CASE WHEN hr >= threshold THEN r ELSE 0 END)
                   / SUM(CASE WHEN hr >= threshold THEN 1 ELSE 0 END)
                   AS leaf_r
        FROM resid CROSS JOIN thr
        GROUP BY threshold
    )
    SELECT threshold, n_left, n_right,
           ROUND(leaf_l, 6) AS leaf_left,
           ROUND(leaf_r, 6) AS leaf_right,
           ROUND(n_left * leaf_l * leaf_l + n_right * leaf_r * leaf_r, 0)
               AS gain
    FROM split
    """,
)
def q_ml_gbdt_round(spark, sf_dir):
    """One gradient-boosting round for squared loss: base prediction
    F₀ = global mean, pseudo-residuals r = y − F₀, and a depth-1 regression
    stump on hour(ts) evaluated at the three fixed thresholds {6, 12, 18}
    — leaf values are mean residuals and the split gain is the variance
    reduction n_l·μ_l² + n_r·μ_r² (exact because the parent residual mean
    is zero). This is the per-round kernel of every distributed GBDT
    (XGBoost/LightGBM approx mode): residuals are a map against a
    broadcast scalar, and each candidate split is four conditional partial
    sums — the shuffle carries 4·|thresholds| numbers, never rows. A full
    trainer = argmax(gain) + F₁ = F₀ + η·leaf in the ml_iterative
    driver-loop pattern. Gain is rounded to integer (r0): magnitude ~1e5
    with ~1e-8 cross-engine noise."""
    ev = T(spark, sf_dir, "events")
    base = ev.agg(F.avg("value").alias("f0"))
    resid = ev.crossJoin(F.broadcast(base)).select(
        F.hour("ts").cast("double").alias("hr"),
        (F.col("value") - F.col("f0")).alias("r"),
    )
    thr = ev.sparkSession.createDataFrame(
        [(6.0,), (12.0,), (18.0,)], "threshold double"
    )
    left = F.col("hr") < F.col("threshold")
    split = (
        resid.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(left, 1).otherwise(0)).cast("bigint").alias("n_left"),
            F.sum(F.when(~left, 1).otherwise(0))
            .cast("bigint")
            .alias("n_right"),
            (
                F.sum(F.when(left, F.col("r")).otherwise(0.0))
                / F.sum(F.when(left, 1).otherwise(0))
            ).alias("leaf_l"),
            (
                F.sum(F.when(~left, F.col("r")).otherwise(0.0))
                / F.sum(F.when(~left, 1).otherwise(0))
            ).alias("leaf_r"),
        )
    )
    gain = (
        F.col("n_left") * F.col("leaf_l") * F.col("leaf_l")
        + F.col("n_right") * F.col("leaf_r") * F.col("leaf_r")
    )
    return split.select(
        "threshold",
        "n_left",
        "n_right",
        r6(F.col("leaf_l")).alias("leaf_left"),
        r6(F.col("leaf_r")).alias("leaf_right"),
        F.round(gain, 0).alias("gain"),
    )


@query(
    "q_ml_gbdt_iter2",
    oracle="""
    WITH base AS (SELECT AVG(value) AS f0 FROM events),
    resid AS (
        SELECT CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr,
               value, value - f0 AS r
        FROM events, base
    ),
    thr AS (SELECT UNNEST([6.0, 12.0, 18.0])::DOUBLE AS threshold),
    split1 AS (
        SELECT threshold,
               SUM(CASE WHEN hr < threshold THEN r ELSE 0 END)
                   / SUM(CASE WHEN hr < threshold THEN 1 ELSE 0 END)
                   AS leaf_l,
               SUM(CASE WHEN hr >= threshold THEN r ELSE 0 END)
                   / SUM(CASE WHEN hr >= threshold THEN 1 ELSE 0 END)
                   AS leaf_r,
               SUM(CASE WHEN hr < threshold THEN 1 ELSE 0 END) AS nl,
               SUM(CASE WHEN hr >= threshold THEN 1 ELSE 0 END) AS nr
        FROM resid CROSS JOIN thr
        GROUP BY threshold
    ),
    best AS (
        SELECT threshold AS t1,
               ROUND(leaf_l, 6) AS bl, ROUND(leaf_r, 6) AS br
        FROM split1
        ORDER BY ROUND(nl * leaf_l * leaf_l + nr * leaf_r * leaf_r, 0)
                 DESC, threshold
        LIMIT 1
    ),
    resid2 AS (
        SELECT hr, t1,
               r - 0.5 * (CASE WHEN hr < t1 THEN bl ELSE br END) AS r2
        FROM resid CROSS JOIN best
    ),
    split2 AS (
        SELECT t1, threshold,
               CAST(SUM(CASE WHEN hr < threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_left,
               CAST(SUM(CASE WHEN hr >= threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_right,
               SUM(CASE WHEN hr < threshold THEN r2 ELSE 0 END)
                   / SUM(CASE WHEN hr < threshold THEN 1 ELSE 0 END)
                   AS leaf_l,
               SUM(CASE WHEN hr >= threshold THEN r2 ELSE 0 END)
                   / SUM(CASE WHEN hr >= threshold THEN 1 ELSE 0 END)
                   AS leaf_r
        FROM resid2 CROSS JOIN thr
        GROUP BY t1, threshold
    )
    SELECT threshold, t1 AS round1_threshold, n_left, n_right,
           ROUND(leaf_l, 6) AS leaf_left,
           ROUND(leaf_r, 6) AS leaf_right,
           ROUND(n_left * leaf_l * leaf_l + n_right * leaf_r * leaf_r, 0)
               AS gain
    FROM split2
    """,
)
def q_ml_gbdt_iter2(spark, sf_dir):
    """TWO gradient-boosting rounds as a single Catalyst plan: round 1
    evaluates the fixed threshold grid on the base residuals, the winning
    stump (gain argmax, threshold tie-break) has its leaf values ROUNDED
    and broadcast back (the q_ml_kmeans_iter2 parameter-pivot pattern),
    F₁ = F₀ + 0.5·leaf updates every row's residual in the same plan, and
    round 2 re-scores the grid on the new residuals — no driver
    round-trip between rounds, and the round-2 gains are necessarily
    smaller along the chosen split (boosting's residual-shrinking
    property, pinned by an invariant). Rounding the broadcast leaves is
    the determinism hinge: both engines re-derive bit-identical F₁."""
    ev = T(spark, sf_dir, "events")
    # 1-row base prediction; residuals are CHECKPOINTED (optimization
    # r13): both boosting rounds score the same (hr, r) frame, and
    # without the cache round 2 re-scanned parquet and re-derived the
    # residuals — persisting the 2-double-per-row residual frame is the
    # standard distributed-GBDT shape (the cached training matrix), and
    # it is a derived projection, never the base table
    base = _ckpt(ev.agg(F.avg("value").alias("f0")))
    resid = _ckpt(
        ev.crossJoin(F.broadcast(base)).select(
            F.hour("ts").cast("double").alias("hr"),
            (F.col("value") - F.col("f0")).alias("r"),
        )
    )
    thresholds = (6.0, 12.0, 18.0)

    def grid(df, col, carry=()):
        """Score the fixed threshold grid in ONE map-side-combined global
        aggregate — 4 conditional sums per threshold — then pivot the
        single row back to one row per threshold with an explode over
        literal-keyed structs. The r12 form cross-joined a 3-row
        threshold frame onto every event row and grouped by threshold:
        3× the aggregate input rows, one broadcast build and one
        hash-shuffle per round that a threshold grid of LITERALS never
        needed (guide §2.4 — the shuffle carried 4·|thresholds| numbers
        that a partial aggregate computes in place). Sums are identical
        (same conditional terms over the same rows; division still
        happens once per threshold after final merge). `carry` re-emits
        constant columns (round-2's t1) through the pivot via MAX — the
        column is a broadcast scalar, so MAX is the value itself."""
        aggs = []
        for i, t in enumerate(thresholds):
            lt = F.col("hr") < F.lit(t)
            aggs += [
                F.sum(F.when(lt, 1).otherwise(0)).alias(f"nl{i}"),
                F.sum(F.when(~lt, 1).otherwise(0)).alias(f"nr{i}"),
                F.sum(F.when(lt, F.col(col)).otherwise(0.0)).alias(f"sl{i}"),
                F.sum(F.when(~lt, F.col(col)).otherwise(0.0)).alias(f"sr{i}"),
            ]
        aggs += [F.max(c).alias(c) for c in carry]
        row = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"nl{i}").cast("bigint").alias("n_left"),
                F.col(f"nr{i}").cast("bigint").alias("n_right"),
                (F.col(f"sl{i}") / F.col(f"nl{i}")).alias("leaf_l"),
                (F.col(f"sr{i}") / F.col(f"nr{i}")).alias("leaf_r"),
            )
            for i, t in enumerate(thresholds)
        ]
        return row.select(
            *carry, F.explode(F.array(*structs)).alias("g")
        ).select(*carry, "g.*")

    gain = (
        F.col("n_left") * F.col("leaf_l") * F.col("leaf_l")
        + F.col("n_right") * F.col("leaf_r") * F.col("leaf_r")
    )
    best = (
        grid(resid, "r")
        .orderBy(F.round(gain, 0).desc(), "threshold")
        .limit(1)
        .select(
            F.col("threshold").alias("t1"),
            r6(F.col("leaf_l")).alias("bl"),
            r6(F.col("leaf_r")).alias("br"),
        )
    )
    resid2 = resid.crossJoin(F.broadcast(best)).select(
        "hr",
        "t1",
        (
            F.col("r")
            - 0.5
            * F.when(F.col("hr") < F.col("t1"), F.col("bl")).otherwise(
                F.col("br")
            )
        ).alias("r2"),
    )
    split2 = grid(resid2, "r2", carry=("t1",))
    return split2.select(
        "threshold",
        F.col("t1").alias("round1_threshold"),
        "n_left",
        "n_right",
        r6(F.col("leaf_l")).alias("leaf_left"),
        r6(F.col("leaf_r")).alias("leaf_right"),
        F.round(gain, 0).alias("gain"),
    )


@query(
    "q_ml_durbin_watson",
    oracle="""
    WITH pts AS (
        SELECT event_id, ts, value,
               CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) AS hr
        FROM events
    ),
    fit AS (
        SELECT ROUND((COUNT(*) * SUM(hr * value) - SUM(hr) * SUM(value))
                     / (COUNT(*) * SUM(hr * hr) - SUM(hr) * SUM(hr)), 6)
                   AS slope,
               ROUND(AVG(value), 6) AS mean_y,
               ROUND(AVG(hr), 6) AS mean_x
        FROM pts
    ),
    resid AS (
        SELECT value - (mean_y + slope * (hr - mean_x)) AS e,
               LAG(value - (mean_y + slope * (hr - mean_x)))
                   OVER (ORDER BY ts, event_id) AS e_prev
        FROM pts, fit
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CASE WHEN e_prev IS NOT NULL
                          THEN (e - e_prev) * (e - e_prev) END)
                 / SUM(e * e), 6) AS durbin_watson
    FROM resid
    """,
)
def q_ml_durbin_watson(spark, sf_dir):
    """Durbin-Watson serial-correlation diagnostic on the value~hour OLS
    residuals in event-time order: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² — ≈2 means the
    regression's errors are independent over time, <2 flags positive
    autocorrelation that invalidates the i.i.d. standard errors every
    batch A/B readout assumes. The fit parameters are the closed-form
    slope/mean (ROUND-6, the broadcast-back determinism pattern), so fit
    + residuals + lag + sums compose into one plan. The lag runs in a
    single global ordering — fine for a diagnostic over a daily batch; at
    100 TB partition by series/day and the boundary terms are one row per
    partition, negligible in both sums."""
    ev = T(spark, sf_dir, "events")
    pts = ev.select(
        "event_id", "ts", "value", F.hour("ts").cast("double").alias("hr")
    )
    n = F.count(F.lit(1))
    fit = pts.agg(
        r6(
            (n * F.sum(F.col("hr") * F.col("value"))
             - F.sum("hr") * F.sum("value"))
            / (n * F.sum(F.col("hr") * F.col("hr"))
               - F.sum("hr") * F.sum("hr"))
        ).alias("slope"),
        r6(F.avg("value")).alias("mean_y"),
        r6(F.avg("hr")).alias("mean_x"),
    )
    e = F.col("value") - (
        F.col("mean_y") + F.col("slope") * (F.col("hr") - F.col("mean_x"))
    )
    w = Window.orderBy("ts", "event_id")
    resid = pts.crossJoin(F.broadcast(fit)).select(
        e.alias("e"), F.lag(e).over(w).alias("e_prev")
    )
    return resid.agg(
        F.count(F.lit(1)).alias("n"),
        r6(
            F.sum(
                F.when(
                    F.col("e_prev").isNotNull(),
                    (F.col("e") - F.col("e_prev"))
                    * (F.col("e") - F.col("e_prev")),
                )
            )
            / F.sum(F.col("e") * F.col("e"))
        ).alias("durbin_watson"),
    )


_CORR_FEATS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_sql(a: str, b: str) -> str:
    return (
        f"ROUND((COUNT(*) * SUM({a} * {b}) - SUM({a}) * SUM({b}))"
        f" / (sqrt(COUNT(*) * SUM({a} * {a}) - SUM({a}) * SUM({a}))"
        f" * sqrt(COUNT(*) * SUM({b} * {b}) - SUM({b}) * SUM({b}))), 6)"
    )


@query(
    "q_ml_feature_corr",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(
        _corr_sql(a, b) + f" AS corr_{a[2:]}_{b[2:]}"
        for i, a in enumerate(_CORR_FEATS)
        for b in _CORR_FEATS[i + 1:]
    )
    + " FROM lineitem",
)
def q_ml_feature_corr(spark, sf_dir):
    """Pairwise Pearson correlation matrix over the four lineitem measures
    — the multicollinearity screen run before fitting any linear model
    (a |r| near 1 between two features means the Gram matrix in
    q_ml_linreg_gram is ill-conditioned and the ridge variant is the
    right solver). All C(4,2) correlations come from ONE aggregation pass
    of 14 sufficient statistics (the Chu et al. summation form again):
    the shuffle carries 14 doubles per partition for any row count, and
    both engines evaluate the textually identical moment formula, so
    round-6 holds despite the 1e9-magnitude intermediate sums (the ratio
    normalizes them away)."""
    li = T(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))

    def corr(a: str, b: str):
        ca, cb = F.col(a), F.col(b)
        num = n * F.sum(ca * cb) - F.sum(ca) * F.sum(cb)
        den = F.sqrt(n * F.sum(ca * ca) - F.sum(ca) * F.sum(ca)) * F.sqrt(
            n * F.sum(cb * cb) - F.sum(cb) * F.sum(cb)
        )
        return r6(num / den).alias(f"corr_{a[2:]}_{b[2:]}")

    return li.agg(
        n.alias("n"),
        *[
            corr(a, b)
            for i, a in enumerate(_CORR_FEATS)
            for b in _CORR_FEATS[i + 1:]
        ],
    )


@query(
    "q_ml_psi",
    oracle="""
    WITH ext AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
    ),
    binned AS (
        SELECT LEAST(CAST(FLOOR((value - lo) / (hi - lo) * 10) AS BIGINT),
                     9) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'ref' ELSE 'cur' END AS side
        FROM events, ext
    ),
    counts AS (
        SELECT bin,
               SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END)::DOUBLE AS nr,
               SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END)::DOUBLE AS nc
        FROM binned GROUP BY bin
    ),
    probs AS (
        SELECT bin,
               (nr + 0.5) / (SUM(nr) OVER () + 5.0) AS p,
               (nc + 0.5) / (SUM(nc) OVER () + 5.0) AS q
        FROM counts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM((p - q) * ln(p / q)), 6) AS psi
    FROM probs
    """,
)
def q_ml_psi(spark, sf_dir):
    """Population Stability Index between the first and second half-month
    value distributions over 10 equal-width bins: PSI = Σ(p−q)·ln(p/q),
    the industry-standard model-input drift alarm (<0.1 stable, >0.25
    retrain). Bins use the global min/max (identical double arithmetic
    both engines, the q_sketch_quantile_hist recipe) and the probabilities
    carry a +0.5 Laplace floor so an empty bin cannot produce ln(0) — the
    same smoothing a production monitor needs when a bin empties out. One
    banded census per side, then scalar math over 10 rows; the companion
    to q_events_entropy_drift (mix drift) for continuous features."""
    ev = T(spark, sf_dir, "events")
    ext = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    binned = ev.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 10
            ).cast("bigint"),
            F.lit(9),
        ).alias("bin"),
        F.when(F.col("ts") < cutoff, "ref").otherwise("cur").alias("side"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("side") == "ref", 1).otherwise(0))
        .cast("double")
        .alias("nr"),
        F.sum(F.when(F.col("side") == "cur", 1).otherwise(0))
        .cast("double")
        .alias("nc"),
    )
    w = Window.partitionBy()
    probs = counts.select(
        ((F.col("nr") + 0.5) / (F.sum("nr").over(w) + 5.0)).alias("p"),
        ((F.col("nc") + 0.5) / (F.sum("nc").over(w) + 5.0)).alias("q"),
    )
    return probs.agg(
        F.count(F.lit(1)).alias("n_bins"),
        r6(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))
        ).alias("psi"),
    )


@query(
    "q_ml_lift_gains",
    oracle="""
    WITH scored AS (
        SELECT event_id,
               1.0 / (1.0 + EXP(-(-1.5 + 0.8 * value / 100.0))) AS prob,
               CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        FROM events
    ),
    deciled AS (
        SELECT y,
               NTILE(10) OVER (ORDER BY prob DESC, event_id) AS decile
        FROM scored
    ),
    per AS (
        SELECT decile, COUNT(*)::DOUBLE AS n, SUM(y) AS pos
        FROM deciled GROUP BY decile
    ),
    cum AS (
        SELECT decile, n, pos,
               SUM(pos) OVER (ORDER BY decile
                              ROWS UNBOUNDED PRECEDING) AS cum_pos,
               SUM(n) OVER (ORDER BY decile
                            ROWS UNBOUNDED PRECEDING) AS cum_n,
               SUM(pos) OVER () AS tot_pos, SUM(n) OVER () AS tot_n
        FROM per
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS n_pos,
           ROUND(cum_pos / tot_pos, 6) AS cum_gain,
           ROUND((cum_pos / tot_pos) / (cum_n / tot_n), 6) AS cum_lift
    FROM cum
    """,
)
def q_ml_lift_gains(spark, sf_dir):
    """Cumulative gains and lift table — the model-eval readout marketing
    and risk teams actually act on: score every row with the fixed
    logistic scorer (the q_ml_calibration model), cut into score deciles
    (ntile on (prob DESC, event_id) — a total order, so decile membership
    is engine-stable), and report each decile's cumulative capture of
    positives and lift over random targeting. Completes the evaluation
    family: AUC ranks, calibration checks probabilities, gains/lift
    prices the targeting decision. Post-scoring everything runs on a
    10-row frame; the scoring pass is one map over the fact table."""
    ev = T(spark, sf_dir, "events")
    prob = 1.0 / (1.0 + F.exp(-(-1.5 + 0.8 * F.col("value") / 100.0)))
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    scored = ev.select("event_id", prob.alias("prob"), y.alias("y"))
    w = Window.orderBy(F.desc("prob"), "event_id")
    per = (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("y").alias("pos"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = per.select(
        "decile",
        "n",
        "pos",
        F.sum("pos").over(wc).alias("cum_pos"),
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("pos").over(wt).alias("tot_pos"),
        F.sum("n").over(wt).alias("tot_n"),
    )
    return cum.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n").cast("bigint").alias("n"),
        F.col("pos").cast("bigint").alias("n_pos"),
        r6(F.col("cum_pos") / F.col("tot_pos")).alias("cum_gain"),
        r6(
            (F.col("cum_pos") / F.col("tot_pos"))
            / (F.col("cum_n") / F.col("tot_n"))
        ).alias("cum_lift"),
    )


@query(
    "q_ml_slope_inference",
    oracle="""
    WITH s AS (
        SELECT COUNT(*)::DOUBLE AS n,
               SUM(CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)) AS sx,
               SUM(value) AS sy,
               SUM(CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)
                   * CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)) AS sxx,
               SUM(CAST(EXTRACT(HOUR FROM ts) AS DOUBLE) * value) AS sxy,
               SUM(value * value) AS syy
        FROM events
    ),
    d AS (
        SELECT n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (n * sxx - sx * sx) / n AS ssx,
               (syy - sy * sy / n)
                   - POW(n * sxy - sx * sy, 2) / (n * (n * sxx - sx * sx))
                   AS sse
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(slope, 6) AS slope,
           ROUND(sqrt((sse / (n - 2)) / ssx), 6) AS se_slope,
           ROUND(slope / sqrt((sse / (n - 2)) / ssx), 6) AS t_stat
    FROM d
    """,
)
def q_ml_slope_inference(spark, sf_dir):
    """OLS slope INFERENCE, not just the point estimate: standard error
    SE = √(σ̂²/Sxx) with σ̂² = SSE/(n−2), and the t-statistic that decides
    whether the value~hour trend is distinguishable from noise — the
    missing half of every regression readout (q_ml_linreg_stats gives the
    coefficient, this gives its error bar; q_ml_durbin_watson validates
    the independence assumption behind it). Everything derives from the
    same six sufficient statistics in ONE aggregation pass — the
    summation form carries the entire inference, not just the fit. The
    t-stat is a ratio of same-scale quantities: round-6 safe."""
    ev = T(spark, sf_dir, "events")
    hr = F.hour("ts").cast("double")
    v = F.col("value")
    s = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(hr).alias("sx"),
        F.sum(v).alias("sy"),
        F.sum(hr * hr).alias("sxx"),
        F.sum(hr * v).alias("sxy"),
        F.sum(v * v).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    ssx = (n * sxx - sx * sx) / n
    sse = (syy - sy * sy / n) - F.pow(n * sxy - sx * sy, 2) / (
        n * (n * sxx - sx * sx)
    )
    se = F.sqrt((sse / (n - 2)) / ssx)
    return s.select(
        n.cast("bigint").alias("n"),
        r6(slope).alias("slope"),
        r6(se).alias("se_slope"),
        r6(slope / se).alias("t_stat"),
    )


_VIF_FEATS = ("l_quantity", "l_extendedprice", "l_discount")


@query(
    "q_ml_vif",
    oracle=f"""
    WITH s AS (
        SELECT COUNT(*)::DOUBLE AS n,
               {", ".join(f"SUM({f}) AS s_{f[2:]}" for f in _VIF_FEATS)},
               {", ".join(
                   f"SUM({a} * {b}) AS s_{a[2:]}_{b[2:]}"
                   for i, a in enumerate(_VIF_FEATS)
                   for b in _VIF_FEATS[i:]
               )}
        FROM lineitem
    ),
    r AS (
        SELECT
          (n * s_quantity_extendedprice - s_quantity * s_extendedprice)
            / (sqrt(n * s_quantity_quantity - s_quantity * s_quantity)
               * sqrt(n * s_extendedprice_extendedprice
                      - s_extendedprice * s_extendedprice)) AS r12,
          (n * s_quantity_discount - s_quantity * s_discount)
            / (sqrt(n * s_quantity_quantity - s_quantity * s_quantity)
               * sqrt(n * s_discount_discount - s_discount * s_discount))
              AS r13,
          (n * s_extendedprice_discount - s_extendedprice * s_discount)
            / (sqrt(n * s_extendedprice_extendedprice
                    - s_extendedprice * s_extendedprice)
               * sqrt(n * s_discount_discount - s_discount * s_discount))
              AS r23
        FROM s
    )
    SELECT
      ROUND(1.0 / (1.0 - (r12*r12 + r13*r13 - 2*r12*r13*r23)
                         / (1.0 - r23*r23)), 6) AS vif_quantity,
      ROUND(1.0 / (1.0 - (r12*r12 + r23*r23 - 2*r12*r23*r13)
                         / (1.0 - r13*r13)), 6) AS vif_extendedprice,
      ROUND(1.0 / (1.0 - (r13*r13 + r23*r23 - 2*r13*r23*r12)
                         / (1.0 - r12*r12)), 6) AS vif_discount
    FROM r
    """,
)
def q_ml_vif(spark, sf_dir):
    """Variance inflation factors for the three lineitem predictors —
    the numeric answer to 'is this feature redundant': VIF_j = 1/(1−R²_j)
    where R²_j regresses feature j on the other two, computed in closed
    form from the pairwise correlations (for three variables
    R²_1 = (r₁₂² + r₁₃² − 2r₁₂r₁₃r₂₃)/(1 − r₂₃²)). Like q_ml_feature_corr
    everything reduces to one pass of moment sums; a VIF above ~5 says
    drop or regularize the feature before the q_ml_linreg_gram solve.
    Ratios of O(1) correlations: round-6 safe."""
    li = T(spark, sf_dir, "lineitem")
    q, e, d = (F.col(f) for f in _VIF_FEATS)
    n = F.count(F.lit(1)).cast("double")
    s = li.agg(
        n.alias("n"),
        F.sum(q).alias("sq"),
        F.sum(e).alias("se"),
        F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"),
        F.sum(e * e).alias("see"),
        F.sum(d * d).alias("sdd"),
        F.sum(q * e).alias("sqe"),
        F.sum(q * d).alias("sqd"),
        F.sum(e * d).alias("sed"),
    )

    def corr(sab, sa, sb, saa, sbb):
        nn = F.col("n")
        return (nn * F.col(sab) - F.col(sa) * F.col(sb)) / (
            F.sqrt(nn * F.col(saa) - F.col(sa) * F.col(sa))
            * F.sqrt(nn * F.col(sbb) - F.col(sb) * F.col(sb))
        )

    r12 = corr("sqe", "sq", "se", "sqq", "see")
    r13 = corr("sqd", "sq", "sd", "sqq", "sdd")
    r23 = corr("sed", "se", "sd", "see", "sdd")

    def vif(ra, rb, rc):
        # R² of the target on the other two via correlations ra, rb with
        # the others and rc between the others
        r2 = (ra * ra + rb * rb - 2 * ra * rb * rc) / (1.0 - rc * rc)
        return 1.0 / (1.0 - r2)

    return s.select(
        r6(vif(r12, r13, r23)).alias("vif_quantity"),
        r6(vif(r12, r23, r13)).alias("vif_extendedprice"),
        r6(vif(r13, r23, r12)).alias("vif_discount"),
    )


@query(
    "q_ml_cohens_kappa",
    oracle="""
    WITH preds AS (
        SELECT CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS a,
               CASE WHEN 1.0 / (1.0 + EXP(-(-1.5 + 0.8 * value / 100.0)))
                         >= 0.3 THEN 1 ELSE 0 END AS b
        FROM events
    ),
    c AS (
        SELECT COUNT(*)::DOUBLE AS n,
               SUM(CASE WHEN a = b THEN 1 ELSE 0 END)::DOUBLE AS agree,
               SUM(a)::DOUBLE AS pa, SUM(b)::DOUBLE AS pb
        FROM preds
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(agree / n, 6) AS observed_agreement,
           ROUND((pa * pb + (n - pa) * (n - pb)) / (n * n), 6)
               AS chance_agreement,
           ROUND((agree / n - (pa * pb + (n - pa) * (n - pb)) / (n * n))
                 / (1.0 - (pa * pb + (n - pa) * (n - pb)) / (n * n)), 6)
               AS kappa
    FROM c
    """,
)
def q_ml_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between two classifiers of the same stream — the
    value-threshold stump (q_ml_adaboost_stump's rule) and the
    logistic scorer at 0.3 (q_ml_calibration's model): chance-corrected
    agreement κ = (p₀ − pₑ)/(1 − pₑ). Raw agreement overstates
    consistency when both raters mostly say 'no'; κ is the honest number
    for comparing labelers, model versions, or human-vs-model annotation
    — the measurement a labeling pipeline runs before trusting
    auto-labels. Four partial sums, one row out."""
    ev = T(spark, sf_dir, "events")
    a = F.when(F.col("value") >= 100.0, 1).otherwise(0)
    prob = 1.0 / (1.0 + F.exp(-(-1.5 + 0.8 * F.col("value") / 100.0)))
    b = F.when(prob >= 0.3, 1).otherwise(0)
    c = ev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(a == b, 1).otherwise(0)).cast("double").alias("agree"),
        F.sum(a).cast("double").alias("pa"),
        F.sum(b).cast("double").alias("pb"),
    )
    n, agree, pa, pb = (F.col(x) for x in ("n", "agree", "pa", "pb"))
    pe = (pa * pb + (n - pa) * (n - pb)) / (n * n)
    po = agree / n
    return c.select(
        n.cast("bigint").alias("n"),
        r6(po).alias("observed_agreement"),
        r6(pe).alias("chance_agreement"),
        r6((po - pe) / (1.0 - pe)).alias("kappa"),
    )


@query(
    "q_ml_emb_dim_stats",
    oracle="""
    WITH dims AS (
        SELECT generate_subscripts(embedding, 1) AS dim,
               UNNEST(embedding)::DOUBLE AS x
        FROM embeddings
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           ROUND(AVG(x), 6) AS mean_x,
           ROUND(VAR_SAMP(x), 6) AS var_x,
           ROUND(MAX(ABS(x)), 6) AS max_abs
    FROM dims GROUP BY dim
    """,
)
def q_ml_emb_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics — the vector-column health
    audit: a dimension with ~zero variance is dead weight in every
    cosine/distance computation (and a candidate for pruning before the
    ANN index is built); a dimension with outsized max|x| dominates
    unnormalized distances. posexplode turns the array column into
    (dim, value) rows — the same dimension-exploded shape the centroid
    and PCA kernels use — and the aggregate state is 64 rows of moments
    regardless of vector count: this is how you profile a billion-vector
    column without ever materializing it densely."""
    emb = T(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.posexplode("embedding").alias("pos", "xf")
    ).select(
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    return dims.groupBy("dim").agg(
        r6(F.avg("x")).alias("mean_x"),
        r6(F.var_samp("x")).alias("var_x"),
        r6(F.max(F.abs("x"))).alias("max_abs"),
    )
