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

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r0, r6
from mapreduce_machine_learning_spark.functions import cosine
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query

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
