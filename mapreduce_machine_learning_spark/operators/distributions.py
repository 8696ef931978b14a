"""Distribution summaries and embedding-space geometry: weighted quantiles,
distribution distances (Jensen–Shannon), per-label centroid separation,
centroid-distance outliers, and cumulative-adoption curves.

All queries follow the summation-form discipline: one keyed aggregation over
the fact table, then arithmetic over a frame whose size is bounded by the
key domain (distinct prices, histogram bins, label×dim, days), never by row
count. Counts and integer-valued weights are exact in both engines, so the
derived scores agree to a single closed-form FP expression rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query
from mapreduce_machine_learning_spark.runtime import checkpoint as _ckpt


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH byprice AS (
        SELECT l_extendedprice AS price, SUM(l_quantity) AS w
        FROM lineitem GROUP BY l_extendedprice
    ),
    cum AS (
        SELECT price, w,
               SUM(w) OVER (ORDER BY price
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cw,
               SUM(w) OVER () AS total_w
        FROM byprice
    )
    SELECT ROUND(MIN(price), 6) AS weighted_median,
           CAST(ROUND(MAX(total_w), 0) AS BIGINT) AS total_weight
    FROM cum WHERE cw >= total_w / 2.0
    """,
)
def q_agg_weighted_median(spark, sf_dir):
    """Quantity-weighted median of l_extendedprice: the smallest price whose
    cumulative weight reaches half the total. The cumulative scan runs over
    the DISTINCT-price frame (one groupBy shuffle keyed by price, then an
    O(|distinct|) prefix sum). Weights are integer-valued doubles, so every
    cumulative sum is exactly representable — the cw ≥ W/2 boundary cannot
    flip between engines."""
    li = T(spark, sf_dir, "lineitem")
    byprice = li.groupBy(F.col("l_extendedprice").alias("price")).agg(
        F.sum("l_quantity").alias("w")
    )
    w_cum = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = byprice.select(
        "price",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("total_w"),
    )
    return cum.filter(F.col("cw") >= F.col("total_w") / 2.0).agg(
        r6(F.min("price")).alias("weighted_median"),
        F.round(F.max("total_w"), 0).cast("bigint").alias("total_weight"),
    )


@query(
    "q_ml_jsd",
    oracle="""
    WITH binned AS (
        SELECT LEAST(CAST(FLOOR(value / 25.0) AS INT), 19) AS bin,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS np,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nq
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY 1
    ),
    probs AS (
        SELECT np / SUM(np) OVER ()::DOUBLE AS p,
               nq / SUM(nq) OVER ()::DOUBLE AS q
        FROM binned
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(0.5 * (CASE WHEN p > 0
                                 THEN p * LN(p / ((p + q) / 2.0))
                                 ELSE 0 END)
                     + 0.5 * (CASE WHEN q > 0
                                   THEN q * LN(q / ((p + q) / 2.0))
                                   ELSE 0 END)), 6) AS jsd
    FROM probs
    """,
)
def q_ml_jsd(spark, sf_dir):
    """Jensen–Shannon divergence between the purchase and click `value`
    distributions on a fixed 20-bin histogram (width 25, top bin open).
    JSD = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, with the exact x·ln(x) → 0
    zero-guard. Histogram counts are one conditional aggregation keyed by
    bin; the divergence is a 20-row reduction of exact integer ratios —
    symmetric and bounded by ln 2, unlike raw KL."""
    ev = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    binned = ev.groupBy(
        F.least(F.floor(F.col("value") / 25.0).cast("int"), F.lit(19)).alias(
            "bin"
        )
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "nq"
        ),
    )
    w = Window.partitionBy()
    probs = binned.select(
        (F.col("np") / F.sum("np").over(w).cast("double")).alias("p"),
        (F.col("nq") / F.sum("nq").over(w).cast("double")).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    m = (p + q) / 2.0
    term = 0.5 * F.when(p > 0, p * F.log(p / m)).otherwise(0.0) + 0.5 * F.when(
        q > 0, q * F.log(q / m)
    ).otherwise(0.0)
    return probs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        r6(F.sum(term)).alias("jsd"),
    )


def _centroids(spark, sf_dir):
    """Per-(label, dimension) centroid components via posexplode — one
    aggregation keyed (label, pos), 10×64 output rows at any scale."""
    emb = T(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode("embedding").alias("pos", "x")
        )
        .groupBy("label", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
    )


_CENTROID_SQL = """
        SELECT label, pos, AVG(x) AS c FROM (
            SELECT label, generate_subscripts(embedding, 1) AS pos,
                   CAST(UNNEST(embedding) AS DOUBLE) AS x
            FROM embeddings
        ) GROUP BY label, pos
"""


@query(
    "q_ml_centroid_dist",
    oracle=f"""
    WITH cent AS ({_CENTROID_SQL})
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(SQRT(SUM((a.c - b.c) * (a.c - b.c))), 6) AS dist
    FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def q_ml_centroid_dist(spark, sf_dir):
    """Inter-class separation audit: Euclidean distance between every pair
    of label centroids (45 pairs for 10 labels). The centroid table is
    label×dim = 640 rows regardless of data size, so the pairwise join is
    free; the only fact-table pass is the component-mean aggregation. This
    is the one-pass diagnostic behind 'are these embedding classes even
    separable' — the between-class half of a Fisher discriminant check."""
    cent = _centroids(spark, sf_dir)
    a = cent.select(
        F.col("label").alias("label_a"), "pos", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("pos").alias("pos_b"),
        F.col("c").alias("cb"),
    )
    return (
        a.join(
            b,
            (F.col("pos") == F.col("pos_b"))
            & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            r6(
                F.sqrt(
                    F.sum(
                        (F.col("ca") - F.col("cb"))
                        * (F.col("ca") - F.col("cb"))
                    )
                )
            ).alias("dist")
        )
    )


@query(
    "q_ml_emb_outliers",
    oracle=f"""
    WITH cent AS ({_CENTROID_SQL}),
    comps AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
               CAST(UNNEST(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    dists AS (
        SELECT comps.vec_id, comps.label,
               SQRT(SUM((comps.x - cent.c) * (comps.x - cent.c))) AS dist
        FROM comps JOIN cent
          ON comps.label = cent.label AND comps.pos = cent.pos
        GROUP BY comps.vec_id, comps.label
    )
    SELECT vec_id, label, ROUND(dist, 6) AS dist
    FROM dists
    ORDER BY ROUND(dist, 6) DESC, vec_id
    LIMIT 10
    """,
)
def q_ml_emb_outliers(spark, sf_dir):
    """Embedding outlier detection: the 10 vectors farthest from their own
    label centroid (L2). The centroid table (640 rows) broadcasts into the
    component join, so the plan is scan → broadcast-hash join → per-vector
    re-aggregation — one shuffle keyed vec_id at any scale. Selection
    orders by the ROUNDED distance with vec_id tie-break (grid-stable)."""
    cent = _centroids(spark, sf_dir)
    comps = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    dists = (
        comps.join(
            F.broadcast(cent.withColumnRenamed("label", "c_label")),
            (F.col("label") == F.col("c_label"))
            & (comps.pos == cent.pos),
        )
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            ).alias("dist")
        )
    )
    return (
        dists.select("vec_id", "label", r6("dist").alias("dist"))
        .orderBy(F.desc("dist"), "vec_id")
        .limit(10)
    )


@query(
    "q_events_adoption",
    oracle="""
    WITH firsts AS (
        SELECT event_type, user_id,
               CAST(MIN(date_trunc('day', ts)) AS TIMESTAMP) AS first_day
        FROM events GROUP BY event_type, user_id
    ),
    daily AS (
        SELECT event_type, first_day AS day, COUNT(*) AS new_users
        FROM firsts GROUP BY event_type, first_day
    )
    SELECT event_type, day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM daily
    """,
)
def q_events_adoption(spark, sf_dir):
    """Cumulative adoption curve: per event_type and day, how many users
    performed the action for the FIRST time that day, and the running
    distinct-user total. Cumulative COUNT(DISTINCT) over a window is
    rewritten as first-occurrence extraction (per-(type,user) MIN day —
    one aggregation) plus an ordinary prefix sum over the tiny
    (type × day) frame — the standard scalable form; a naive windowed
    distinct would hold per-frame state proportional to users."""
    ev = T(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily = firsts.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return daily.select(
        "event_type",
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@query(
    "q_win_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               SUM(CASE WHEN event_type = 'purchase' THEN 1
                        ELSE 0 END)::DOUBLE AS x,
               SUM(CASE WHEN event_type = 'error' THEN 1
                        ELSE 0 END)::DOUBLE AS y
        FROM events GROUP BY 1
    ),
    roll AS (
        SELECT day,
               COUNT(*) OVER w AS n, SUM(x) OVER w AS sx,
               SUM(y) OVER w AS sy, SUM(x * x) OVER w AS sxx,
               SUM(x * y) OVER w AS sxy, SUM(y * y) OVER w AS syy,
               ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS roll_corr
    FROM roll
    WHERE rn >= 7
      AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
)
def q_win_rolling_corr(spark, sf_dir):
    """7-day rolling correlation between the daily purchase and error
    counts — computed from WINDOWED MOMENT SUMS (n, Σx, Σy, Σxx, Σxy,
    Σyy over ROWS 6 PRECEDING), not an engine corr-over-window, so the
    zero-variance guard and the arithmetic are explicit and identical on
    both engines (engine corr functions disagree on NULL-vs-NaN for
    constant frames). Counts are exact integers; the frame is the tiny
    daily series. Rows before a full 7-day history are excluded."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("double")
        .alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    wr = Window.orderBy("day")
    roll = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.row_number().over(wr).alias("rn"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    return (
        roll.filter((F.col("rn") >= 7) & (vx > 0) & (vy > 0))
        .select(
            "day",
            r6((n * F.col("sxy") - sx * sy) / F.sqrt(vx * vy)).alias(
                "roll_corr"
            ),
        )
    )


@query(
    "q_llm_length_percentiles",
    oracle="""
    WITH lens AS (
        SELECT lang, len(string_split(text, ' ')) AS tlen,
               COUNT(*) AS cnt
        FROM documents GROUP BY lang, tlen
    ),
    cum AS (
        SELECT lang, tlen,
               SUM(cnt) OVER (PARTITION BY lang ORDER BY tlen
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cw,
               SUM(cnt) OVER (PARTITION BY lang) AS n
        FROM lens
    )
    SELECT lang,
           CAST(MIN(CASE WHEN cw >= 0.1 * n THEN tlen END) AS BIGINT)
               AS p10,
           CAST(MIN(CASE WHEN cw >= 0.5 * n THEN tlen END) AS BIGINT)
               AS p50,
           CAST(MIN(CASE WHEN cw >= 0.9 * n THEN tlen END) AS BIGINT)
               AS p90
    FROM cum GROUP BY lang
    """,
)
def q_llm_length_percentiles(spark, sf_dir):
    """Per-language document-length profile at p10/p50/p90 token counts,
    discrete semantics (smallest observed length whose cumulative count
    reaches p·n) — the length-filter calibration table for a training
    pipeline (cut thresholds come from these percentiles, not from
    means, because length is heavy-tailed; SURVEY §2.8 q_llm_textstats
    reports the means this corrects). One (lang, length) count
    aggregation, one prefix scan per language."""
    docs = T(spark, sf_dir, "documents")
    lens = docs.groupBy(
        "lang", F.size(F.split("text", " ")).alias("tlen")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("lang").orderBy("tlen").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("lang")
    cum = lens.select(
        "lang",
        "tlen",
        F.sum("cnt").over(w_cum).alias("cw"),
        F.sum("cnt").over(w_all).alias("n"),
    )

    def pick(p):
        return F.min(
            F.when(F.col("cw") >= p * F.col("n"), F.col("tlen"))
        ).cast("bigint")

    return cum.groupBy("lang").agg(
        pick(0.1).alias("p10"), pick(0.5).alias("p50"), pick(0.9).alias("p90")
    )


@query(
    "q_ml_cov_offdiag",
    oracle="""
    WITH comps AS (
        SELECT vec_id, pos, x FROM (
            SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                   CAST(UNNEST(embedding) AS DOUBLE) AS x
            FROM embeddings
        ) WHERE pos <= 16
    ),
    n AS (SELECT COUNT(DISTINCT vec_id)::DOUBLE AS n FROM comps),
    means AS (SELECT pos, AVG(x) AS m FROM comps GROUP BY pos),
    cross_sums AS (
        SELECT a.pos AS i, b.pos AS j, SUM(a.x * b.x) AS sxy
        FROM comps a JOIN comps b
          ON a.vec_id = b.vec_id AND a.pos < b.pos
        GROUP BY a.pos, b.pos
    ),
    offd AS (
        SELECT SUM(ABS(cs.sxy / n.n - ma.m * mb.m)) AS off_mass
        FROM cross_sums cs
        JOIN means ma ON ma.pos = cs.i
        JOIN means mb ON mb.pos = cs.j
        CROSS JOIN n
    ),
    diag AS (
        SELECT SUM(v) AS diag_mass FROM (
            SELECT VAR_POP(x) AS v FROM comps GROUP BY pos
        )
    )
    SELECT CAST(16 AS BIGINT) AS n_dims,
           ROUND(diag.diag_mass, 6) AS diag_mass,
           ROUND(2.0 * offd.off_mass, 6) AS offdiag_mass,
           ROUND(2.0 * offd.off_mass / diag.diag_mass, 6)
               AS anisotropy_ratio
    FROM offd, diag
    """,
)
def q_ml_cov_offdiag(spark, sf_dir):
    """Embedding whitening audit over the first 16 dimensions: total
    |off-diagonal| covariance mass vs the variance (diagonal) mass of the
    component covariance matrix. Ratio ≈ 0 means the space is already
    decorrelated (cosine kNN and PQ quantizers behave); a large ratio
    says whitening/PCA (q_ml_pca) should run before q_llm_quantize. The
    cross-moment table comes from a self-join on vec_id restricted to
    i < j — 120 upper-triangle pairs per vector, bounded by dims², not
    data size."""
    emb = T(spark, sf_dir, "embeddings")
    # five consumers (count, means, both self-join sides, diagonal) —
    # uncached, each re-exploded the vector table from parquet (6
    # embeddings scans measured round 4; 1 with the checkpoint)
    comps = _ckpt(
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "x"))
        .filter(F.col("pos") < 16)
        .select(
            "vec_id", (F.col("pos") + 1).alias("pos"),
            F.col("x").cast("double").alias("x"),
        )
    )
    n = comps.agg(
        F.countDistinct("vec_id").cast("double").alias("n")
    )
    means = comps.groupBy("pos").agg(F.avg("x").alias("m"))
    a = comps.select(
        "vec_id", F.col("pos").alias("i"), F.col("x").alias("xi")
    )
    b = comps.select(
        F.col("vec_id").alias("vid2"),
        F.col("pos").alias("j"),
        F.col("x").alias("xj"),
    )
    cross_sums = (
        a.join(
            b,
            (F.col("vec_id") == F.col("vid2")) & (F.col("i") < F.col("j")),
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("xj")).alias("sxy"))
    )
    ma = means.select(F.col("pos").alias("i"), F.col("m").alias("mi"))
    mb = means.select(F.col("pos").alias("j"), F.col("m").alias("mj"))
    offd = (
        cross_sums.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.abs(
                    F.col("sxy") / F.col("n") - F.col("mi") * F.col("mj")
                )
            ).alias("off_mass")
        )
    )
    diag = comps.groupBy("pos").agg(F.var_pop("x").alias("v")).agg(
        F.sum("v").alias("diag_mass")
    )
    return offd.crossJoin(F.broadcast(diag)).select(
        F.lit(16).cast("bigint").alias("n_dims"),
        r6(F.col("diag_mass")).alias("diag_mass"),
        r6(2.0 * F.col("off_mass")).alias("offdiag_mass"),
        r6(2.0 * F.col("off_mass") / F.col("diag_mass")).alias(
            "anisotropy_ratio"
        ),
    )


@query(
    "q_events_seasonal_decompose",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*)::DOUBLE AS c
        FROM events GROUP BY 1
    ),
    trended AS (
        SELECT day, c,
               AVG(c) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS trend,
               ROW_NUMBER() OVER (ORDER BY day) AS rn,
               COUNT(*) OVER () AS nd
        FROM daily
    )
    SELECT CAST(isodow(day) AS BIGINT) AS iso_dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(c - trend), 6) AS seasonal_effect
    FROM trended
    WHERE rn >= 4 AND rn <= nd - 3
    GROUP BY isodow(day)
    """,
)
def q_events_seasonal_decompose(spark, sf_dir):
    """Classical seasonal decomposition of the daily event-count series:
    trend = centered 7-day moving average (full windows only), residual
    = count − trend, weekly seasonal effect = mean residual per ISO
    day-of-week — the additive STL-lite every capacity planner runs
    (q_events_seasonality profiles raw weekday loads; this removes the
    trend first, so a ramp-up doesn't masquerade as seasonality). Window
    arithmetic over the 30-row daily frame; ISO dow (1 = Monday) on both
    engines (Spark weekday()+1 ≡ DuckDB isodow)."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    wr = Window.orderBy("day")
    wa = Window.partitionBy()
    trended = daily.select(
        "day",
        "c",
        F.avg("c").over(w7).alias("trend"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wa).alias("nd"),
    )
    return (
        trended.filter(
            (F.col("rn") >= 4) & (F.col("rn") <= F.col("nd") - 3)
        )
        .groupBy(
            (F.weekday("day") + 1).cast("bigint").alias("iso_dow")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            r6(F.avg(F.col("c") - F.col("trend"))).alias("seasonal_effect"),
        )
    )


@query(
    "q_ml_knn_dist_outliers",
    oracle="""
    WITH lab AS (
        SELECT vec_id, embedding FROM embeddings WHERE label = 0
    ),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               UNNEST(a.embedding) AS x, UNNEST(b.embedding) AS y
        FROM lab a JOIN lab b ON a.vec_id <> b.vec_id
    ),
    dists AS (
        SELECT va, vb,
               SQRT(SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                        * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))) AS d
        FROM pairs GROUP BY va, vb
    ),
    ranked AS (
        SELECT va, d,
               ROW_NUMBER() OVER (PARTITION BY va
                                  ORDER BY ROUND(d, 6), vb) AS rn
        FROM dists
    ),
    knn AS (
        SELECT va AS vec_id, AVG(d) AS knn_dist
        FROM ranked WHERE rn <= 5 GROUP BY va
    )
    SELECT vec_id, ROUND(knn_dist, 6) AS knn_dist
    FROM knn
    ORDER BY ROUND(knn_dist, 6) DESC, vec_id
    LIMIT 10
    """,
)
def q_ml_knn_dist_outliers(spark, sf_dir):
    """Density-based outlier detection within label 0: each vector's mean
    distance to its 5 nearest same-label neighbours, top-10 sparsest
    points — the k-NN-distance novelty score (the core of LOF without
    the reachability normalization). Neighbour selection and the final
    ranking both order on ROUNDED distances with id tie-breaks
    (grid-stable). Blocking on the label bounds the pair count at
    |class|²; the 100 TB path swaps the block for q_ann_ivf's partition
    pruning while keeping this exact scorer inside each bucket."""
    emb = T(spark, sf_dir, "embeddings").filter(F.col("label") == 0)
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = a.join(F.broadcast(b), F.col("va") != F.col("vb"))
    d = F.sqrt(
        F.aggregate(
            F.zip_with(
                "ea",
                "eb",
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
    )
    dists = pairs.select("va", "vb", F.round(d, 6).alias("d_r"), d.alias("d"))
    w = Window.partitionBy("va").orderBy("d_r", "vb")
    knn = (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy(F.col("va").alias("vec_id"))
        .agg(F.avg("d").alias("knn_dist"))
    )
    return (
        knn.select("vec_id", r6("knn_dist").alias("knn_dist"))
        .orderBy(F.desc("knn_dist"), "vec_id")
        .limit(10)
    )


@query(
    "q_agg_multidistinct",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS BIGINT)
               AS n_purchasers,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'error'
                                    THEN user_id END) AS BIGINT)
               AS n_error_users,
           CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
               AS n_active_days
    FROM events
    """,
)
def q_agg_multidistinct(spark, sf_dir):
    """Multiple DISTINCT aggregates over different expressions in ONE
    aggregation — the planner surface Catalyst rewrites with an Expand
    node (each row fans out once per distinct group, then a two-phase
    aggregate dedups). Business reading: total events, reach, purchaser
    and error-affected reach, and active days, in a single scan. The
    scale note IS the plan: Expand multiplies rows by the number of
    distinct clauses, so at 100 TB you cap the clause count or switch
    the low-cardinality ones to exact pre-aggregation."""
    ev = T(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_purchasers"),
        F.countDistinct(
            F.when(F.col("event_type") == "error", F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_error_users"),
        F.countDistinct(F.date_trunc("day", "ts"))
        .cast("bigint")
        .alias("n_active_days"),
    )


@query(
    "q_part_range_bounds",
    oracle="""
    WITH vals AS (
        SELECT o_totalprice AS v, COUNT(*) AS cnt
        FROM orders GROUP BY o_totalprice
    ),
    cum AS (
        SELECT v,
               SUM(cnt) OVER (ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cw,
               SUM(cnt) OVER () AS n
        FROM vals
    ),
    ks AS (SELECT UNNEST(range(1, 16)) AS k)
    SELECT CAST(ks.k AS BIGINT) AS split_id,
           ROUND(MIN(cum.v), 6) AS boundary
    FROM cum JOIN ks ON cum.cw >= ks.k * cum.n / 16.0
    GROUP BY ks.k
    """,
)
def q_part_range_bounds(spark, sf_dir):
    """Equi-depth range-partition boundaries for o_totalprice: the 15
    split points that divide orders into 16 equal-count ranges, each the
    smallest observed value whose cumulative count reaches k·n/16
    (discrete semantics — sample points, no interpolation). This is
    exactly what `repartitionByRange`/range-bucketing needs precomputed
    at 100 TB: Spark's own RangePartitioner estimates these by sampling;
    this operator computes them exactly from the distinct-value frame
    (one groupBy + one O(|distinct|) prefix scan). Also the zone-map
    complement to q_scan_zonemap's skipping audit."""
    orders = T(spark, sf_dir, "orders")
    vals = orders.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = vals.select(
        "v",
        F.sum("cnt").over(w_cum).alias("cw"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    ks = spark.range(1, 16).select(F.col("id").alias("k"))
    return (
        cum.join(
            F.broadcast(ks),
            F.col("cw") >= F.col("k") * F.col("n") / 16.0,
        )
        .groupBy(F.col("k").cast("bigint").alias("split_id"))
        .agg(r6(F.min("v")).alias("boundary"))
    )


@query(
    "q_win_leaderboard",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT u.user_id, d.day, COALESCE(daily.cnt, 0) AS cnt
        FROM users u CROSS JOIN days d
        LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day = d.day
    ),
    cum AS (
        SELECT user_id, day,
               SUM(cnt) OVER (PARTITION BY user_id ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_events
        FROM grid
    ),
    ranked AS (
        SELECT day, user_id, cum_events,
               ROW_NUMBER() OVER (PARTITION BY day
                                  ORDER BY cum_events DESC, user_id) AS rnk
        FROM cum
    )
    SELECT day, CAST(rnk AS BIGINT) AS rnk, user_id,
           CAST(cum_events AS BIGINT) AS cum_events
    FROM ranked
    WHERE rnk <= 3 AND day >= (SELECT MAX(day) FROM days)
                              - INTERVAL 4 DAY
    ORDER BY day, rnk
    """,
)
def q_win_leaderboard(spark, sf_dir):
    """Accumulating leaderboard: for each of the last 5 days, the top-3
    users by CUMULATIVE event count up to that day (row_number with
    user_id tie-break).

    Shape (optimization r13): the r12 implementation mirrored the oracle
    literally — densify a (user × day) grid so idle users keep their
    standing, run a per-user running-sum window, then a per-day rank
    window. But the output only ranks the LAST 5 days, and a user's
    cumulative count at day d is just SUM(cnt) over their daily rows with
    day ≤ d — so the dense grid, the |users|·|days| cross join and the
    running-sum window are all computable-away: broadcast the 5 target
    days onto the sparse per-(user, day) counts (map-side inequality
    join), partial-agg groupBy(target, user), rank. 7 exchanges → 3
    (daily counts, the 5×users aggregate, the rank window; plan diff in
    plans/r13/q_win_leaderboard_{before,after}.txt), and the intermediate
    is 5·|active users| instead of |users|·|days| — at 100 TB the grid is
    the scale-killer (1e9 users × 365 days) while this form stays linear
    in the daily-count table. Sums are exact longs in any order.

    VALUE EQUIVALENCE to the dense grid: a user with no events on or
    before a target day appears in the grid with cum_events = 0 and in
    the sparse form not at all; both lose every top-3 contest to any
    nonzero user, so outputs are identical whenever each target day has
    ≥ 3 nonzero users. On the fixture corpora EVERY user has events
    before the first target day (15/150/1500 nonzero users per target day
    at sf0.001/0.01/0.1 vs 3 needed — measured via DuckDB, r13), and the
    oracle keeps the dense-grid semantics, so any future data regression
    would surface as an oracle mismatch, not silence."""
    ev = T(spark, sf_dir, "events")
    # ONE pass over the fact table: the day dimension and the cutoff row
    # project from the checkpointed daily-count frame (every user/day
    # present in events is present in it)
    daily = _ckpt(
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("day")
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )
    days = daily.select("day").distinct()
    last5 = days.agg(
        (F.max("day") - F.expr("INTERVAL 4 DAY")).alias("cutoff")
    )
    tgt = (
        days.crossJoin(F.broadcast(last5))
        .filter(F.col("day") >= F.col("cutoff"))
        .select(F.col("day").alias("tgt_day"))
    )
    cum = (
        daily.join(F.broadcast(tgt), F.col("day") <= F.col("tgt_day"))
        .groupBy("tgt_day", "user_id")
        .agg(F.sum("cnt").alias("cum_events"))
    )
    w_rank = Window.partitionBy("tgt_day").orderBy(
        F.desc("cum_events"), "user_id"
    )
    return (
        cum.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("tgt_day").alias("day"),
            F.col("rnk").cast("bigint").alias("rnk"),
            "user_id",
            F.col("cum_events").cast("bigint").alias("cum_events"),
        )
        .orderBy("day", "rnk")
    )


@query(
    "q_llm_embed_alignment",
    oracle="""
    WITH pairs AS (
        SELECT da.lang AS lang_a, db.lang AS lang_b,
               ea.embedding AS va, eb.embedding AS vb
        FROM documents da
        JOIN documents db ON db.doc_id = da.doc_id + 1
        JOIN embeddings ea ON ea.vec_id = da.doc_id
        JOIN embeddings eb ON eb.vec_id = db.doc_id
    ),
    comps AS (
        SELECT lang_a = lang_b AS same_lang,
               ROW_NUMBER() OVER () AS pid,
               UNNEST(va) AS x, UNNEST(vb) AS y
        FROM pairs
    ),
    cos AS (
        SELECT same_lang,
               SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
               / (SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                  * SQRT(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
                   AS c
        FROM comps GROUP BY same_lang, pid
    )
    SELECT same_lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(c), 6) AS mean_cosine
    FROM cos GROUP BY same_lang
    """,
)
def q_llm_embed_alignment(spark, sf_dir):
    """Does the embedding space encode language? Adjacent-id document
    pairs (a deterministic, unbiased-by-content sample — ids are
    assigned independently of text) joined to their vectors via the 1:1
    doc↔vec mapping; mean cosine within same-language pairs vs
    cross-language pairs. A same≫cross gap means language dominates the
    geometry — exactly what q_llm_dedup_semantic needs to know before
    thresholding cosine across languages. Pair count is O(docs), each
    pair one 64-dim dot product."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    da = docs.select(
        F.col("doc_id").alias("ida"), F.col("lang").alias("lang_a")
    )
    db = docs.select(
        F.col("doc_id").alias("idb"), F.col("lang").alias("lang_b")
    )
    ea = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"))
    pairs = (
        da.join(db, F.col("idb") == F.col("ida") + 1)
        .join(ea, "ida")
        .join(eb, "idb")
    )
    from mapreduce_machine_learning_spark.functions import cosine

    cos = pairs.select(
        (F.col("lang_a") == F.col("lang_b")).alias("same_lang"),
        cosine("va", "vb").alias("c"),
    )
    return cos.groupBy("same_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        r6(F.avg("c")).alias("mean_cosine"),
    )
