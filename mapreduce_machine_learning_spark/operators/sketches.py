"""Distributed sketches built from relational primitives.

Probabilistic summaries are how a 100 TB engine answers frequency /
membership / cardinality questions without shuffling raw keys: the sketch is
the partial-aggregation state, merges are associative (MIN / bit OR / MAX),
and the final estimate is O(sketch) work on a single row. Spark ships HLL++
as ``approx_count_distinct`` (declared rows-only in §2.3 because its sketch
internals are engine-specific); the three sketches here are instead built
*from scratch* out of deterministic md5-derived hash functions — the same
engine-portable hash-family design as the §2.8 MinHash family — so both
engines compute bit-identical sketches and the queries carry FULL oracles.
That is the point: the sketch algebra (hash → per-partition partial state →
associative merge → estimate) is expressed entirely in relational operators,
exactly how the reference's mrjob combiners would have held it in mapper
memory, except here Catalyst's partial/final aggregation does the in-mapper
combining automatically.

Cross-engine hash recipe (verified live): ``conv(substr(md5(s),1,k),16,10)``
(Spark) ≡ ``('0x' || substr(md5(s),1,k))::BIGINT`` (DuckDB); ``bin()`` is
minimal-width in both; bit 63 is never set (DuckDB checks shift overflow, so
Bloom words are 32-bit).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query
from mapreduce_machine_learning_spark.runtime import checkpoint as _ckpt

# fixed probe tokens (§2.9-style frozen literals): a mix of in-vocabulary and
# certainly-absent words so the audits exercise both hit and miss paths
PROBES = ("join", "window", "hash", "merge", "scan",
          "zorder", "tungsten", "catalyst")

CM_DEPTH = 4      # count-min rows (salts c0..c3)
CM_WIDTH = 64     # buckets per row
BLOOM_K = 3       # hash functions (salts b0..b2)
BLOOM_WORDS = 8   # 8 × 32-bit words = 256 bits
HLL_M = 64        # registers; alpha_64 = 0.709 (Flajolet et al. 2007)


def _hash_mod(col, salt: str, hex_digits: int, mod: int):
    """Spark side of the shared hash family: first ``hex_digits`` nibbles of
    md5(salt|value) as an integer, reduced mod ``mod``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), col)), 1, hex_digits),
        16,
        10,
    ).cast("long")
    return h % mod


def _hash_mod_sql(expr: str, salt: str, hex_digits: int, mod: int) -> str:
    return (
        f"(('0x' || substr(md5('{salt}|' || {expr}), 1, {hex_digits}))"
        f"::BIGINT % {mod})"
    )


_CM_PROBE_LIST = ", ".join(f"'{p}'" for p in PROBES)


@query(
    "q_sketch_countmin",
    oracle=f"""
    WITH tok AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ), idx AS (
        SELECT UNNEST([0, 1, 2, 3]) AS i
    ), cells AS (
        SELECT i,
               {_hash_mod_sql("token", "c' || CAST(i AS VARCHAR) || '", 8, CM_WIDTH)}
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok CROSS JOIN idx GROUP BY 1, 2
    ), probes AS (
        SELECT UNNEST([{_CM_PROBE_LIST}]) AS probe
    ), ph AS (
        SELECT probe, i,
               {_hash_mod_sql("probe", "c' || CAST(i AS VARCHAR) || '", 8, CM_WIDTH)}
                   AS bucket
        FROM probes CROSS JOIN idx
    ), est AS (
        SELECT probe, MIN(COALESCE(cnt, 0)) AS est_cnt
        FROM ph LEFT JOIN cells USING (i, bucket) GROUP BY probe
    ), truth AS (
        SELECT token AS probe, CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM tok GROUP BY token
    )
    SELECT probe,
           CAST(COALESCE(true_cnt, 0) AS BIGINT) AS true_cnt,
           CAST(est_cnt AS BIGINT) AS est_cnt,
           CAST(est_cnt - COALESCE(true_cnt, 0) AS BIGINT) AS overcount
    FROM est LEFT JOIN truth USING (probe)
    """,
)
def q_sketch_countmin(spark, sf_dir):
    """Count-min sketch (d=4 × w=64) of corpus token frequencies, audited
    against exact counts for 8 fixed probe words. The sketch table is the
    partial-agg state itself: one explode → groupBy emits ≤ d·w = 256 cells
    no matter the corpus size, and cell merge is addition — so at 100 TB the
    shuffle carries 256 counters per partition while exact counting carries
    the whole vocabulary. Estimates upper-bound truth (overcount ≥ 0 is the
    CM guarantee, pinned by an invariant test); the probe lookup touches
    d rows of the tiny cell table.

    The sketch is filled from the exact-count AUDIT aggregate
    (optimization r13): the audit already pays one groupBy(token) over
    the exploded stream, and summing that aggregate's counts into cells
    is integer-exact the same as counting occurrences — so the d·|stream|
    md5 evaluations become d·|vocab| and the second tokenization scan
    disappears (1 documents scan, was 2; guide §2.3 — aggregate before
    you hash). This is a batch-query fusion, not a sketch-semantics
    change: a streaming CM still updates per occurrence; here the audit
    frame was already carrying the vocabulary through the shuffle, so
    reusing it costs nothing the plan wasn't paying."""
    docs = T(spark, sf_dir, "documents")
    # one tokenization + ONE vocab-sized aggregate feeds BOTH the sketch
    # fill and the exact-count audit (checkpointed: 2 consumers)
    tokcnt = _ckpt(
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    buckets = F.array(
        *[_hash_mod(F.col("token"), f"c{i}", 8, CM_WIDTH) for i in range(CM_DEPTH)]
    )
    cells = (
        tokcnt.select("cnt", F.posexplode(buckets).alias("i", "bucket"))
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    probes = spark.createDataFrame([(p,) for p in PROBES], ["probe"])
    pb = F.array(
        *[_hash_mod(F.col("probe"), f"c{i}", 8, CM_WIDTH) for i in range(CM_DEPTH)]
    )
    ph = probes.select("probe", F.posexplode(pb).alias("i", "bucket"))
    est = (
        ph.join(cells, ["i", "bucket"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
    truth = tokcnt.select(
        F.col("token").alias("probe"), F.col("cnt").alias("true_cnt")
    )
    return est.join(truth, "probe", "left").select(
        "probe",
        F.coalesce(F.col("true_cnt"), F.lit(0)).cast("bigint").alias("true_cnt"),
        F.col("est_cnt").cast("bigint").alias("est_cnt"),
        (F.col("est_cnt") - F.coalesce(F.col("true_cnt"), F.lit(0)))
        .cast("bigint")
        .alias("overcount"),
    )


@query(
    "q_sketch_bloom",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT lang, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    ), hashes AS (
        SELECT lang, token, j,
               {_hash_mod_sql("token", "b' || CAST(j AS VARCHAR) || '", 8, 256)} AS pos
        FROM vocab CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j)
    ), filt AS (
        SELECT lang,
               {", ".join(
                   f"bit_or(CASE WHEN pos >> 5 = {w} THEN 1::BIGINT << (pos & 31) "
                   f"ELSE 0::BIGINT END) AS w{w}" for w in range(8))}
        FROM hashes GROUP BY lang
    ), probe_hash AS (
        SELECT probe, j,
               {_hash_mod_sql("probe", "b' || CAST(j AS VARCHAR) || '", 8, 256)} AS pos
        FROM (SELECT UNNEST([{_CM_PROBE_LIST}]) AS probe)
             CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j)
    ), tests AS (
        SELECT f.lang, ph.probe,
               MIN(CASE WHEN (
                   (CASE pos >> 5
                    {" ".join(f"WHEN {w} THEN w{w}" for w in range(8))} END)
                   & (1::BIGINT << (pos & 31))) <> 0
                   THEN 1 ELSE 0 END) AS hit
        FROM filt f CROSS JOIN probe_hash ph
        GROUP BY f.lang, ph.probe
    ), truth AS (
        SELECT lang, token AS probe, 1 AS present FROM vocab
        WHERE token IN ({_CM_PROBE_LIST})
    )
    SELECT t.lang,
           (SELECT CAST({" + ".join(f"bit_count(w{w})" for w in range(8))} AS BIGINT)
            FROM filt f2 WHERE f2.lang = t.lang) AS bits_set,
           CAST(SUM(t.hit) AS BIGINT) AS n_hits,
           CAST(SUM(COALESCE(tr.present, 0)) AS BIGINT) AS n_true_members,
           CAST(SUM(CASE WHEN t.hit = 1 AND tr.present IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM tests t LEFT JOIN truth tr ON t.lang = tr.lang AND t.probe = tr.probe
    GROUP BY t.lang
    """,
)
def q_sketch_bloom(spark, sf_dir):
    """Per-language Bloom filter (256 bits as 8×32-bit words, k=3) over each
    language's vocabulary, audited against exact membership for the 8 fixed
    probes: bits set, probe hits, true members, false positives. The filter
    build is a bit_or aggregation — 8 longs of state per language however
    large the vocabulary, merged associatively exactly like a mapper-side
    combiner. No false negatives is the Bloom guarantee (invariant-tested);
    false positives are the price of 256 bits. At 100 TB this is the
    join-pruning sidecar: ship the 8-word filter, drop non-members before
    the shuffle (the same idea test_runtime_bloom_filter pins for Spark's
    built-in runtime filter)."""
    docs = T(spark, sf_dir, "documents")
    vocab = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    js = F.array(*[F.lit(j) for j in range(BLOOM_K)])
    hashes = vocab.select(
        "lang",
        "token",
        F.explode(js).alias("j"),
    ).withColumn(
        "pos",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("b"),
                        F.col("j").cast("string"),
                        F.lit("|"),
                        F.col("token"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 256,
    )
    filt = hashes.groupBy("lang").agg(
        *[
            F.expr(
                f"bit_or(CASE WHEN shiftright(pos, 5) = {w} "
                f"THEN shiftleft(cast(1 as bigint), cast(pos & 31 as int)) "
                f"ELSE cast(0 as bigint) END)"
            ).alias(f"w{w}")
            for w in range(BLOOM_WORDS)
        ]
    )
    probes = spark.createDataFrame([(p,) for p in PROBES], ["probe"])
    probe_hash = probes.select("probe", F.explode(js).alias("j")).withColumn(
        "pos",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("b"),
                        F.col("j").cast("string"),
                        F.lit("|"),
                        F.col("probe"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 256,
    )
    word_sel = "CASE shiftright(pos, 5) " + " ".join(
        f"WHEN {w} THEN w{w}" for w in range(BLOOM_WORDS)
    ) + " END"
    hit_bit = F.expr(
        f"CASE WHEN ({word_sel}) & "
        f"shiftleft(cast(1 as bigint), cast(pos & 31 as int)) <> 0 "
        f"THEN 1 ELSE 0 END"
    )
    tests = (
        filt.crossJoin(probe_hash)
        .select("lang", "probe", hit_bit.alias("hitbit"))
        .groupBy("lang", "probe")
        .agg(F.min("hitbit").alias("hit"))
    )
    truth = vocab.filter(F.col("token").isin(*PROBES)).select(
        "lang", F.col("token").alias("probe"), F.lit(1).alias("present")
    )
    bits = filt.select(
        "lang",
        sum(F.bit_count(F.col(f"w{w}")) for w in range(BLOOM_WORDS))
        .cast("bigint")
        .alias("bits_set"),
    )
    return (
        tests.join(truth, ["lang", "probe"], "left")
        .groupBy("lang")
        .agg(
            F.sum("hit").cast("bigint").alias("n_hits"),
            F.sum(F.coalesce(F.col("present"), F.lit(0)))
            .cast("bigint")
            .alias("n_true_members"),
            F.sum(
                F.when(
                    (F.col("hit") == 1) & F.col("present").isNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .join(F.broadcast(bits), "lang")
        .select(
            "lang", "bits_set", "n_hits", "n_true_members", "n_false_pos"
        )
    )


@query(
    "q_sketch_hll",
    oracle=f"""
    WITH h AS (
        SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
                   AS hv
        FROM events
    ), parts AS (
        SELECT hv & 63 AS bucket, hv >> 6 AS rest FROM h
    ), rho AS (
        SELECT bucket,
               MAX(CASE WHEN rest = 0 THEN 43
                        ELSE 43 - length(bin(rest)) END) AS m_j
        FROM parts GROUP BY bucket
    ), regs AS (
        SELECT t.bucket, COALESCE(rho.m_j, 0) AS m_j
        FROM range(64) t(bucket) LEFT JOIN rho ON t.bucket = rho.bucket
    ), est AS (
        SELECT CAST(SUM(CASE WHEN m_j > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS used_registers,
               0.709 * 64 * 64 / SUM(POW(2.0, -m_j)) AS raw_est,
               SUM(CASE WHEN m_j = 0 THEN 1.0 ELSE 0.0 END) AS zero_regs
        FROM regs
    ), corrected AS (
        SELECT used_registers, raw_est,
               CASE WHEN raw_est <= 2.5 * 64 AND zero_regs > 0
                    THEN 64.0 * LN(64.0 / zero_regs)
                    ELSE raw_est END AS final_est
        FROM est
    ), truth AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
        FROM events
    )
    SELECT CAST(64 AS BIGINT) AS m,
           used_registers,
           true_distinct,
           ROUND(raw_est, 6) AS raw_estimate,
           ROUND(final_est, 6) AS hll_estimate,
           ROUND((final_est - true_distinct) / true_distinct, 6) AS rel_err
    FROM corrected CROSS JOIN truth
    """,
)
def q_sketch_hll(spark, sf_dir):
    """HyperLogLog (m=64 registers, α₆₄=0.709) distinct-user estimate built
    from scratch: md5-derived 48-bit hash, low 6 bits pick the register,
    rank = leading-zero count of the remaining 42 bits + 1 via minimal-width
    bin() (identical in both engines — that is what makes this sketch
    full-oracle where ``approx_count_distinct``'s HLL++ is rows-only). The
    register table is a MAX aggregation: 64 bytes of mergeable state per
    partition regardless of input size — THE cardinality pattern at 100 TB.
    Empty registers enter the harmonic mean as 2⁰ via a 64-row spine left
    join; the small-range regime (raw ≤ 2.5m with empty registers) switches
    to linear counting m·ln(m/V) per Flajolet et al. 2007 — without it the
    raw estimator over-reports ~3× at the test data's low cardinality."""
    ev = T(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    parts = ev.select(
        (hv % 64).alias("bucket"), F.shiftright(hv, 6).alias("rest")
    )
    rho = parts.groupBy("bucket").agg(
        F.max(
            F.when(F.col("rest") == 0, 43).otherwise(
                43 - F.length(F.bin(F.col("rest")))
            )
        ).alias("m_j")
    )
    spine = spark.range(0, 64).select(F.col("id").cast("long").alias("bucket"))
    regs = spine.join(rho, "bucket", "left").select(
        F.coalesce(F.col("m_j"), F.lit(0)).alias("m_j")
    )
    est = regs.agg(
        F.sum(F.when(F.col("m_j") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("used_registers"),
        (F.expr("0.709 * 64 * 64") / F.sum(F.pow(F.lit(2.0), -F.col("m_j"))))
        .alias("raw_est"),
        F.sum(F.when(F.col("m_j") == 0, 1.0).otherwise(0.0)).alias("zero_regs"),
    )
    final_est = F.when(
        (F.col("raw_est") <= 2.5 * 64) & (F.col("zero_regs") > 0),
        64.0 * F.log(64.0 / F.col("zero_regs")),
    ).otherwise(F.col("raw_est"))
    truth = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("true_distinct")
    )
    return est.crossJoin(F.broadcast(truth)).select(
        F.lit(64).cast("bigint").alias("m"),
        "used_registers",
        "true_distinct",
        r6(F.col("raw_est")).alias("raw_estimate"),
        r6(final_est).alias("hll_estimate"),
        r6(
            (final_est - F.col("true_distinct")) / F.col("true_distinct")
        ).alias("rel_err"),
    )


KMV_K = 64  # k-minimum-values sketch size


@query(
    "q_sketch_kmv",
    oracle=f"""
    WITH keys AS (
        SELECT DISTINCT user_id::VARCHAR || '@' || (ts::DATE)::VARCHAR AS k
        FROM events
    ),
    hashed AS (
        SELECT ('0x' || substr(md5(k), 1, 12))::BIGINT / 281474976710656.0
                   AS h
        FROM keys
    ),
    kmin AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hashed
    )
    SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_true,
           ROUND(({KMV_K} - 1) / MAX(h), 6) AS kmv_estimate,
           ROUND(ABS(({KMV_K} - 1) / MAX(h)
                     - (SELECT COUNT(*) FROM keys))
                 / (SELECT COUNT(*) FROM keys), 6) AS rel_error
    FROM kmin WHERE rn <= {KMV_K}
    """,
)
def q_sketch_kmv(spark, sf_dir):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) over
    the active user-days in events: hash every key into [0,1) with the
    engine-portable md5 family, keep the k = 64 smallest hashes, estimate
    |D| ≈ (k-1)/h_(k). The sketch state is a bounded sorted set — per
    partition each executor keeps its own k minima (Spark's
    TakeOrderedAndProject does exactly this for the ORDER BY h LIMIT k
    plan), and merging partials is just re-taking the k smallest, an
    associative union — the mrjob combiner pattern with O(k) state. The
    hash value is an exact integer ≤ 16^12 divided by a constant, so both
    engines produce bit-identical doubles and the query carries a FULL
    oracle, unlike engine-internal HLL sketches (q_agg_approx)."""
    keys = (
        T(spark, sf_dir, "events")
        .select(
            F.concat_ws(
                "@",
                F.col("user_id").cast("string"),
                F.col("ts").cast("date").cast("string"),
            ).alias("k")
        )
        .distinct()
    )
    hashed = keys.select(
        (
            F.conv(F.substring(F.md5("k"), 1, 12), 16, 10).cast("long")
            / F.lit(281474976710656.0)
        ).alias("h")
    )
    kth = hashed.orderBy("h").limit(KMV_K).agg(F.max("h").alias("hk"))
    n_true = keys.agg(F.count(F.lit(1)).alias("n_true"))
    est = F.lit(KMV_K - 1) / F.col("hk")
    return kth.crossJoin(n_true).select(
        F.col("n_true").cast("bigint").alias("n_true"),
        r6(est).alias("kmv_estimate"),
        r6(F.abs(est - F.col("n_true")) / F.col("n_true")).alias(
            "rel_error"
        ),
    )


HIST_BINS = 64


@query(
    "q_sketch_quantile_hist",
    oracle=f"""
    WITH ext AS (
        SELECT MIN(value) AS vmin, MAX(value) AS vmax,
               COUNT(*)::DOUBLE AS n
        FROM events
    ),
    binned AS (
        SELECT LEAST(CAST(FLOOR((value - vmin) / (vmax - vmin)
                                * {HIST_BINS}) AS BIGINT),
                     {HIST_BINS - 1}) AS bin
        FROM events, ext
    ),
    hist AS (
        SELECT bin, COUNT(*)::DOUBLE AS c FROM binned GROUP BY bin
    ),
    cum AS (
        SELECT bin, SUM(c) OVER (ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM hist
    ),
    qs AS (SELECT UNNEST([0.5, 0.9, 0.99])::DOUBLE AS q),
    est AS (
        SELECT q,
               MIN(bin) AS qbin
        FROM qs, cum, ext
        WHERE cum_c >= q * n
        GROUP BY q
    )
    SELECT q,
           ROUND(vmin + (qbin + 1) * (vmax - vmin) / {HIST_BINS}, 6)
               AS hist_estimate
    FROM est, ext
    """,
)
def q_sketch_quantile_hist(spark, sf_dir):
    """Mergeable equi-width histogram quantile sketch: 64 fixed bins over
    [min, max] of events.value; quantile estimate = upper edge of the
    first bin whose cumulative count reaches q·n. The histogram is the
    canonical mergeable quantile state (per-partition partial counts sum
    associatively — the same combiner algebra as count-min/HLL/KMV in
    this module), giving estimates within one bin width with O(bins)
    state where exact percentile needs a sort. Bin assignment uses
    identical double arithmetic on both engines, so bins — and therefore
    the estimate — are deterministic."""
    ev = T(spark, sf_dir, "events")
    # 1-row extent frame, consumed by the binning pass, both quantile
    # cross-joins, and the output edge math — uncached, every consumer
    # re-ran the min/max/count scan (5 events scans measured round 4)
    ext = _ckpt(
        ev.agg(
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    binned = ev.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * HIST_BINS
            ).cast("bigint"),
            F.lit(HIST_BINS - 1),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", F.sum("c").over(wcum).alias("cum_c"))
    qs = F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q")
    est = (
        cum.crossJoin(F.broadcast(ext.select("n")))
        .select("bin", "cum_c", "n")
        .crossJoin(ext.select(qs))
        .filter(F.col("cum_c") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("bin").alias("qbin"))
    )
    return est.crossJoin(F.broadcast(ext)).select(
        "q",
        r6(
            F.col("vmin")
            + (F.col("qbin") + 1)
            * (F.col("vmax") - F.col("vmin"))
            / HIST_BINS
        ).alias("hist_estimate"),
    )


@query(
    "q_sketch_kmv_setops",
    oracle=f"""
    WITH a_keys AS (
        SELECT DISTINCT user_id::VARCHAR || '@' || (ts::DATE)::VARCHAR AS k
        FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
    ),
    b_keys AS (
        SELECT DISTINCT user_id::VARCHAR || '@' || (ts::DATE)::VARCHAR AS k
        FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    ),
    ah AS (
        SELECT ('0x' || substr(md5(k), 1, 12))::BIGINT
                   / 281474976710656.0 AS h,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5(k), 1, 12))::BIGINT) AS rn
        FROM a_keys
    ),
    bh AS (
        SELECT ('0x' || substr(md5(k), 1, 12))::BIGINT
                   / 281474976710656.0 AS h,
               ROW_NUMBER() OVER (
                   ORDER BY ('0x' || substr(md5(k), 1, 12))::BIGINT) AS rn
        FROM b_keys
    ),
    ka AS (SELECT h FROM ah WHERE rn <= {KMV_K}),
    kb AS (SELECT h FROM bh WHERE rn <= {KMV_K}),
    un AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
        FROM (SELECT h FROM ka UNION SELECT h FROM kb)
    ),
    ku AS (SELECT h FROM un WHERE rn <= {KMV_K}),
    est AS (
        SELECT ({KMV_K} - 1) / (SELECT MAX(h) FROM ku) AS union_est,
               (SELECT COUNT(*) FROM ku
                WHERE h IN (SELECT h FROM ka)
                  AND h IN (SELECT h FROM kb))
                   / CAST({KMV_K} AS DOUBLE) AS jaccard_est
    )
    SELECT CAST((SELECT COUNT(*) FROM
                 (SELECT k FROM a_keys UNION SELECT k FROM b_keys))
                AS BIGINT) AS true_union,
           CAST((SELECT COUNT(*) FROM a_keys
                 WHERE k IN (SELECT k FROM b_keys)) AS BIGINT)
               AS true_intersection,
           ROUND(union_est, 6) AS union_est,
           ROUND(jaccard_est, 6) AS jaccard_est,
           ROUND(union_est * jaccard_est, 6) AS intersection_est
    FROM est
    """,
)
def q_sketch_kmv_setops(spark, sf_dir):
    """KMV sketch ALGEBRA — the property that makes bottom-k sketches the
    distributed tool for set cardinality: the union sketch is just the k
    smallest of the two sketches' union (associative, computable from
    sketches alone), and Jaccard ≈ |kmin(A∪B) ∩ kmin(A) ∩ kmin(B)| / k
    (Broder-style min-wise estimate), giving
    |A∩B| ≈ Jaccard · |A∪B| without ever touching raw keys again. Sets =
    active user-days of the first vs second half-month. At 100 TB each
    side's sketch is an O(k) TakeOrdered; every set operation thereafter
    is driver-side arithmetic on 2k doubles."""
    ev = T(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")

    # ONE keyed aggregation builds every key set (r14; previously each
    # side ran its own DISTINCT exchange and the truth audit re-exchanged
    # their persisted union a third time): groupBy(k) with min/max side
    # flags dedups map-side exactly like the per-side DISTINCTs did, each
    # side's distinct key set is a filter of the grouped frame, and the
    # exact-truth audit is a plain aggregate over the same persisted rows
    # — no third exchange. The k-row sketches stay checkpointed because
    # three set operations consume each.
    g = _ckpt(
        ev.select(
            F.concat_ws(
                "@",
                F.col("user_id").cast("string"),
                F.col("ts").cast("date").cast("string"),
            ).alias("k"),
            (F.col("ts") >= cutoff).cast("int").alias("side"),
        )
        .groupBy("k")
        .agg(F.min("side").alias("s_min"), F.max("side").alias("s_max"))
    )
    a_keys = g.filter(F.col("s_min") == 0).select("k")
    b_keys = g.filter(F.col("s_max") == 1).select("k")

    def sketch(kdf):
        return (
            kdf.select(
                (
                    F.conv(F.substring(F.md5("k"), 1, 12), 16, 10)
                    .cast("long")
                    / F.lit(281474976710656.0)
                ).alias("h")
            )
            .orderBy("h")
            .limit(KMV_K)
        )

    ka = sketch(a_keys).transform(_ckpt)
    kb = sketch(b_keys).transform(_ckpt)
    ku = (
        ka.unionByName(kb).distinct().orderBy("h").limit(KMV_K)
    )
    union_kth = ku.agg(F.max("h").alias("hk"))
    inter_cnt = (
        ku.join(ka.withColumnRenamed("h", "ha"), F.col("h") == F.col("ha"))
        .join(kb.withColumnRenamed("h", "hb"), F.col("h") == F.col("hb"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_common"))
    )
    # exact truth (the audit baseline) off the SAME grouped frame:
    # |A∪B| = its row count, |A∩B| = keys whose side flags span both
    truth = g.agg(
        F.count(F.lit(1)).alias("true_union"),
        F.sum(
            F.when(
                (F.col("s_min") == 0) & (F.col("s_max") == 1), 1
            ).otherwise(0)
        ).alias("true_intersection"),
    )
    union_est = F.lit(KMV_K - 1) / F.col("hk")
    jacc = F.col("n_common") / KMV_K
    return (
        union_kth.crossJoin(inter_cnt)
        .crossJoin(truth)
        .select(
            F.col("true_union").cast("bigint").alias("true_union"),
            F.col("true_intersection")
            .cast("bigint")
            .alias("true_intersection"),
            r6(union_est).alias("union_est"),
            r6(jacc).alias("jaccard_est"),
            r6(union_est * jacc).alias("intersection_est"),
        )
    )
