"""Set operations and scalar-function surface (SURVEY.md §2.5).

Cross-engine dialect traps handled here (§2.1/§2.5 rules):
- Spark ``floor``/``ceil`` return BIGINT, DuckDB's return DOUBLE → the oracle
  casts them.
- double→int casts round differently (Spark truncates, DuckDB rounds) → both
  sides use explicit FLOOR.
- regex patterns stay simple (Java vs RE2-ish dialect divergence on exotic
  syntax).
- datediff argument order: Spark ``datediff(end, start)`` ↔ DuckDB
  ``date_diff('day', start, end)``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import r6
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query


def _order_keys(spark, sf_dir):
    return T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))


def _rich_keys(spark, sf_dir):
    return (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )


@query(
    "q_set_unionall",
    oracle="""
    WITH u AS (
        SELECT o_custkey AS custkey FROM orders
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(COUNT(DISTINCT custkey) AS BIGINT) AS dcnt
    FROM u
    """,
)
def q_set_unionall(spark, sf_dir):
    """UNION ALL — pure concatenation of partitions, no shuffle at all."""
    u = _order_keys(spark, sf_dir).unionByName(_rich_keys(spark, sf_dir))
    return u.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("custkey").alias("dcnt"),
    )


@query(
    "q_set_union",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT o_custkey AS custkey FROM orders
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    """,
)
def q_set_union(spark, sf_dir):
    """UNION DISTINCT = concat + hash-dedup (one shuffle on the full row)."""
    u = (
        _order_keys(spark, sf_dir)
        .unionByName(_rich_keys(spark, sf_dir))
        .distinct()
    )
    return u.agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "q_set_intersect",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT o_custkey AS custkey FROM orders
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    """,
)
def q_set_intersect(spark, sf_dir):
    """INTERSECT — Catalyst rewrites to a left-semi join over distinct rows."""
    i = _order_keys(spark, sf_dir).intersect(_rich_keys(spark, sf_dir))
    return i.agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "q_set_except",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    """,
)
def q_set_except(spark, sf_dir):
    """EXCEPT (set difference, distinct) — Catalyst's left-anti rewrite."""
    e = _order_keys(spark, sf_dir).subtract(_rich_keys(spark, sf_dir))
    return e.agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "q_str_funcs",
    oracle="""
    SELECT substr(c_name, 18, 1) AS last_digit,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(UPPER(c_name)) AS min_upper,
           MAX(CONCAT(TRIM(c_name), '!')) AS max_concat,
           MIN(REPLACE(c_name, 'Customer', 'CUST')) AS min_replace,
           MIN(LOWER(c_name)) AS min_lower,
           MIN(LENGTH(c_name)) AS min_len
    FROM customer
    GROUP BY last_digit
    """,
)
def q_str_funcs(spark, sf_dir):
    """String-function sweep (upper/lower/substr/length/trim/concat/replace)
    grouped by the last digit of c_name (both engines' substr is 1-based)."""
    c = T(spark, sf_dir, "customer")
    return (
        c.select(
            F.substring("c_name", 18, 1).alias("last_digit"),
            "c_name",
        )
        .groupBy("last_digit")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.upper("c_name")).alias("min_upper"),
            F.max(F.concat(F.trim(F.col("c_name")), F.lit("!"))).alias("max_concat"),
            F.min(F.replace(F.col("c_name"), F.lit("Customer"), F.lit("CUST"))).alias(
                "min_replace"
            ),
            F.min(F.lower("c_name")).alias("min_lower"),
            F.min(F.length("c_name")).cast("bigint").alias("min_len"),
        )
    )


@query(
    "q_str_regexp",
    oracle="""
    SELECT regexp_extract(source, '([0-9]+)', 1) AS src_num,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM documents
    GROUP BY src_num
    """,
)
def q_str_regexp(spark, sf_dir):
    """regexp_extract with a deliberately simple pattern (digit runs) —
    identical across the Java and RE2-style dialects."""
    return (
        T(spark, sf_dir, "documents")
        .select(F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"))
        .groupBy("src_num")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(date_diff('day', DATE '1995-01-01', o_orderdate)), 6)
               AS avg_days_since
    FROM orders
    GROUP BY yr, mo, month_start
    """,
)
def q_date_funcs(spark, sf_dir):
    """Date kernel: year/month extraction, month truncation, day arithmetic
    against a fixed epoch (datediff argument order differs between engines —
    handled in the oracle)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("dd"),
        )
        .groupBy("yr", "mo", "month_start")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            r6(F.avg("dd")).alias("avg_days_since"),
        )
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_returnflag,
           ROUND(AVG(SQRT(l_quantity)), 6) AS avg_sqrt_qty,
           ROUND(AVG(LN(l_extendedprice)), 6) AS avg_ln_price,
           ROUND(AVG(POW(l_discount, 2)), 6) AS avg_disc_sq,
           ROUND(AVG(ABS(l_quantity - 25.0)), 6) AS avg_abs_dev,
           CAST(SUM(CAST(FLOOR(l_tax * 100) AS BIGINT)) AS BIGINT) AS sum_floor_tax,
           CAST(SUM(CAST(CEIL(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_ceil_disc,
           ROUND(AVG(l_quantity % 7), 6) AS avg_mod7
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_math_funcs(spark, sf_dir):
    """Math-function sweep. Spark's floor/ceil already return BIGINT; the
    oracle casts DuckDB's DOUBLE results to match."""
    li = T(spark, sf_dir, "lineitem")
    q, p, d, t = (
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
    )
    return li.groupBy("l_returnflag").agg(
        r6(F.avg(F.sqrt(q))).alias("avg_sqrt_qty"),
        r6(F.avg(F.log(p))).alias("avg_ln_price"),
        r6(F.avg(F.pow(d, 2))).alias("avg_disc_sq"),
        r6(F.avg(F.abs(q - 25.0))).alias("avg_abs_dev"),
        F.sum(F.floor(t * 100)).alias("sum_floor_tax"),
        F.sum(F.ceil(d * 100)).alias("sum_ceil_disc"),
        r6(F.avg(q % 7)).alias("avg_mod7"),
    )


@query(
    "q_case_cast",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), '(pending)') AS status_c,
           CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS price_bin,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY bucket, status_c, price_bin
    """,
)
def q_case_cast(spark, sf_dir):
    """CASE/WHEN buckets + NULLIF/COALESCE + explicit FLOOR binning (the
    §2.5 rule: never CAST(double AS INT) cross-engine — Spark truncates,
    DuckDB rounds)."""
    o = T(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return (
        o.select(
            F.when(price < 100000, "low")
            .when(price < 300000, "mid")
            .otherwise("high")
            .alias("bucket"),
            F.coalesce(
                F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("(pending)")
            ).alias("status_c"),
            F.floor(price / 100000).alias("price_bin"),
        )
        .groupBy("bucket", "status_c", "price_bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS docs,
           ROUND(AVG(len(string_split(text, ' '))), 6) AS avg_tokens,
           CAST(SUM(CASE WHEN list_contains(string_split(text, ' '), 'spark')
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_spark
    FROM documents
    GROUP BY lang
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array kernel over tokenized text: split → size / array_contains
    (single-space tokenization, verified identical to string_split)."""
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        r6(F.avg(F.size(toks))).alias("avg_tokens"),
        F.sum(F.when(F.array_contains(toks, "spark"), 1).otherwise(0)).alias(
            "docs_with_spark"
        ),
    )


@query(
    "q_explode_tokens",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
)
def q_explode_tokens(spark, sf_dir):
    """explode() (generator) → global token top-20 with total order
    (count DESC, token ASC). The explode multiplies rows ~60× but the agg
    immediately collapses them with map-side partial aggregation."""
    return (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
    )


@query(
    "q_map_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6)
               AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_map_json(spark, sf_dir):
    """JSON-path access on a string column (props stays StringType at rest —
    no MapType; get_json_object ↔ json_extract_string parity verified)."""
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        r6(F.avg(k)).alias("avg_k"),
    )


@query(
    "q_str_fuzzy",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT substr(a.p_name, 1, 1) AS block,
           CAST(COUNT(*) AS BIGINT) AS close_pairs,
           CAST(MIN(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist
    FROM names a JOIN names b
      ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    GROUP BY block
    """,
)
def q_str_fuzzy(spark, sf_dir):
    """Fuzzy string matching: name pairs within edit distance 3, blocked on
    the first character — string-level near-dup detection (catches typo
    variants that hash-based dedup misses). The blocking key is the same
    candidate-pruning idea as LSH banding: compare within blocks, never all
    pairs. Spark and DuckDB implement the same Levenshtein metric."""
    names = T(spark, sf_dir, "part").select("p_name").distinct()
    a, b = names.alias("a"), names.alias("b")
    an, bn = F.col("a.p_name"), F.col("b.p_name")
    dist = F.levenshtein(an, bn)
    return (
        a.join(
            b,
            (F.substring(an, 1, 1) == F.substring(bn, 1, 1)) & (an < bn),
        )
        .filter(dist <= 3)
        .groupBy(F.substring(an, 1, 1).alias("block"))
        .agg(
            F.count(F.lit(1)).alias("close_pairs"),
            F.min(dist).cast("bigint").alias("min_dist"),
        )
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.08) AS any_big_discount,
           CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS tax_free
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_bool(spark, sf_dir):
    """Boolean aggregates + filtered count: every/any/count-where — the
    predicate-summary idioms (data-quality assertions at scale are exactly
    these, pushed into one aggregation pass)."""
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.08).alias("any_big_discount"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("tax_free"),
    )


@query(
    "q_array_hof",
    oracle="""
    SELECT lang,
           ROUND(AVG(len(list_filter(string_split(text, ' '),
                                     t -> length(t) > 4))), 6)
               AS avg_long_tokens,
           ROUND(AVG(list_sum(list_transform(string_split(text, ' '),
                                             t -> CAST(length(t) AS BIGINT)))),
                 6) AS avg_token_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_array_hof(spark, sf_dir):
    """Higher-order array functions with lambdas: filter (long tokens),
    transform+aggregate (total token chars) — all JVM-side codegen over the
    array column, the pattern every vector/text kernel in this engine builds
    on. Both engines execute structurally identical lambda expressions."""
    toks = F.split("text", " ")
    long_tokens = F.size(F.filter(toks, lambda t: F.length(t) > 4))
    token_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            r6(F.avg(long_tokens)).alias("avg_long_tokens"),
            r6(F.avg(token_chars)).alias("avg_token_chars"),
        )
    )


@query(
    "q_str_funcs2",
    oracle="""
    SELECT split_part(p_name, ' ', 1) AS adjective,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(lpad(p_brand, 10, '_')) AS min_lpad,
           MAX(rpad(p_type, 12, '.')) AS max_rpad,
           MIN(reverse(p_name)) AS min_reversed,
           MIN(left(p_name, 3)) AS min_left3,
           MAX(right(p_name, 3)) AS max_right3
    FROM part
    GROUP BY adjective
    """,
)
def q_str_funcs2(spark, sf_dir):
    """Second string sweep: split_part / lpad / rpad / reverse / left /
    right — same 1-based, same padding semantics on both engines."""
    p = T(spark, sf_dir, "part")
    return (
        p.select(
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adjective"),
            "p_name",
            "p_brand",
            "p_type",
        )
        .groupBy("adjective")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.lpad("p_brand", 10, "_")).alias("min_lpad"),
            F.max(F.rpad("p_type", 12, ".")).alias("max_rpad"),
            F.min(F.reverse("p_name")).alias("min_reversed"),
            F.min(F.substring("p_name", 1, 3)).alias("min_left3"),
            F.max(F.substring(F.col("p_name"), -3, 3)).alias("max_right3"),
        )
    )
