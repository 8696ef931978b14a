"""TPC-H query pack, adapted to the driver testdata's star schema.

The driver tables carry a subset of TPC-H's columns (FIXTURES.md): there is
no partsupp table and lineitem lacks commitdate/receiptdate/shipmode, so the
queries below keep each TPC-H query's *shape* (join graph, predicate
structure, aggregation, top-k) while substituting available columns; each
docstring states the adaptation. Together with the §2 contract queries this
gives the engine the classic multi-join decision-support surface.

Scale design: every dimension join (region, nation, supplier, part,
customer at t2 scale) is broadcast — the only shuffles left are the fact-side
aggregations, which Catalyst runs as partial+final hash aggregates. Semi/anti
shapes (Q4, Q16, Q22) use left_semi/left_anti joins, never IN-subquery
materialization. Top-k queries go through TakeOrderedAndProject
(per-partition top-k, then a k-row merge on the driver — no global sort).

Determinism (SURVEY §2.1 + ARCHITECTURE.md rounding policy): revenue sums
over joins round to integers (r0 — round-6 does not survive cross-engine FP
noise at 1e8 magnitude); ratios/averages round-6; quantity sums are integral
doubles (exact); every top-k imposes a unique-key tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.determinism import (
    REVENUE_SQL,
    r0,
    r6,
    revenue,
)
from mapreduce_machine_learning_spark.io import load_table as T
from mapreduce_machine_learning_spark.registry import query


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp")


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           ROUND(SUM({REVENUE_SQL}), 0) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority): top-10 unshipped BUILDING-segment orders
    by revenue. Adaptation: o_orderpriority stands in for o_shippriority.
    customer is the only dimension here and is broadcast; the
    orders⋈lineitem equi-join shuffles on orderkey; final top-10 is
    TakeOrderedAndProject (no global sort)."""
    c = T(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-03-15 00:00:00")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-03-15 00:00:00")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r0(F.sum(revenue())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order-priority checking): orders in 1997Q3 with at least one
    late line item, counted per priority. Adaptation: "late" means shipped
    >30 days after the order date (lineitem has no commit/receipt dates).
    The EXISTS is a left-semi join — the lineitem side is never widened, and
    at scale the semi join shuffles only (orderkey, shipdate)."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name, ROUND(SUM({REVENUE_SQL}), 0) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 1997 revenue served by suppliers in
    the customer's own nation, for ASIA nations. Full 6-table join graph;
    supplier/nation/region are broadcast so the plan has exactly two
    shuffles (orders⋈lineitem on orderkey, then the groupBy on n_name —
    25 keys, partial agg does nearly all the work map-side)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(r0(F.sum(revenue())).alias("revenue"))
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (revenue-change forecast): discount revenue that would be
    gained by eliminating small discounts in 1997. Pure scan-filter-agg; all
    three predicates push to the parquet scan and the plan is a single
    whole-stage-codegen pass with no shuffle beyond the 1-row final agg."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            r0(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           ROUND(SUM({REVENUE_SQL}), 0) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue lost
    to returns in 1997Q4. customer and nation broadcast; grouping key
    includes the customer attributes (functionally dependent on c_custkey)
    so no second join is needed after the aggregate."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r0(F.sum(revenue())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN {REVENUE_SQL} ELSE 0.0 END)
                 / SUM({REVENUE_SQL}), 6) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect): share of September-1997 revenue from
    PROMO parts. Adaptation: p_type here is a single word, so the
    `LIKE 'PROMO%'` becomes equality. part is broadcast; the ratio of two
    co-computed sums is magnitude ~10¹ so round-6 is safe (the sums
    themselves never leave the query)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    p = T(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", revenue()).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            r6(100.0 * F.sum(promo) / F.sum(revenue())).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship): how many suppliers can ship
    each qualifying (brand, type, size). Adaptations: lineitem stands in for
    the missing partsupp table (a supplier "supplies" a part it has shipped),
    and the excluded-supplier subquery filters on negative account balance
    instead of the absent comment field. Anti join against the tiny excluded
    set (broadcast), countDistinct shuffles on the 3-part group key."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = T(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           ROUND(sum_qty, 6) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): top-100 orders whose line items
    total >250 units. The HAVING aggregate runs first and shrinks the fact
    side to a handful of orderkeys before any join — at scale that
    pre-aggregation is the difference between joining 100 TB and joining
    kilobytes. Quantities are integral doubles, so the sums are FP-exact."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            r6(F.col("sum_qty")).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT ROUND(SUM({REVENUE_SQL}), 0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): disjunction of three brand/size/
    quantity baskets — the classic OR-of-ANDs predicate that defeats naive
    index strategies but is a single broadcast-join + filter here.
    Adaptation: container/shipmode conditions dropped (columns absent);
    size/quantity bands widened so every basket selects rows at test scale."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    basket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#16")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(basket).agg(
        r0(F.sum(revenue())).alias("revenue"),
        F.count(F.lit(1)).alias("line_count"),
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT ROUND(AVG(c_acctbal), 6) AS thr
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 6) AS totacctbal
    FROM customer CROSS JOIN avg_bal
    WHERE c_acctbal > thr
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): well-funded customers who never
    ordered, bucketed by country code. Adaptation: `c_nationkey % 5` stands
    in for the missing phone-prefix country code. The global average is a
    1-row broadcast (rounded to 6 places on both engines so the threshold
    comparison can't flip on FP noise); the NOT EXISTS is a left-anti join
    shuffling only custkeys."""
    c = T(spark, sf_dir, "customer")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(r6(F.avg("c_acctbal")).alias("thr"))
    )
    o = T(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            r6(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
