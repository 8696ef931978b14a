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
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): well-funded customers with no
    RECENT orders (none since 1999 — in this dataset every customer has
    *some* order, so the literal "never ordered" set is empty at every
    scale), bucketed by country code. Adaptations: `c_nationkey % 5` stands
    in for the missing phone-prefix country code; recency bound keeps the
    query non-degenerate. The global average is a 1-row broadcast (rounded
    to 6 places on both engines so the threshold comparison can't flip on
    FP noise); the NOT EXISTS is a left-anti join shuffling only custkeys
    of recent orders."""
    c = T(spark, sf_dir, "customer")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(r6(F.avg("c_acctbal")).alias("thr"))
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01 00:00:00"))
        .select("o_custkey")
    )
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


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 0) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               {REVENUE_SQL} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
            OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bilateral trade between NATION_3 and
    NATION_9 by ship year (the pair is chosen to have suppliers on at least
    one side at every test scale, so the query is non-degenerate). The
    nation table joins twice under different roles (supplier side, customer
    side) — both broadcast — and the direction disjunction is evaluated
    after both role joins, exactly the TPC-H shape."""
    s = T(spark, sf_dir, "supplier")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9")
    ) | (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(r0(F.sum(revenue())).alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0.0 END) / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {REVENUE_SQL} AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share): NATION_3's share of AMERICA-region
    ECONOMY-part revenue per order year. Eight-table join graph; every
    dimension broadcasts, so the only shuffle is the 2-key final aggregate.
    The share is a ratio of co-computed sums (magnitude ~1) → round-6."""
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = revenue()
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(r6(F.sum(nat_vol) / F.sum(vol)).alias("mkt_share"))
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, ROUND(SUM({REVENUE_SQL}), 0) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): supplier(s) with the maximum 1997Q1 revenue.
    The per-supplier aggregate rounds to integers BEFORE the max comparison,
    so the winning set is identical across engines even when two suppliers'
    unrounded sums differ only by FP noise. The 1-row max broadcasts back
    against the tiny aggregate — the fact table is read once."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    rev = li.groupBy("l_suppkey").agg(
        r0(F.sum(revenue())).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 0) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS thr
          FROM lineitem GROUP BY l_partkey) t ON t.pk = l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < thr
    """,
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): revenue lost by dropping
    orders below 20% of a part's average quantity. The correlated scalar
    subquery is decorrelated into a per-part aggregate joined back —
    Catalyst's own strategy for this shape, written explicitly. Quantities
    are integral doubles, so SUM/COUNT (and hence the 0.2·avg threshold)
    are FP-exact and the boundary comparison cannot diverge."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    thr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("thr")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, F.col("pk") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            r0(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS priority_class,
           CAST(COUNT(*) AS BIGINT) AS late_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY priority_class
    """,
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (shipping modes and order priority): 1997 line items that
    shipped late (>60 days after ordering), split into high/low priority
    classes. Adaptation: the ship-mode IN-list becomes the priority-class
    CASE (no l_shipmode column), and lateness is ship-vs-order date (no
    commit/receipt dates). The orderkey equi-join carries the lateness
    predicate as a post-join filter; two output groups → map-side partials
    do all the counting."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = T(spark, sf_dir, "orders")
    cls = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(cls.alias("priority_class"))
        .agg(F.count(F.lit(1)).alias("late_lines"))
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, ROUND(SUM(volume), 0) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {REVENUE_SQL} AS volume
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%ar%'
    )
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit): profit on '%ar%'-named parts by
    supplier nation and order year. Adaptation: with no partsupp table there
    is no ps_supplycost, so "profit" is gross revenue — the join graph
    (part⋈lineitem⋈supplier⋈orders⋈nation, part filtered by name pattern)
    is the full Q9 shape. part/supplier/nation broadcast; the one fact-side
    shuffle is orders⋈lineitem on orderkey, then a 25×7-key aggregate whose
    partials collapse map-side."""
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%ar%"))
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(r0(F.sum(revenue())).alias("sum_profit"))
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer distribution): histogram of customers by how many
    qualifying orders they placed, keeping zero-order customers via the
    LEFT JOIN with the filter in the join condition (a WHERE would silently
    drop them — the classic Q13 trap). Adaptation: the excluded-comment
    pattern becomes excluding 1-URGENT orders (no o_comment column). Two
    cascaded aggregates; the second one's input is |customer| rows and its
    key space is tiny, so partial aggregation absorbs nearly everything."""
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): for finished orders,
    count late line items of the *sole* late supplier on multi-supplier
    orders. Adaptation: "late" is shipped >60 days after the order date
    (no commit/receipt dates). The EXISTS / NOT EXISTS pair is decorrelated
    into one per-order aggregate — distinct suppliers, distinct late
    suppliers, late-line count, and the (unique when n_late=1) late
    suppkey — so the fact table is scanned once instead of three times;
    at 100 TB that single groupBy(orderkey) replaces two correlated
    self-joins. Orders with >1 supplier and exactly 1 late supplier
    qualify; their late-line counts roll up to that supplier."""
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
        F.count(F.when(late, F.lit(1))).alias("late_lines"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
    )
    qual = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    s = T(spark, sf_dir, "supplier")
    return (
        qual.join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH vol AS (
        SELECT l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
    )
    SELECT s_suppkey, s_name, ROUND(qty, 6) AS promo_qty
    FROM supplier JOIN vol ON s_suppkey = l_suppkey
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion): suppliers who moved >100 units
    of PROMO parts in 1997 — candidates for the promotion. Adaptation: the
    partsupp availability check becomes shipped volume (no partsupp table).
    The fact side collapses to a per-supplier aggregate BEFORE touching
    supplier, so the join input is bounded by supplier cardinality no matter
    how large lineitem grows; quantity sums are integral doubles (exact)."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
    )
    s = T(spark, sf_dir, "supplier")
    return (
        vol.join(F.broadcast(s), vol.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", r6(F.col("qty")).alias("promo_qty"))
    )


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           ROUND(SUM(l_extendedprice), 0) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0)
               AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1, complete (the flagship q_agg_group carries 5 of Q1's 8
    aggregates; this is the full pricing summary incl. sum_charge and the
    three averages). Unmodified shape: single-table scan with the shipdate
    predicate pushed to parquet, 4-group hash aggregate — partial aggregation
    reduces each scan partition to ≤4 rows before the one shuffle, so the
    plan is scan-bound at any scale. Money sums over FP products round to
    integers (r0), averages round-6 (ARCHITECTURE.md rounding policy)."""
    li = T(spark, sf_dir, "lineitem")
    charge = revenue() * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r6(F.sum("l_quantity")).alias("sum_qty"),
            r0(F.sum("l_extendedprice")).alias("sum_base_price"),
            r0(F.sum(revenue())).alias("sum_disc_price"),
            r0(F.sum(charge)).alias("sum_charge"),
            r6(F.avg("l_quantity")).alias("avg_qty"),
            r6(F.avg("l_extendedprice")).alias("avg_price"),
            r6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT ps.*, s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name,
           p_partkey, p_name,
           ROUND(unit_cost, 6) AS supply_cost
    FROM eu
    JOIN part ON l_partkey = p_partkey
    WHERE p_size = 15
    QUALIFY unit_cost = MIN(unit_cost) OVER (PARTITION BY l_partkey)
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 (minimum-cost supplier): for each size-15 part, the
    EUROPE supplier(s) offering it at the lowest unit cost. Adaptation: the
    missing partsupp table is derived from lineitem — a supplier "offers" a
    part it has shipped, at supply cost MIN(l_extendedprice/l_quantity)
    (MIN of identical per-row IEEE divisions is FP-exact cross-engine,
    unlike an avg). The correlated min-cost subquery becomes a window MIN
    over partkey — one extra shuffle-free pass over the already-partkey-
    clustered aggregate instead of a self-join. At scale: the derived ps
    aggregates map-side before its one shuffle on (partkey, suppkey); the
    supplier→nation→region dimension chain and part are broadcast, so the
    region filter prunes ps rows before the window."""
    li = T(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    return (
        ps.join(F.broadcast(dim), ps.l_suppkey == dim.s_suppkey)
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            r6(F.col("unit_cost")).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH natsupp AS (
        SELECT s_suppkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    ),
    val AS (
        SELECT l_partkey AS ps_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM natsupp)
        GROUP BY l_partkey
    )
    SELECT ps_partkey, value_cents
    FROM val,
         (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
                 CAST(COUNT(*) AS BIGINT) AS part_cnt FROM val)
    WHERE value_cents * part_cnt > 2 * total_cents
    ORDER BY value_cents DESC, ps_partkey
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (important stock identification): parts whose shipped value
    from NATION_3 suppliers exceeds 2× the average per-part value (TPC-H's
    fixed fraction degenerates as part count grows — the spec itself scales
    it by 1/SF; an average-relative threshold is scale-free). Adaptations:
    partsupp value (supplycost×availqty) becomes shipped value
    price×quantity from lineitem; the value is computed in integer CENTS
    (round(price*100) as bigint × qty as bigint) so both the per-part sums
    and the global-total threshold comparison are exact integer arithmetic —
    no FP accumulation-order noise can flip a row near the threshold.
    At scale: the national supplier list is a broadcast semi join (no fact
    shuffle), the per-part sum map-side-aggregates before its one shuffle,
    and the global total is a second tiny agg over the per-part rows,
    rejoined as a broadcast 1-row scalar — the fact table is scanned once."""
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natsupp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * F.col(
        "l_quantity"
    ).cast("long")
    val = (
        li.join(F.broadcast(natsupp), li.l_suppkey == natsupp.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = val.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("part_cnt"),
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.col("part_cnt") > 2 * F.col("total_cents")
        )
        .select("ps_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "ps_partkey")
    )
