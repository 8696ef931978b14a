"""Correctness story for the two rows-only contract queries (VERDICT r4 #6).

`q_agg_approx` (HLL++ approx_count_distinct) and `q_agg_approx_percentile`
(Greenwald-Khanna percentile_approx) can't be hash-checked against DuckDB —
the sketches are engine-specific — so the driver records them rows-only.
These tests give them a real bound instead: each estimate must land inside
the algorithm's DOCUMENTED error envelope of the exact answer computed on
the same data.

  * approx_count_distinct(rsd=0.05 default): standard error of the HLL++
    estimator is rsd; we assert every group lands within 4·rsd = 20%
    (≈4 sigma) and the per-group errors aren't systematically biased
    (mean relative error under 1.5·rsd).
  * percentile_approx(accuracy=1000): the GK sketch guarantees a value
    whose RANK is within n/accuracy of the target rank; we assert the
    estimate's true rank in its group is within 0.5 ± 1/1000 of the median
    (plus a 2-row discreteness slack on tiny groups).

Run at sf0.01 (t2 scale) so the groups are big enough for the asymptotic
bounds to mean something.
"""

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from mapreduce_machine_learning_spark.registry import all_queries
from tests.conftest import SF_DIR_T2

HLL_RSD = 0.05  # Spark's default relative standard deviation
GK_ACCURACY = 1000  # the accuracy literal q_agg_approx_percentile passes


def test_hll_within_documented_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in all_queries()["q_agg_approx"](spark, SF_DIR_T2).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF_DIR_T2, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    rel_errs = []
    for k, est in approx.items():
        rel = abs(est - exact[k]) / max(exact[k], 1)
        assert rel <= 4 * HLL_RSD, (k, est, exact[k], rel)
        rel_errs.append(rel)
    # no systematic bias: the average error should sit near one sigma
    assert sum(rel_errs) / len(rel_errs) <= 1.5 * HLL_RSD, rel_errs


def test_gk_percentile_within_rank_guarantee(spark):
    approx = {
        r.o_orderstatus: r.p50_approx
        for r in all_queries()["q_agg_approx_percentile"](
            spark, SF_DIR_T2
        ).collect()
    }
    orders = load_table(spark, SF_DIR_T2, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    sizes = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(approx) == set(sizes)
    for status, est in approx.items():
        n = sizes[status]
        # true rank of the estimate inside its group
        rank = (
            orders.filter(
                (F.col("o_orderstatus") == status)
                & (F.col("o_totalprice") <= est)
            ).count()
        )
        # GK guarantee: |rank - 0.5·n| ≤ n/accuracy; +2 rows of slack for
        # ties/discreteness on small groups
        tol = n / GK_ACCURACY + 2
        assert abs(rank - 0.5 * n) <= tol, (status, est, rank, n, tol)
