"""Mathematical invariants of the statistics/experimentation/corpus
families: bounds and monotonicity every textbook definition guarantees,
checked on the real fixture data. Orthogonal to both the DuckDB oracle
(these hold under ANY data) and the golden hashes (these survive testdata
regeneration)."""

import math

from mapreduce_machine_learning_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_ks_statistic_bounds(spark):
    row = QUERIES["q_ml_ks_test"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["ks_d"] <= 1.0


def test_mannwhitney_u_bounds(spark):
    row = QUERIES["q_ml_mannwhitney"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["u_stat"] <= row["n1"] * row["n2"]


def test_rank_correlations_bounded(spark):
    rho = QUERIES["q_ml_spearman"](spark, SF_DIR).collect()[0]["spearman_rho"]
    tau = QUERIES["q_ml_kendall_tau"](spark, SF_DIR).collect()[0]["tau_b"]
    assert -1.0 <= rho <= 1.0
    assert -1.0 <= tau <= 1.0
    # both measure monotone association of the same positively related pair
    assert (rho > 0) == (tau > 0)


def test_jsd_bounded_by_ln2(spark):
    row = QUERIES["q_ml_jsd"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["jsd"] <= math.log(2.0) + 1e-9


def test_benford_probabilities_partition(spark):
    rows = QUERIES["q_events_benford"](spark, SF_DIR).collect()
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-4
    assert {r["first_digit"] for r in rows} <= set("123456789")


def test_kaplan_meier_monotone(spark):
    rows = QUERIES["q_events_kaplan_meier"](spark, SF_DIR).collect()
    surv = [r["survival"] for r in sorted(rows, key=lambda r: r["dur_days"])]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= s <= 1.0 for s in surv)
    for r in rows:
        assert r["deaths"] <= r["at_risk"]


def test_adoption_cumulative_consistency(spark):
    rows = QUERIES["q_events_adoption"](spark, SF_DIR).collect()
    by_type = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        run = by_type.get(r["event_type"], 0) + r["new_users"]
        assert r["cum_users"] == run
        by_type[r["event_type"]] = run


def test_range_bounds_monotone(spark):
    rows = QUERIES["q_part_range_bounds"](spark, SF_DIR).collect()
    bounds = [
        r["boundary"] for r in sorted(rows, key=lambda r: r["split_id"])
    ]
    assert len(bounds) == 15
    assert all(a <= b for a, b in zip(bounds, bounds[1:]))


def test_entropy_rate_bounded_by_state_count(spark):
    row = QUERIES["q_events_entropy_rate"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["entropy_rate"] <= math.log(5.0) + 1e-9
    assert abs(row["perplexity"] - math.exp(row["entropy_rate"])) < 1e-3


def test_precision_at_k_bounds(spark):
    rows = QUERIES["q_ml_precision_at_k"](spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(0.0 <= r["p_at_10"] <= 1.0 for r in rows)


def test_anova_f_nonnegative(spark):
    row = QUERIES["q_ml_anova"](spark, SF_DIR).collect()[0]
    assert row["f_stat"] >= 0.0
    assert row["k_groups"] == 5


def test_woe_iv_nonnegative_total(spark):
    rows = QUERIES["q_ml_woe_iv"](spark, SF_DIR).collect()
    # IV total is a sum of (p-q)ln(p/q) terms, each >= 0
    assert all(r["iv_term"] >= -1e-9 for r in rows)
    assert rows[0]["iv_total"] >= 0.0


def test_audience_overlap_jaccard_bounds(spark):
    rows = QUERIES["q_events_audience_overlap"](spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in rows)


def test_var_merge_identity(spark):
    row = QUERIES["q_ml_var_merge"](spark, SF_DIR).collect()[0]
    assert abs(row["var_merged"] - row["var_direct"]) < 1e-5


def test_quality_gate_partition(spark):
    for r in QUERIES["q_llm_quality_gate"](spark, SF_DIR).collect():
        assert (
            r["n_pass"]
            + r["kill_short"]
            + r["kill_long"]
            + r["kill_repetitive"]
            == r["n_docs"]
        )


def test_mcc_confusion_partition(spark):
    row = QUERIES["q_ml_mcc"](spark, SF_DIR).collect()[0]
    assert -1.0 <= row["mcc"] <= 1.0
    n = QUERIES["q_ml_threshold_table"](spark, SF_DIR).collect()
    # threshold table recall is monotone non-increasing in t
    rec = [r["recall_"] for r in sorted(n, key=lambda r: r["t"])]
    assert all(a >= b - 1e-9 for a, b in zip(rec, rec[1:]))


def test_conformal_coverage_at_least_target(spark):
    row = QUERIES["q_ml_conformal"](spark, SF_DIR).collect()[0]
    assert row["coverage_calib"] >= 0.9 - 1e-9


def test_dedup_sweep_partitions_pairs(spark):
    rows = QUERIES["q_llm_dedup_sweep"](spark, SF_DIR).collect()
    n_pairs_total = QUERIES["q_llm_neardup_pairs"](spark, SF_DIR).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs_total
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in rows)
    assert all(r["n_docs_removed"] <= r["n_pairs"] for r in rows)


def test_heldout_perplexity_sane(spark):
    row = QUERIES["q_llm_heldout_perplexity"](spark, SF_DIR).collect()[0]
    # perplexity of a smoothed unigram LM is bounded by (T+V) and > 1
    assert 1.0 < row["perplexity"]
    assert 0.0 <= row["oov_rate"] <= 1.0
    assert abs(row["perplexity"] - math.exp(row["cross_entropy"])) < 1.0


def test_bm25_scores_positive_descending(spark):
    rows = QUERIES["q_text_bm25"](spark, SF_DIR).collect()
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_triangle_gcc_bounds(spark):
    row = QUERIES["q_graph_triangles"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["clustering_coeff"] <= 1.0 + 1e-9
    assert row["n_wedges"] >= row["n_triangles"]


def test_wilson_brackets_rate(spark):
    row = QUERIES["q_ml_wilson_ci"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["wilson_lo"] <= row["rate"] <= row["wilson_hi"] <= 1.0


def test_gamma_fit_recovers_mean(spark):
    row = QUERIES["q_ml_gamma_fit"](spark, SF_DIR).collect()[0]
    assert row["shape_k"] > 0 and row["scale_theta"] > 0
    assert (
        abs(row["shape_k"] * row["scale_theta"] - row["mean_check"]) < 1e-3
    )


def test_gumbel_probability_bounds(spark):
    row = QUERIES["q_ml_gumbel"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["p_exceed_400"] <= 1.0
    assert row["beta"] > 0


def test_effect_size_direction_matches_ttest(spark):
    d = QUERIES["q_ml_cohens_d"](spark, SF_DIR).collect()[0]
    t = QUERIES["q_ml_welch_ttest"](spark, SF_DIR).collect()[0]
    assert (d["cohens_d"] > 0) == (t["t_stat"] > 0)
    assert abs(d["hedges_g"]) <= abs(d["cohens_d"]) + 1e-12


def test_powerlaw_fit_negative_slope(spark):
    row = QUERIES["q_events_powerlaw"](spark, SF_DIR).collect()[0]
    assert row["powerlaw_slope"] < 0  # rank-size curves decrease
    assert 0.0 <= row["r2"] <= 1.0


def test_pinball_p50_is_half_mae(spark):
    pb = QUERIES["q_ml_pinball"](spark, SF_DIR).collect()[0]
    assert pb["pinball_p50"] >= 0 and pb["pinball_p90"] >= 0


def test_segment_migration_partitions_users(spark):
    rows = QUERIES["q_events_segment_migration"](spark, SF_DIR).collect()
    cuped = QUERIES["q_events_cuped"](spark, SF_DIR).collect()[0]
    assert sum(r["n_users"] for r in rows) == cuped["n_users"]
    assert all(1 <= r["seg_before"] <= 4 for r in rows)


def test_watermark_budget_ordered_quantiles(spark):
    row = QUERIES["q_stream_watermark_budget"](spark, SF_DIR).collect()[0]
    disorder = QUERIES["q_stream_disorder"](spark, SF_DIR).collect()
    n_late_total = sum(r["n_late"] for r in disorder)
    if n_late_total == 0:
        # a perfectly ordered stream has no lateness distribution
        assert row["p50_late_s"] is None
        return
    assert row["n_late"] == n_late_total
    assert 0 <= row["p50_late_s"] <= row["p99_late_s"] <= row["max_late_s"]


def test_average_precision_bounds(spark):
    row = QUERIES["q_ml_average_precision"](spark, SF_DIR).collect()[0]
    base_rate = row["n_pos"] / row["n_total"]
    # AP of any ranking is at least ~the positive base rate, at most 1
    assert base_rate * 0.5 <= row["average_precision"] <= 1.0


def test_brier_decomposition_consistent(spark):
    row = QUERIES["q_ml_brier_decomp"](spark, SF_DIR).collect()[0]
    # Murphy identity holds up to within-bin variance of the forecasts
    approx = row["reliability"] - row["resolution"] + row["uncertainty"]
    assert abs(row["brier"] - approx) < 0.05
    assert row["reliability"] >= 0 and row["resolution"] >= 0


def test_srm_chi2_consistent_with_counts(spark):
    row = QUERIES["q_events_srm"](spark, SF_DIR).collect()[0]
    n, t = row["n_treat"] + row["n_ctrl"], row["n_treat"]
    e = n / 2.0
    chi2 = (t - e) ** 2 / e + ((n - t) - e) ** 2 / e
    assert abs(chi2 - row["chi2"]) < 1e-3
