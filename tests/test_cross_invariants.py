"""Cross-operator consistency invariants on the fixture data: independent
queries that measure the same underlying quantity must agree. Cheaper than
an oracle (no DuckDB) and orthogonal to golden hashes — these survive
testdata regeneration, so they catch semantic drift the moment it happens.
"""

from pyspark.sql import functions as F

from mapreduce_machine_learning_spark.io import load_table
from mapreduce_machine_learning_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_sessionpath_counts_bounded_by_session_total(spark):
    total_sessions = sum(
        r["num_sessions"]
        for r in QUERIES["q_stream_session"](spark, SF_DIR).collect()
    )
    top10 = QUERIES["q_events_sessionpath"](spark, SF_DIR).collect()
    assert len(top10) == 10
    assert sum(r["n_sessions"] for r in top10) <= total_sessions
    assert max(r["n_sessions"] for r in top10) >= 1


def test_rfm_partitions_all_users(spark):
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    cells = QUERIES["q_events_rfm"](spark, SF_DIR).collect()
    assert sum(r["n_users"] for r in cells) == n_users
    for r in cells:
        assert 1 <= r["r_bucket"] <= 5
        assert 1 <= r["f_bucket"] <= 5
        assert 1 <= r["m_bucket"] <= 5


def test_wau_dominates_dau_and_user_count(spark):
    skew = QUERIES["q_events_skewprofile"](spark, SF_DIR).collect()[0]
    for r in QUERIES["q_events_wau"](spark, SF_DIR).collect():
        assert r["dau"] <= r["wau"] <= skew["n_keys"]
        assert 0.0 < r["stickiness"] <= 1.0


def test_skewprofile_internally_consistent(spark):
    r = QUERIES["q_events_skewprofile"](spark, SF_DIR).collect()[0]
    n_events = load_table(spark, SF_DIR, "events").count()
    assert r["n_events"] == n_events
    assert r["max_per_key"] >= r["avg_per_key"]
    assert 0.0 < r["top_decile_share"] <= 1.0
    assert 0.0 < r["top10_share"] <= 1.0


def test_tree_split_partitions_every_row(spark):
    n_events = load_table(spark, SF_DIR, "events").count()
    rows = QUERIES["q_ml_tree_split"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["n_left"] + r["n_right"] == n_events
        # binary Gini is bounded by 0.5
        assert 0.0 <= r["gini_split"] <= 0.5


def test_nb_confusion_covers_all_scored_docs(spark):
    n_test = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 100)
        .count()
    )
    cells = QUERIES["q_ml_nb_multinomial"](spark, SF_DIR).collect()
    assert sum(r["cnt"] for r in cells) == n_test


def test_eval_metrics_algebra(spark):
    m = QUERIES["q_ml_eval_metrics"](spark, SF_DIR).collect()[0]
    n_events = load_table(spark, SF_DIR, "events").count()
    assert m["tp"] + m["fp"] + m["fn"] + m["tn"] == n_events
    p, r = m["precision"], m["recall"]
    assert abs(m["f1"] - 2 * p * r / (p + r)) < 1e-4


def test_kmeans_init_centroids_distinct(spark):
    rows = QUERIES["q_ml_kmeans_init"](spark, SF_DIR).collect()
    assert [r["step"] for r in sorted(rows, key=lambda r: r["step"])] == [0, 1, 2]
    pts = {(r["cx"], r["cy"]) for r in rows}
    assert len(pts) == 3  # maximin never re-picks a chosen centroid


def test_sparse_cosine_range_and_ordering(spark):
    rows = QUERIES["q_text_cosine_sparse"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 <= r["cosine"] <= 1.0  # tf vectors are non-negative
    sims = [r["cosine"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_stratified_sample_within_stratum(spark):
    for r in QUERIES["q_llm_sample_stratified"](spark, SF_DIR).collect():
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        assert 0.0 <= r["observed_rate"] <= 1.0


def test_scd2_versions_bounded_by_events(spark):
    n_events = load_table(spark, SF_DIR, "events").count()
    rows = QUERIES["q_events_scd2"](spark, SF_DIR).collect()
    total_versions = sum(r["n_versions"] for r in rows)
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    # at least one version per active user, at most one per event
    assert n_users <= total_versions <= n_events
    # exactly one open interval (the current state) per user
    assert sum(r["n_current"] for r in rows) == n_users


def test_pipeline_funnel_monotone(spark):
    r = QUERIES["q_llm_pipeline_funnel"](spark, SF_DIR).collect()[0]
    assert (
        r["n_total"] >= r["n_quality"] >= r["n_dedup"] >= r["n_sampled"] >= 0
    )
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert r["n_total"] == n_docs


def test_calibration_bins_cover_all_events(spark):
    rows = QUERIES["q_ml_calibration"](spark, SF_DIR).collect()
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["avg_predicted"] <= 1.0
        assert 0.0 <= r["observed_rate"] <= 1.0


def test_pit_covers_every_purchase(spark):
    n_purchases = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    rows = QUERIES["q_join_pit"](spark, SF_DIR).collect()
    assert sum(r["n_purchases"] for r in rows) == n_purchases


def test_abtest_arms_partition_two_types(spark):
    r = QUERIES["q_events_abtest"](spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    assert r["n_treat"] == ev.filter(F.col("event_type") == "purchase").count()
    assert r["n_control"] == ev.filter(F.col("event_type") == "view").count()
    assert r["welch_df"] > 0


def test_subsample_se_accounts_every_row(spark):
    r = QUERIES["q_events_subsample_se"](spark, SF_DIR).collect()[0]
    assert r["n_reps"] == 10
    assert r["n_rows"] == load_table(spark, SF_DIR, "events").count()
    assert r["se_mean"] > 0


def test_trend_fits_every_event_type(spark):
    rows = QUERIES["q_events_trend"](spark, SF_DIR).collect()
    types = {
        r["event_type"]
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {r["event_type"] for r in rows} == types


def test_mad_outliers_bounded(spark):
    for r in QUERIES["q_agg_mad"](spark, SF_DIR).collect():
        assert r["mad"] >= 0.0
        assert r["n_outliers"] >= 0


def test_cluster_quality_covers_all_labels(spark):
    rows = QUERIES["q_ml_cluster_quality"](spark, SF_DIR).collect()
    em = load_table(spark, SF_DIR, "embeddings")
    assert len(rows) == em.select("label").distinct().count()
    assert sum(r["n_vecs"] for r in rows) == em.count()
    for r in rows:
        assert r["mean_intra"] > 0 and r["nearest_centroid"] > 0


def test_dup_ngrams_share_bounded(spark):
    for r in QUERIES["q_llm_dup_ngrams"](spark, SF_DIR).collect():
        assert 0 <= r["n_dup_shingles"] <= r["n_shingles"]
        assert 0.0 <= r["dup_share"] <= 1.0


def test_softmax_grad_telescopes_to_zero(spark):
    # at W=0 the per-class gradients must sum to zero over classes (the 0.2
    # factor telescopes against the class counts/sums) — grad_1 inherits FP
    # noise from value sums, so tolerance is loose-but-tiny
    rows = QUERIES["q_ml_softmax_grad"](spark, SF_DIR).collect()
    assert len(rows) == 5
    assert abs(sum(r["grad_0"] for r in rows)) < 1e-3
    assert abs(sum(r["grad_1"] for r in rows)) < 1e-3


def test_newton_agrees_with_gd_gradient(spark):
    # the Newton and GD kernels compute the SAME gradient from w=0
    newton = QUERIES["q_ml_logreg_newton"](spark, SF_DIR).collect()[0]
    gd = QUERIES["q_ml_logreg_grad"](spark, SF_DIR).collect()[0]
    assert newton["grad_0"] == gd["grad_0"]
    assert newton["grad_1"] == gd["grad_1"]


def test_chi2_nonnegative_with_full_dof(spark):
    r = QUERIES["q_ml_chi2"](spark, SF_DIR).collect()[0]
    assert r["chi2"] >= 0.0
    assert r["dof"] == 4  # (5 event types − 1) × (2 buckets − 1)


def test_mutual_info_bounds(spark):
    r = QUERIES["q_ml_mutual_info"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r["mi_nats"] <= min(r["h_lang"], r["h_source"]) + 1e-9
    assert 0.0 <= r["nmi"] <= 1.0 + 1e-9


def test_ridge_shrinks_toward_zero(spark):
    r = QUERIES["q_ml_ridge_stats"](spark, SF_DIR).collect()[0]
    assert abs(r["slope_ridge"]) < abs(r["slope_ols"])
    assert 0.0 < r["shrink_ratio"] < 1.0
    ols = QUERIES["q_ml_linreg_stats"](spark, SF_DIR).collect()[0]
    assert abs(r["slope_ols"] - ols["slope"]) < 1e-4


def test_attribution_accounts_every_purchase(spark):
    n_purchases = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    rows = QUERIES["q_events_attribution"](spark, SF_DIR).collect()
    assert sum(r["purchases"] for r in rows) == n_purchases
    assert all(r["touch"] != "purchase" for r in rows)


def test_keep_latest_partitions_all_users(spark):
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    rows = QUERIES["q_events_keep_latest"](spark, SF_DIR).collect()
    assert sum(r["users_ending_here"] for r in rows) == n_users


def test_hapax_bounded_by_vocab(spark):
    for r in QUERIES["q_text_hapax"](spark, SF_DIR).collect():
        assert 0 <= r["hapax"] <= r["vocab"]
        assert 0.0 <= r["hapax_ratio"] <= 1.0
        assert 0.0 < r["type_token_ratio"] <= 1.0


def test_quantize_error_within_half_step(spark):
    # max per-vector MSE cannot exceed (scale/2)^2 if rounding is correct;
    # compare in the query's own ppm units, per label
    for r in QUERIES["q_llm_quantize"](spark, SF_DIR).collect():
        # avg_scale is in x1000 units, mse in x1e6 units:
        # (scale/2)^2 * 1e6 = (avg_scale_x1000/2)^2 * 1e6 / 1e6
        # per-vector scales vary, so bound max_mse by the *max* conceivable
        # half-step of the largest scale — loose sanity: mse < scale_avg^2
        assert r["avg_mse_x1e6"] <= r["max_mse_x1e6"]
        assert r["max_mse_x1e6"] >= 0.0
        assert r["n_vecs"] > 0


def test_countmin_never_undercounts(spark):
    # the CM guarantee: min over d hashed cells upper-bounds the true count
    for r in QUERIES["q_sketch_countmin"](spark, SF_DIR).collect():
        assert r["est_cnt"] >= r["true_cnt"]
        assert r["overcount"] == r["est_cnt"] - r["true_cnt"]


def test_bloom_no_false_negatives(spark):
    # every true member must hit; FPs are allowed but bounded by probe count
    for r in QUERIES["q_sketch_bloom"](spark, SF_DIR).collect():
        assert r["n_hits"] >= r["n_true_members"]
        assert r["n_false_pos"] == r["n_hits"] - r["n_true_members"]
        assert 0 < r["bits_set"] <= 256


def test_hll_small_range_corrected_estimate_close(spark):
    r = QUERIES["q_sketch_hll"](spark, SF_DIR).collect()[0]
    assert r["m"] == 64
    assert 0 < r["used_registers"] <= 64
    # corrected estimate should land within the sketch's error envelope
    # (1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma)
    assert abs(r["rel_err"]) < 0.4


def test_adaboost_reweighting_balances(spark):
    r = QUERIES["q_ml_adaboost_stump"](spark, SF_DIR).collect()[0]
    assert 0.0 < r["eps"] < 1.0
    # AdaBoost identity: after the alpha-step, correct and wrong mass both
    # equal sqrt(eps*(1-eps))
    assert abs(r["z_correct"] - r["z_wrong"]) < 2e-6
    expected = (r["eps"] * (1 - r["eps"])) ** 0.5
    assert abs(r["z_correct"] - expected) < 2e-6


def test_svm_step_matches_perceptron_direction(spark):
    # both are summation-form updates over (1, value/100) with the same
    # labels; the SVM-at-w0 gradient is the full-batch mean while the
    # perceptron only sums violators — signs of the bias component must
    # agree with the class imbalance (purchase is a minority class)
    svm = QUERIES["q_ml_svm_step"](spark, SF_DIR).collect()[0]
    assert svm["grad_0"] > 0  # minority positive class → avg(y) < 0
    assert svm["w0_next"] == -round(0.1 * svm["grad_0"] / 0.1 * 0.1, 6)


def test_itemcf_cosine_in_unit_interval(spark):
    rows = QUERIES["q_ml_itemcf"](spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    for r in rows:
        assert 0.0 <= r["cosine"] <= 1.0
        assert r["n_users"] >= 1


def test_concurrency_bounded_by_type_counts(spark):
    counts = {
        r["event_type"]: r["cnt"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in QUERIES["q_events_concurrency"](spark, SF_DIR).collect():
        assert 1 <= r["max_concurrent"] <= counts[r["event_type"]]


def test_trigram_total_matches_sequence_lengths(spark):
    # sum over all trigram counts (not just top-10) must equal
    # sum(len(seq)-2) over users with >=3 events
    per_user = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .agg(F.sum(F.col("n") - 2).alias("total"))
        .collect()[0]["total"]
    )
    top10 = QUERIES["q_events_trigrams"](spark, SF_DIR).collect()
    assert sum(r["n"] for r in top10) <= per_user
    assert len(top10) == 10


def test_merge_upsert_partitions_all_users(spark):
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    rows = QUERIES["q_events_merge_upsert"](spark, SF_DIR).collect()
    assert sum(r["n_users"] for r in rows) == n_users
    assert {r["action"] for r in rows} <= {"inserted", "updated", "retained"}


def test_kmv_estimate_within_sketch_error(spark):
    r = QUERIES["q_sketch_kmv"](spark, SF_DIR).collect()[0]
    # KMV standard error is ~1/sqrt(k-2) ≈ 12.7% at k=64; allow 4 sigma
    assert r["rel_error"] < 0.51
    assert r["n_true"] >= 64  # estimator precondition: k-th minimum exists


def test_ohlc_bars_internally_ordered(spark):
    for r in QUERIES["q_events_ohlc"](spark, SF_DIR).collect():
        assert r["low"] <= min(r["open"], r["close"])
        assert r["high"] >= max(r["open"], r["close"])
        assert r["low"] <= r["vwap"] <= r["high"]
        assert r["volume"] >= 1


def test_twa_between_min_and_max(spark):
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in QUERIES["q_events_twa"](spark, SF_DIR).collect():
        lo, hi = bounds[r["event_type"]]
        assert lo <= r["time_weighted_avg"] <= hi
        assert r["avg_interval_s"] > 0


def test_profile_distinct_bounded_by_rows(spark):
    n = load_table(spark, SF_DIR, "lineitem").count()
    rows = QUERIES["q_profile_columns"](spark, SF_DIR).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_null"] == 0
        assert 1 <= r["n_distinct"] <= n
        assert r["range_v"] == r["max_v"] - r["min_v"]
        assert r["range_v"] >= 0


def test_skyline_is_mutually_nondominating(spark):
    rows = QUERIES["q_part_skyline"](spark, SF_DIR).collect()
    assert rows
    pts = [(r["price"], r["size"]) for r in rows]
    for i, (pa, sa) in enumerate(pts):
        for j, (pb, sb) in enumerate(pts):
            if i == j:
                continue
            # strict dominance: cheaper-or-equal AND bigger-or-equal,
            # strictly better in at least one
            assert not (
                pb <= pa and sb >= sa and (pb < pa or sb > sa)
            ), f"{(pb, sb)} dominates {(pa, sa)}"


def test_rouge_pairs_consistent(spark):
    rows = QUERIES["q_text_rouge1"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["overlap"] <= min(r["n_ref"], r["n_cand"])
        assert 0.0 <= r["precision"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0
        assert r["f1"] <= max(r["precision"], r["recall"]) + 1e-9


def test_ann_recall_consistent_with_components(spark):
    rows = {r["method"]: r for r in QUERIES["q_ann_recall"](spark, SF_DIR).collect()}
    assert set(rows) == {"ivf", "lsh"}
    for method, r in rows.items():
        assert 0 <= r["n_hits"] <= r["k"]
        assert abs(r["recall"] - r["n_hits"] / r["k"]) < 1e-9
    # recompute the ivf hit count from the two component queries directly
    exact = {r["vec_id"] for r in QUERIES["q_ml_knn"](spark, SF_DIR).collect()}
    ivf = {r["vec_id"] for r in QUERIES["q_ann_ivf"](spark, SF_DIR).collect()}
    assert rows["ivf"]["n_hits"] == len(exact & ivf)


def test_ewma_within_daily_mean_range(spark):
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.avg("value").alias("m"))
        .groupBy("event_type")
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
        .collect()
    )
    bounds = {r["event_type"]: (r["lo"], r["hi"]) for r in daily}
    for r in QUERIES["q_stream_ewma"](spark, SF_DIR).collect():
        lo, hi = bounds[r["event_type"]]
        # convex combination of daily means stays inside their range
        assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6
        assert lo - 1e-6 <= r["last_daily_mean"] <= hi + 1e-6


def test_moving_median_within_monthly_range(spark):
    rows = QUERIES["q_win_moving_median"](spark, SF_DIR).collect()
    assert rows
    n_orders_total = sum(r["n_orders"] for r in rows)
    assert n_orders_total == load_table(spark, SF_DIR, "orders").count()
    meds = [r["moving_median_rev"] for r in rows]
    assert all(m > 0 for m in meds)


def test_streaks_account_all_user_days(spark):
    n_user_days = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", F.col("ts").cast("date"))
        .distinct()
        .count()
    )
    rows = QUERIES["q_events_streaks"](spark, SF_DIR).collect()
    # every distinct user-day lives in exactly one streak
    assert sum(r["streak_len"] * r["n_streaks"] for r in rows) == n_user_days
    assert all(r["streak_len"] >= 1 for r in rows)


def test_drawdown_nonnegative_per_type(spark):
    rows = QUERIES["q_events_drawdown"](spark, SF_DIR).collect()
    types = {
        r["event_type"]
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {r["event_type"] for r in rows} == types
    for r in rows:
        assert r["max_drawdown"] >= 0.0


def test_sssp_monotone_and_consistent_with_markov(spark):
    rows = QUERIES["q_graph_sssp"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # relaxation can only shrink distances
        assert r["dist_iter2"] <= r["dist_iter1"] + 1e-9
        assert r["dist_iter2"] >= 0.0
        if r["event_type"] == "signup":
            assert r["dist_iter1"] == 0.0  # source pinned at zero


def test_share_sums_to_one(spark):
    rows = QUERIES["q_win_share"](spark, SF_DIR).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders


def test_weighted_sample_biased_toward_long_docs(spark):
    rows = QUERIES["q_llm_sample_weighted"](spark, SF_DIR).collect()
    assert len(rows) == 20
    keys = [r["es_key"] for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert all(k < 0 for k in keys)  # ln(u)/w with u in (0,1), w > 0
    pop_avg = (
        load_table(spark, SF_DIR, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_avg = sum(r["n_chars"] for r in rows) / len(rows)
    # length-weighted sampling must overrepresent long documents
    assert sample_avg > 0.95 * pop_avg


def test_hist_quantile_within_one_bin_of_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    ext = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    width = (ext["hi"] - ext["lo"]) / 64
    exact = {
        q: ev.agg(F.percentile("value", F.lit(q))).collect()[0][0]
        for q in (0.5, 0.9, 0.99)
    }
    rows = {r["q"]: r["hist_estimate"] for r in
            QUERIES["q_sketch_quantile_hist"](spark, SF_DIR).collect()}
    assert set(rows) == {0.5, 0.9, 0.99}
    prev = None
    for q in (0.5, 0.9, 0.99):
        est = rows[q]
        assert ext["lo"] <= est <= ext["hi"] + 1e-9
        # upper-edge estimator: exact quantile lies within the chosen bin
        assert exact[q] <= est <= exact[q] + width + 1e-9
        if prev is not None:
            assert est >= prev  # monotone in q
        prev = est


def test_kanon_groups_account_all_events(spark):
    r = QUERIES["q_events_kanon"](spark, SF_DIR).collect()[0]
    assert 0 <= r["n_risky_groups"] <= r["n_groups"]
    assert r["n_risky_rows"] < 5 * max(r["n_risky_groups"], 1) or (
        r["n_risky_groups"] == 0 and r["n_risky_rows"] == 0
    )
    assert r["k_anonymity"] >= 1


def test_kmv_setops_algebra(spark):
    r = QUERIES["q_sketch_kmv_setops"](spark, SF_DIR).collect()[0]
    # inclusion-exclusion sanity on the true values
    assert r["true_intersection"] <= r["true_union"]
    assert 0.0 <= r["jaccard_est"] <= 1.0
    # sketch estimates within ~4x the k=64 standard error (12.7%)
    assert abs(r["union_est"] - r["true_union"]) / r["true_union"] < 0.51
    assert abs(r["intersection_est"] - r["true_intersection"]) <= max(
        0.6 * r["true_union"], 10
    )


def test_autocorr_bounds_and_coverage(spark):
    rows = QUERIES["q_events_autocorr"](spark, SF_DIR).collect()
    types = {
        r["event_type"]
        for r in load_table(spark, SF_DIR, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {r["event_type"] for r in rows} == types
    assert {r["lag"] for r in rows} == {1, 2, 3}
    for r in rows:
        assert -1.0 - 1e-9 <= r["autocorr"] <= 1.0 + 1e-9
        assert r["n_pairs"] >= 2


def test_zonemap_accounts_all_rows(spark):
    r = QUERIES["q_scan_zonemap"](spark, SF_DIR).collect()[0]
    n = load_table(spark, SF_DIR, "lineitem").count()
    assert 0 <= r["n_skippable"] <= r["n_zones"]
    assert 0 <= r["rows_skipped"] <= n
    assert 0.0 <= r["skip_ratio"] <= 1.0
    # cross-check against the actual predicate selectivity: skipping can
    # never drop a row the predicate keeps
    kept = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .count()
    )
    assert r["rows_skipped"] <= n - kept


def test_gbdt_round_consistent_with_tree_split(spark):
    rows = QUERIES["q_ml_gbdt_round"](spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "events").count()
    assert len(rows) == 3
    for r in rows:
        assert r["n_left"] + r["n_right"] == n
        assert r["gain"] >= 0.0
        # leaves are mean residuals: weighted sum telescopes to ~zero
        assert (
            abs(r["n_left"] * r["leaf_left"] + r["n_right"] * r["leaf_right"])
            < 0.02 * n
        )


def test_gbdt_round2_shrinks_gain_on_chosen_split(spark):
    r1 = {r["threshold"]: r for r in QUERIES["q_ml_gbdt_round"](spark, SF_DIR).collect()}
    r2 = {r["threshold"]: r for r in QUERIES["q_ml_gbdt_iter2"](spark, SF_DIR).collect()}
    assert set(r1) == set(r2) == {6.0, 12.0, 18.0}
    t1 = next(iter(r2.values()))["round1_threshold"]
    # round 1 chose the argmax gain
    assert r1[t1]["gain"] == max(r["gain"] for r in r1.values())
    # after the eta=0.5 update, the chosen split's gain must shrink
    assert r2[t1]["gain"] < r1[t1]["gain"]
    for t, r in r2.items():
        assert r["n_left"] == r1[t]["n_left"]
        assert r["n_right"] == r1[t]["n_right"]


def test_median_disc_is_a_stored_value(spark):
    rows = QUERIES["q_agg_median_disc"](spark, SF_DIR).collect()
    o = load_table(spark, SF_DIR, "orders")
    for r in rows:
        # discrete quantile must return an actual stored price
        assert (
            o.filter(
                (F.col("o_orderstatus") == r["o_orderstatus"])
                & (F.col("o_totalprice") == r["median_disc"])
            ).count()
            >= 1
        )
    assert sum(r["n"] for r in rows) == o.count()


def test_seasonality_cells_account_all_events(spark):
    rows = QUERIES["q_events_seasonality"](spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n"] for r in rows) == n
    assert all(1 <= r["dow"] <= 7 and 0 <= r["hour"] <= 23 for r in rows)
    mean_lf = sum(r["load_factor"] for r in rows) / len(rows)
    assert abs(mean_lf - 1.0) < 0.01  # load factors average to ~1


def test_curriculum_deciles_partition_corpus_monotonically(spark):
    rows = sorted(
        QUERIES["q_llm_curriculum"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert [r["decile"] for r in rows] == list(range(1, 11))
    ttrs = [r["avg_ttr"] for r in rows]
    assert ttrs == sorted(ttrs)  # deciles ordered by difficulty


def test_temperature_weights_flatten_toward_uniform(spark):
    rows = QUERIES["q_llm_mix_temperature"](spark, SF_DIR).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["temp_weight"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # tau < 1: small sources gain weight, large sources lose it
        if r["token_share"] < 1.0 / len(rows):
            assert r["upsample_factor"] >= 1.0 - 1e-6
        else:
            assert r["upsample_factor"] <= 1.0 + 1e-6


def test_topk_withties_supersets_rownumber_topk(spark):
    ties = QUERIES["q_topk_withties"](spark, SF_DIR).collect()
    per_seg: dict = {}
    for r in ties:
        per_seg.setdefault(r["c_mktsegment"], []).append(r)
    for seg, rows in per_seg.items():
        # at least 3 rows per segment, and every rank <= 3 appears
        assert len(rows) >= 3
        assert {r["rnk"] for r in rows} <= {1, 2, 3}


def test_durbin_watson_in_valid_range(spark):
    r = QUERIES["q_ml_durbin_watson"](spark, SF_DIR).collect()[0]
    assert r["n"] == load_table(spark, SF_DIR, "events").count()
    assert 0.0 <= r["durbin_watson"] <= 4.0
    # synthetic events have no serial structure: DW should sit near 2
    assert 1.5 < r["durbin_watson"] < 2.5


def test_entropy_drift_bounded_by_log_classes(spark):
    import math

    r = QUERIES["q_events_entropy_drift"](spark, SF_DIR).collect()[0]
    hmax = math.log(5)  # 5 event types
    assert 0.0 <= r["min_entropy"] <= r["avg_entropy"] <= r["max_entropy"]
    assert r["max_entropy"] <= hmax + 1e-9
    assert abs(r["drift_range"] - (r["max_entropy"] - r["min_entropy"])) < 2e-6


def test_feature_corr_bounded_and_consistent_with_agg_corr(spark):
    r = QUERIES["q_ml_feature_corr"](spark, SF_DIR).collect()[0]
    assert r["n"] == load_table(spark, SF_DIR, "lineitem").count()
    for k, v in r.asDict().items():
        if k.startswith("corr_"):
            assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9
    # cross-check one cell against Spark's built-in corr aggregate
    builtin = (
        load_table(spark, SF_DIR, "lineitem")
        .agg(F.corr("l_quantity", "l_extendedprice"))
        .collect()[0][0]
    )
    assert abs(r["corr_quantity_extendedprice"] - builtin) < 1e-5


def test_psi_small_on_stationary_synthetic_data(spark):
    r = QUERIES["q_ml_psi"](spark, SF_DIR).collect()[0]
    assert r["n_bins"] == 10
    assert r["psi"] >= 0.0  # PSI is a symmetrized KL, always non-negative
    # the synthetic stream is stationary across the month: well under the
    # 0.25 retrain threshold
    assert r["psi"] < 0.25


def test_cohort_ltv_monotone_within_cohort(spark):
    rows = QUERIES["q_events_cohort_ltv"](spark, SF_DIR).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_day"], []).append(
            (r["day_offset"], r["cum_ltv_per_user"])
        )
    for day, pts in by_cohort.items():
        pts.sort()
        vals = [v for _, v in pts]
        assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), day
        assert vals[0] >= 0.0


def test_lift_gains_monotone_and_exhaustive(spark):
    rows = sorted(
        QUERIES["q_ml_lift_gains"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    gains = [r["cum_gain"] for r in rows]
    assert gains == sorted(gains)
    assert abs(gains[-1] - 1.0) < 1e-6  # full population captures all positives
    assert abs(rows[-1]["cum_lift"] - 1.0) < 1e-6  # lift at 100% is 1
    # the scorer is positively informative: top decile beats random
    assert rows[0]["cum_lift"] > 1.0


def test_windowed_funnel_dominated_by_unbounded(spark):
    unb = QUERIES["q_events_funnel"](spark, SF_DIR).collect()[0]
    win = QUERIES["q_events_funnel_windowed"](spark, SF_DIR).collect()[0]
    assert win["stage_view"] == unb["stage_view"]  # entry stage identical
    assert win["stage_click_24h"] <= unb["stage_click"]
    assert win["stage_purchase_24h"] <= unb["stage_purchase"]
    assert (
        win["stage_view"] >= win["stage_click_24h"] >= win["stage_purchase_24h"]
    )


def test_winsorized_mean_between_clip_points(spark):
    r = QUERIES["q_agg_winsorized"](spark, SF_DIR).collect()[0]
    n = load_table(spark, SF_DIR, "events").count()
    assert r["n"] == n
    # ~10% of mass sits outside [P5, P95]
    assert 0.05 * n < r["n_clipped"] < 0.15 * n
    # winsorizing pulls the mean toward the median but keeps it sane
    assert abs(r["winsorized_mean"] - r["raw_mean"]) < 0.5 * abs(r["raw_mean"])


def test_slope_inference_consistent_with_linfit(spark):
    r = QUERIES["q_ml_slope_inference"](spark, SF_DIR).collect()[0]
    assert r["n"] == load_table(spark, SF_DIR, "events").count()
    assert r["se_slope"] > 0
    assert abs(r["t_stat"] - r["slope"] / r["se_slope"]) < 1e-3


def test_vif_at_least_one(spark):
    r = QUERIES["q_ml_vif"](spark, SF_DIR).collect()[0]
    for k, v in r.asDict().items():
        # VIF is bounded below by 1 (independent features) by construction
        assert v >= 1.0 - 1e-6, (k, v)
        # synthetic features are near-independent: no pathological inflation
        assert v < 10.0, (k, v)


def test_assoc_rules_probability_axioms(spark):
    rows = QUERIES["q_events_assoc_rules"](spark, SF_DIR).collect()
    assert len(rows) == 20  # 5 types, directed pairs
    by_pair = {(r["antecedent"], r["consequent"]): r for r in rows}
    for (a, b), r in by_pair.items():
        assert 0.0 < r["support"] <= r["confidence"] <= 1.0
        # support is symmetric even though confidence is not
        mirror = by_pair[(b, a)]
        assert abs(r["support"] - mirror["support"]) < 2e-6


def test_gini_in_unit_interval(spark):
    r = QUERIES["q_agg_gini"](spark, SF_DIR).collect()[0]
    n_cust = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert r["n_customers"] == n_cust
    assert 0.0 <= r["gini"] < 1.0


def test_lang_overlap_bounds(spark):
    rows = QUERIES["q_text_lang_overlap"](spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2) language pairs
    vocab_n = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    for r in rows:
        assert 0 < r["common_tokens"] <= vocab_n
        assert 0.0 < r["jaccard"] <= 1.0


def test_kappa_bounded_by_observed_agreement(spark):
    r = QUERIES["q_ml_cohens_kappa"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r["observed_agreement"] <= 1.0
    assert 0.0 <= r["chance_agreement"] < 1.0
    assert -1.0 <= r["kappa"] <= 1.0
    # kappa never exceeds raw agreement (chance correction only subtracts)
    assert r["kappa"] <= r["observed_agreement"] + 1e-9


def test_bounce_sessions_total_matches_session_query(spark):
    total_sessions = sum(
        r["num_sessions"]
        for r in QUERIES["q_stream_session"](spark, SF_DIR).collect()
    )
    rows = QUERIES["q_events_bounce_rate"](spark, SF_DIR).collect()
    assert sum(r["n_sessions"] for r in rows) == total_sessions
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert 0.0 <= r["bounce_rate"] <= 1.0


def test_novelty_bounded_and_exhaustive(spark):
    rows = QUERIES["q_text_novelty"](spark, SF_DIR).collect()
    assert len(rows) == 5  # one per language
    for r in rows:
        assert 0 < r["n_novel"] <= r["n_shingles"]
        assert 0.0 < r["novelty_rate"] <= 1.0


def test_emb_dim_stats_cover_all_dims(spark):
    rows = QUERIES["q_ml_emb_dim_stats"](spark, SF_DIR).collect()
    assert sorted(r["dim"] for r in rows) == list(range(1, 65))
    for r in rows:
        assert r["var_x"] > 0  # no dead dimensions in the synthetic space
        assert r["max_abs"] >= abs(r["mean_x"])


def test_slo_breach_run_bounded_by_breach_hours(spark):
    r = QUERIES["q_events_slo_breaches"](spark, SF_DIR).collect()[0]
    assert 0 <= r["n_breach_hours"] <= r["n_hours"]
    assert 0 <= r["longest_breach_run"] <= r["n_breach_hours"]
    assert 0.0 <= r["worst_rate"] <= 1.0
    if r["n_breach_hours"] > 0:
        assert r["longest_breach_run"] >= 1
        assert r["worst_rate"] > 0.25


def test_vocab_growth_monotone_to_full_vocab(spark):
    rows = sorted(
        QUERIES["q_text_vocab_growth"](spark, SF_DIR).collect(),
        key=lambda r: r["checkpoint"],
    )
    assert [r["checkpoint"] for r in rows] == list(range(1, 11))
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)
    full_vocab = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert sizes[-1] == full_vocab
