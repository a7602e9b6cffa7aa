"""Mathematical invariants of the late round-6 operators at sf0.001 —
cheap cross-checks that hold for ANY input, complementing the exact
DuckDB differentials (which pin one dataset) with structural truths."""

from __future__ import annotations

from pyspark.sql import functions as F

import iot_etl_spark.plans as P
from iot_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_calibration_bins_invariants(spark):
    rows = P.QUERIES["calibration_bins"](spark, SF_DIR).collect()
    assert rows
    ece = sum(r.ece_contrib for r in rows)
    assert 0.0 <= ece <= 1.0
    for r in rows:
        assert 0.0 <= r.mean_conf <= 1.0
        assert 0.0 <= r.pos_rate <= 1.0
        assert r.n_pos <= r.n_docs
    # bins partition the scored docs
    n_cls = P.QUERIES["quality_classifier_score"](spark, SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_cls


def test_ndcg_bounds_and_relevance(spark):
    rows = P.QUERIES["ndcg_label_retrieval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0
        assert 0 <= r.n_rel <= 10
        # perfect separation iff every relevant ranked first
        if r.n_rel in (0, 10):
            assert r.ndcg in (0.0, 1.0)


def test_srm_chi2_identity(spark):
    rows = P.QUERIES["srm_arm_balance"](spark, SF_DIR).collect()
    assert len(rows) == 4
    n = sum(r.n_users for r in rows)
    chi2 = rows[0].chi2
    assert all(abs(r.chi2 - chi2) < 1e-9 for r in rows)
    assert chi2 >= 0
    # the closed form equals the textbook sum((o-e)^2/e)
    e = n / 4
    direct = sum((r.n_users - e) ** 2 / e for r in rows)
    assert abs(direct - chi2) < 1e-4
    ev = load_table(spark, SF_DIR, "events")
    assert n == ev.select("user_id").distinct().count()


def test_decay_score_bounds(spark):
    rows = P.QUERIES["decayed_engagement_score"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # each event contributes at most 1 (age 0) and more than 0
        assert 0.0 < r.decayed_score <= r.n_events + 1e-9


def test_target_encode_within_value_range(spark):
    ev = load_table(spark, SF_DIR, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    rows = P.QUERIES["target_encode_loo"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # enc is a convex combination of fold-complement targets
        assert lo - 1e-6 <= r.enc_value <= hi + 1e-6


def test_token_inflation_at_least_one(spark):
    rows = P.QUERIES["dedup_token_inflation"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.inflation_ratio >= 1.0 - 1e-9
        assert r.effective_tokens <= r.total_tokens + 1e-6


def test_hard_negatives_are_cross_label(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = P.QUERIES["hard_negative_mining"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.neg_label != labels[r.query_id]
        assert 1 <= r.rank <= 5


def test_source_overlap_matrix_consistency(spark):
    rows = P.QUERIES["source_overlap_matrix"](spark, SF_DIR).collect()
    for r in rows:
        assert r.src_lo <= r.src_hi
        assert 1 <= r.n_docs <= 2 * r.n_pairs


def test_anomaly_ensemble_vote_invariants(spark):
    rows = P.QUERIES["anomaly_ensemble_vote"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # unanimity implies majority implies a per-detector lower bound
        assert r.n_unanimous <= r.n_majority
        assert r.n_majority <= r.n_zscore + r.n_iqr + r.n_mad
        for c in (r.n_zscore, r.n_iqr, r.n_mad):
            assert 0 <= c <= r.n_events
            assert r.n_unanimous <= c  # all-3 rows flagged by each
        assert abs(r.majority_rate_pct - 100.0 * r.n_majority / r.n_events) < 1e-4
    # covers every device with a non-null value
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    assert len(rows) == ev.select("user_id").distinct().count()


def test_seasonal_backtest_invariants(spark):
    rows = P.QUERIES["seasonal_naive_backtest"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mae_seasonal >= 0 and r.mae_naive >= 0
        # the per-cell mean minimizes squared error, not MAE, so the
        # seasonal MAE may exceed the naive MAE in principle — but the
        # skill score must be the exact ratio of the two
        if r.mae_naive > 0:
            assert abs(r.skill_score - (1.0 - r.mae_seasonal / r.mae_naive)) < 1e-4


def test_readability_bounds(spark):
    rows = P.QUERIES["readability_grade"](spark, SF_DIR).collect()
    assert rows
    docs = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        # >= 1 word per sentence by construction (s <= w is not forced,
        # but wps must be positive and finite)
        assert r.avg_words_per_sentence > 0
        # Flesch ease for syl==w, wps=k is bounded above by 206.835-84.6
        assert r.avg_flesch_ease <= 206.835 - 84.6 + 1e-6


def test_heaps_curve_monotone(spark):
    rows = sorted(
        P.QUERIES["heaps_law_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.checkpoint,
    )
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        # cumulative token count and vocabulary are non-decreasing in
        # the checkpoint; vocabulary never exceeds tokens seen
        assert b.cum_tokens >= a.cum_tokens
        assert b.vocab_size >= a.vocab_size
        assert b.doc_id_threshold >= a.doc_id_threshold
    for r in rows:
        assert r.vocab_size <= r.cum_tokens
        if r.heaps_beta is not None:
            assert r.heaps_beta >= 0.0
    # final checkpoint covers the whole corpus
    docs = load_table(spark, SF_DIR, "documents")
    assert rows[-1].n_docs_cum == docs.count()


def test_funnel_timing_consistent_with_funnel_conversion(spark):
    rows = {r.step: r for r in P.QUERIES["funnel_step_timing"](spark, SF_DIR).collect()}
    assert set(rows) == {"view_to_click", "click_to_purchase"}
    for r in rows.values():
        # latencies are positive (strict-inequality chain) and ordered
        assert 0 < r.median_latency_s <= r.p90_latency_s
        assert r.mean_latency_s > 0
    # stage populations shrink monotonically and match the funnel
    # query's staged counts exactly (same strict-inequality chain)
    fc = P.QUERIES["funnel_conversion"](spark, SF_DIR).collect()[0]
    assert rows["view_to_click"].n_users == fc.n_view_click
    assert rows["click_to_purchase"].n_users == fc.n_full_funnel
    assert rows["click_to_purchase"].n_users <= rows["view_to_click"].n_users


def test_centroid_separation_symmetric_and_positive(spark):
    rows = P.QUERIES["centroid_separation_audit"](spark, SF_DIR).collect()
    labels = {r.label for r in rows}
    emb = load_table(spark, SF_DIR, "embeddings")
    assert labels == {r.label for r in emb.select("label").distinct().collect()}
    for r in rows:
        assert r.nearest_label in labels and r.nearest_label != r.label
        assert r.nearest_dist2 >= 0
        assert r.centroid_norm2 >= 0
        assert r.n_vectors > 0
    assert sum(r.n_vectors for r in rows) == emb.count()


def test_pr_curve_monotone_and_consistent(spark):
    rows = sorted(
        P.QUERIES["pr_curve_bins"](spark, SF_DIR).collect(),
        key=lambda r: -r.threshold_bin,
    )
    assert rows
    total_pos = rows[0].total_pos
    prev_pred = prev_tp = 0
    for r in rows:
        # cumulative counts grow as the threshold loosens; recall is
        # non-decreasing and ends at 1
        assert r.n_pred_pos >= prev_pred and r.tp >= prev_tp
        prev_pred, prev_tp = r.n_pred_pos, r.tp
        assert 0 <= r.tp <= r.n_pred_pos
        assert abs(r.recall - r.tp / total_pos) < 1e-4
        if r.n_pred_pos:
            assert abs(r.precision - r.tp / r.n_pred_pos) < 1e-4
    assert rows[-1].recall == 1.0
    # loosest threshold predicts everything positive -> precision = base rate
    n_cls = P.QUERIES["quality_classifier_score"](spark, SF_DIR).count()
    assert rows[-1].n_pred_pos == n_cls


def test_dft_periodogram_invariants(spark):
    rows = P.QUERIES["dft_periodogram"](spark, SF_DIR).collect()
    assert len(rows) == 4
    n_hours = {r.n_hours for r in rows}
    assert len(n_hours) == 1 and n_hours.pop() > 0
    for r in rows:
        assert r.spec_power >= 0.0
        assert r.amplitude >= 0.0
        # amplitude = 2*sqrt(power) by construction (both rounded at 6)
        assert abs(r.amplitude - 2.0 * r.spec_power ** 0.5) < 1e-4


def test_skyline_mutual_nondominance_and_extremes(spark):
    rows = P.QUERIES["skyline_supplier_frontier"](spark, SF_DIR).collect()
    assert rows
    pts = [(r.revenue, r.acctbal) for r in rows]
    for i, (xr, xb) in enumerate(pts):
        for j, (or_, ob) in enumerate(pts):
            if i == j:
                continue
            dominated = or_ >= xr and ob >= xb and (or_ > xr or ob > xb)
            assert not dominated, f"frontier row {i} dominated by {j}"
    # the extreme points of each axis are always on the frontier
    li = load_table(spark, SF_DIR, "lineitem")
    sup = load_table(spark, SF_DIR, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).cast("double"),
            2,
        ).alias("rev")
    ).join(sup.select("s_suppkey", "s_acctbal"), "s_suppkey")
    max_rev = rev.agg(F.max("rev")).first()[0]
    max_bal = rev.agg(F.max(F.round("s_acctbal", 2))).first()[0]
    assert any(abs(r.revenue - max_rev) < 1e-6 for r in rows)
    assert any(abs(r.acctbal - max_bal) < 1e-6 for r in rows)


def test_weighted_median_cumweight_property(spark):
    rows = P.QUERIES["weighted_median_price"](spark, SF_DIR).collect()
    assert rows
    li = load_table(spark, SF_DIR, "lineitem")
    for r in rows:
        part = li.filter(F.col("l_returnflag") == r.l_returnflag)
        below = part.filter(
            F.round("l_extendedprice", 2) < r.weighted_median_price
        ).agg(F.sum("l_quantity")).first()[0] or 0.0
        at_or_below = part.filter(
            F.round("l_extendedprice", 2) <= r.weighted_median_price
        ).agg(F.sum("l_quantity")).first()[0]
        # lower weighted median: strictly-below mass < half <= mass at-or-below
        assert 2 * below < r.total_weight + 1e-6
        assert 2 * at_or_below >= r.total_weight - 1e-6


def test_fifo_match_counts(spark):
    rows = P.QUERIES["fifo_click_purchase_match"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_matched == min(r.n_clicks, r.n_purchases)
        assert 0 <= r.n_causal_matches <= r.n_matched
        if r.n_matched == 0:
            assert r.avg_wait_s is None and r.max_wait_s is None
        else:
            assert r.avg_wait_s is not None and r.max_wait_s is not None


def test_mrr_recall_bounds(spark):
    rows = P.QUERIES["mrr_recall_retrieval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_rel_topk <= 10
        assert 0.0 <= r.reciprocal_rank <= 1.0
        assert 0.0 <= r.recall_at_k <= 1.0
        assert abs(r.precision_at_k - r.n_rel_topk / 10.0) < 1e-9
        if r.first_rel_rank == 1:
            assert r.reciprocal_rank == 1.0
        assert (r.first_rel_rank > 0) == (r.n_rel_topk > 0)
        assert (r.reciprocal_rank > 0) == (r.n_rel_topk > 0)


def test_spearman_bounds_and_population(spark):
    rows = P.QUERIES["spearman_value_time"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.spearman_rho <= 1.0 + 1e-9
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    per_user = {u: n for u, n in ev.groupBy("user_id").count().collect()}
    assert {r.user_id: r.n_events for r in rows} == per_user


def test_entropy_rate_bounds(spark):
    import math

    r = P.QUERIES["markov_entropy_rate"](spark, SF_DIR).collect()[0]
    assert r.n_states >= 2 and r.n_transitions > 0
    ceiling = math.log2(r.n_states)
    assert 0.0 <= r.entropy_rate_bits <= ceiling + 1e-6
    assert abs(r.entropy_ratio - r.entropy_rate_bits / ceiling) < 1e-4


def test_crosscorr_bounds_and_symmetric_pair_counts(spark):
    rows = {r.lag_hours: r for r in
            P.QUERIES["crosscorr_click_purchase"](spark, SF_DIR).collect()}
    assert len(rows) == 13
    for r in rows.values():
        assert -1.0 - 1e-9 <= r.crosscorr <= 1.0 + 1e-9
    # lag L and -L overlap the grid identically: n_pairs symmetric,
    # and lag 0 has the full grid
    for lag in (1, 2, 3, 4, 5, 6):
        assert rows[lag].n_pairs == rows[-lag].n_pairs
        assert rows[lag].n_pairs == rows[0].n_pairs - lag


def test_seasonal_indices_sum_near_zero(spark):
    rows = P.QUERIES["seasonal_decomposition_hourly"](spark, SF_DIR).collect()
    assert len(rows) == 24
    assert {r.hour_of_day for r in rows} == set(range(24))
    for r in rows:
        assert r.residual_std >= 0.0
    # additive decomposition: detrended means nearly cancel across the
    # cycle (exactly iff every hour-of-day appears equally often in
    # the complete-frame region; allow the edge imbalance)
    total_obs = sum(r.n_obs for r in rows)
    weighted = sum(r.seasonal_index * r.n_obs for r in rows)
    assert abs(weighted / total_obs) < 1.0


def test_wilcoxon_rank_sum_identity(spark):
    r = P.QUERIES["wilcoxon_signed_rank_weekend"](spark, SF_DIR).collect()[0]
    n = r.n_pairs
    assert n > 0
    # W+ + W- = n(n+1)/2 exactly (every nonzero diff is ranked once)
    assert abs((r.w_plus + r.w_minus) - n * (n + 1) / 2) < 1e-6
    assert r.w_plus >= 0 and r.w_minus >= 0


def test_median_ci_brackets_median(spark):
    rows = P.QUERIES["median_ci_order_stats"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.k_lo <= r.k_hi <= r.n_values
        assert r.ci_lo <= r.median_value <= r.ci_hi


def test_runs_test_counts_and_bounds(spark):
    rows = P.QUERIES["runs_test_randomness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # runs are bounded by 1..n1+n2 and can't exceed 2*min+1
        assert 1 <= r.r_runs <= r.n_above + r.n_below
        assert r.r_runs <= 2 * min(r.n_above, r.n_below) + 1
        assert 1.0 <= r.expected_runs <= r.n_above + r.n_below


def test_allan_variance_nonneg_and_tau_coverage(spark):
    rows = P.QUERIES["allan_variance_per_device"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.allan_var >= 0.0
        assert r.n_pairs >= 1
    assert {r.tau_hours for r in rows} == {1, 2, 4, 8}


def test_hurst_block_counts_and_independent_slope(spark):
    import numpy as np

    rows = sorted(
        P.QUERIES["hurst_rs_exponent"](spark, SF_DIR).collect(),
        key=lambda r: r.block_size_hours,
    )
    assert [r.block_size_hours for r in rows] == [16, 32, 64, 128]
    n_hours = (
        load_table(spark, SF_DIR, "events")
        .selectExpr("unix_timestamp(ts) div 3600 AS hr")
        .agg(F.max("hr") - F.min("hr") + 1)
        .first()[0]
    )
    for r in rows:
        assert r.n_blocks == n_hours // r.block_size_hours
    x = np.log2([r.block_size_hours for r in rows])
    y = [r.mean_log2_rs for r in rows]
    slope = np.polyfit(x, y, 1)[0]
    assert abs(rows[0].hurst_exponent - slope) < 1e-6


def test_dispersion_identity_and_positivity(spark):
    rows = P.QUERIES["poisson_dispersion_test"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.mean_per_hour > 0 and r.dispersion_index > 0
        assert abs(r.chi2_stat - (r.n_hours - 1) * r.dispersion_index) < 1e-6
    # all types share one global grid
    assert len({r.n_hours for r in rows}) == 1


def test_gumbel_fit_ordering(spark):
    rows = P.QUERIES["extreme_value_gumbel_fit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.gumbel_scale > 0
        # -ln(-ln(0.99)) > 0, so the 99% return level sits above loc
        assert r.return_level_99 > r.gumbel_loc


def test_mcnemar_partition_of_users(spark):
    r = P.QUERIES["mcnemar_weekend_conversion"](spark, SF_DIR).collect()[0]
    assert (r.n_both + r.n_weekend_only + r.n_weekday_only + r.n_neither
            == r.n_users)
    ev = load_table(spark, SF_DIR, "events")
    assert r.n_users == ev.select("user_id").distinct().count()
    if r.n_weekend_only + r.n_weekday_only > 0:
        assert r.mcnemar_chi2 >= 0


def test_kappa_contingency_identities(spark):
    r = P.QUERIES["cohens_kappa_quality"](spark, SF_DIR).collect()[0]
    assert (r.n_both_keep + r.n_model_only + r.n_rules_only + r.n_both_drop
            == r.n_docs)
    assert 0.0 <= r.observed_agreement <= 1.0
    assert r.cohens_kappa <= 1.0 + 1e-9


def test_price_volume_bridge_additivity(spark):
    rows = P.QUERIES["price_volume_bridge"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # exact on the unrounded decimals; the reported revenue columns
        # are ROUND(.., 2), so allow two half-cent display roundings
        assert abs(
            (r.volume_effect + r.price_effect) - (r.revenue_y1 - r.revenue_y0)
        ) < 0.02


def test_smd_three_covariates_and_population(spark):
    rows = P.QUERIES["covariate_balance_smd"](spark, SF_DIR).collect()
    assert {r.covariate for r in rows} == {"n_events", "n_weekend", "sum_value"}
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    for r in rows:
        assert r.n_control + r.n_treatment == n_users
        assert r.n_control > 1 and r.n_treatment > 1


def test_cpk_sign_vs_out_of_spec(spark):
    rows = P.QUERIES["process_capability_cpk"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.stddev_value > 0
        # a mean outside the spec band forces a negative index
        if r.mean_value < 0.0 or r.mean_value > 100.0:
            assert r.cpk < 0


def test_odds_ratio_ci_brackets_point(spark):
    r = P.QUERIES["odds_ratio_weekend_error"](spark, SF_DIR).collect()[0]
    assert r.ci_lo <= r.odds_ratio <= r.ci_hi
    assert r.ci_lo > 0
    # OR identity vs the raw counts
    direct = (r.n_weekend_error * r.n_weekday_other) / (
        r.n_weekend_other * r.n_weekday_error
    )
    assert abs(direct - r.odds_ratio) < 1e-9
