"""Named query library.

Each query is registered with a builder ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) a DuckDB-compatible oracle SQL string over
the pre-registered views ``region nation customer supplier part orders
lineitem events documents embeddings``. Column names and rounding are
kept identical on both sides — the correctness driver hashes values
after sorting columns by name.

Importing this package populates the registry.
"""

from iot_etl_spark.plans.registry import QUERIES, ORACLES, query

# registration side-effects
from iot_etl_spark.plans import queries_tpch  # noqa: F401
from iot_etl_spark.plans import queries_tpch2  # noqa: F401
from iot_etl_spark.plans import queries_sqlsurface  # noqa: F401
from iot_etl_spark.plans import queries_events  # noqa: F401
from iot_etl_spark.plans import queries_text  # noqa: F401
from iot_etl_spark.plans import queries_embed  # noqa: F401
from iot_etl_spark.plans import queries_corpus  # noqa: F401
from iot_etl_spark.plans import queries_stream  # noqa: F401
from iot_etl_spark.plans import queries_warehouse  # noqa: F401
from iot_etl_spark.plans import queries_analytics2  # noqa: F401
from iot_etl_spark.plans import queries_mlprep  # noqa: F401
from iot_etl_spark.plans import queries_audit  # noqa: F401
from iot_etl_spark.plans import queries_analytics3  # noqa: F401
from iot_etl_spark.plans import queries_analytics4  # noqa: F401
from iot_etl_spark.plans import queries_analytics5  # noqa: F401

# --------------------------------------------------------------- ordering
# The correctness driver checks the FIRST 50 registry entries, so the
# window is curated per round for maximum fresh evidence. Round-8
# rotation (VERDICT r7 item 2): slot 1 is the theilsen re-check after
# the signed-zero fix; slots 2-50 are the oldest 49 of the 57 queries
# that have never appeared in any driver CORRECTNESS window (round-6/7
# registrations that outran the 50-slot window). The remaining 8
# never-checked names queue immediately after and head round 9's
# window, followed by the oldest r1 greens due for regression
# re-checks (VERDICT item 4).
# Names listed here but not (yet) registered are ignored; registered
# names absent from the list keep their original relative order after
# the prioritized block.
_DRIVER_WINDOW_FIRST: list[str] = [
    # ---- slot 1: round-7's only red, fixed this round (-0.0 normalize)
    "theilsen_trend_recent",
    # ---- never-driver-checked backlog, oldest first (57 names; the
    # ---- first 49 fill this round's window)
    "ks_weekend_value",
    "chi2_type_dow",
    "adamic_adar_linkpred",
    "srp_sketch_audit",
    "mannwhitney_weekend_value",
    "rrf_hybrid_retrieval",
    "stream_outer_join_attribution",
    "welch_ttest_value",
    "woe_iv_event_weekend",
    "classifier_lang_auc",
    "bm25_retrieval",
    "kaplan_meier_waits",
    "group_kfold_assign",
    "hill_tail_index",
    "cuped_experiment_readout",
    "stream_full_outer_reconcile",
    "srm_arm_balance",
    "calibration_bins",
    "ndcg_label_retrieval",
    "dedup_token_inflation",
    "source_overlap_matrix",
    "mutual_info_type_hour",
    "stream_dedup_ttl",
    "hard_negative_mining",
    "target_encode_loo",
    "decayed_engagement_score",
    "js_divergence_sources",
    "markov_prediction_accuracy",
    "anomaly_ensemble_vote",
    "seasonal_naive_backtest",
    "readability_grade",
    "heaps_law_curve",
    "funnel_step_timing",
    "centroid_separation_audit",
    "pr_curve_bins",
    "dft_periodogram",
    "skyline_supplier_frontier",
    "weighted_median_price",
    "fifo_click_purchase_match",
    "mrr_recall_retrieval",
    "spearman_value_time",
    "markov_entropy_rate",
    "crosscorr_click_purchase",
    "seasonal_decomposition_hourly",
    "wilcoxon_signed_rank_weekend",
    "median_ci_order_stats",
    "runs_test_randomness",
    "allan_variance_per_device",
    "hurst_rs_exponent",
    "poisson_dispersion_test",
    "extreme_value_gumbel_fit",
    "mcnemar_weekend_conversion",
    "cohens_kappa_quality",
    "price_volume_bridge",
    "covariate_balance_smd",
    "process_capability_cpk",
    "odds_ratio_weekend_error",
    "pricing_summary",
    "enriched_lineitem_topk",
    "revenue_by_nation",
    "top_customers_by_revenue",
    "order_priority_counts",
    "sql_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q17_small_quantity_revenue",
]


def _reorder() -> None:
    prioritized = [n for n in _DRIVER_WINDOW_FIRST if n in QUERIES]
    tail = [n for n in QUERIES if n not in set(prioritized)]
    ordered = prioritized + tail
    for mapping in (QUERIES, ORACLES):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)


_reorder()

__all__ = ["QUERIES", "ORACLES", "query"]
