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
from iot_etl_spark.plans import queries_analytics6  # noqa: F401
from iot_etl_spark.plans import queries_analytics7  # noqa: F401

# --------------------------------------------------------------- ordering
# The correctness driver checks the FIRST 50 registry entries, so the
# window is curated per round for maximum fresh evidence. Round-10
# rotation (VERDICT r9 item 3): slots 1-8 are the round-10
# registrations (fresh evidence first); slots 9-37 drain the LAST 29
# round-2-old names (round 9 covered the first 17 of the 46-name
# block); the remaining slots start on the next-oldest tier — the
# round-3-green names, listed in full so round 11 continues past slot
# 50 in the same order. Names listed here but not (yet) registered
# are ignored; registered names absent from the list keep their
# original relative order after the prioritized block.
_DRIVER_WINDOW_FIRST: list[str] = [
    # ---- round-10 registrations (inserted as they land)
    "kruskal_wallis_value_by_type",
    "brown_forsythe_variance_by_type",
    "durbin_watson_per_device",
    "mase_daily_per_device",
    "croston_intermittent_demand",
    "cochran_armitage_hour_trend",
    "priority_sample_per_type",
    "stream_two_level_agg",
    "silhouette_by_label",
    "capture_recapture_dedup",
    "int8_recall_audit",
    "stream_dedup_then_agg",
    "hourly_agg_incremental_refresh",
    "stream_join_then_agg",
    # ---- regression re-checks: the 29 remaining round-2-old names
    "hourly_event_type_pivot",
    "hourly_rollup",
    "iqr_anomaly",
    "json_props_extract",
    "lag_features",
    "latency_profile",
    "latest_per_device",
    "locf_gap_fill",
    "order_priority_counts",
    "pricing_summary",
    "props_map_extract",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "range_join_click_counts",
    "recent_anomalies_topk",
    "referential_integrity_audit",
    "revenue_by_nation",
    "sensor_drift",
    "sql_shipping_priority",
    "time_grid_gapfill",
    "top_customers_by_revenue",
    "top_devices_per_type",
    "user_set_ops",
    "value_deciles",
    "value_histogram",
    "value_time_correlation",
    "weekend_weekday_comparison",
    "winsorized_stats",
    "zscore_anomaly",
    # ---- next-oldest tier: round-3-green names (slots 38-50 this
    # round; the rest queue for round 11)
    "anomaly_trends_7d",
    "boilerplate_stats",
    "bpe_token_stats",
    "bucketed_join_revenue",
    "corpus_keep_verdict",
    "decontaminate_overlap",
    "dedup_clusters",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "device_mad_builtin",
    "dim_time_calendar",
    "doc_chunks",
    "doc_fingerprint",
    "embedding_cosine_topk",
    "embedding_dim_stats",
    "embedding_int8_quant",
    "embedding_ivf_topk",
    "embedding_label_centroids",
    "embedding_similar_pairs",
    "knn_join",
    "langid_confusion",
    "minhash_lsh_candidates",
    "multimodal_bytes_stats",
    "pii_redaction_stats",
    "q10_returned_items",
    "q5_local_supplier_volume",
    "quality_percentile_gate",
    "repetition_stats",
    "sample_mix_summary",
    "sample_stratified",
    "semantic_dedup_verdict",
    "session_stats",
    "simhash_fingerprint",
    "simhash_near_pairs",
    "stream_dedup",
    "stream_ewma_by_device",
    "stream_interval_join",
    "stream_json_decode",
    "stream_raw_passthrough",
    "stream_session_window",
    "stream_sliding_agg",
    "stream_static_enrich",
    "stream_tumbling_agg",
    "text_normalize_stats",
    "text_quality_stats",
    "time_weighted_avg",
    "token_count_by_lang",
    "token_heavy_hitters",
    "unigram_logprob_score",
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
