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
from iot_etl_spark.plans import queries_analytics8  # noqa: F401
from iot_etl_spark.plans import queries_analytics9  # noqa: F401

# --------------------------------------------------------------- ordering
# The correctness driver checks the FIRST 50 registry entries, so the
# window is curated per round for maximum fresh evidence. Round-11
# rotation (VERDICT r10 item 2): the round-11 registrations lead
# (fresh evidence first), then the rotation continues into the
# round-3-green tier exactly where round 10 stopped — round 10's
# slots 44-50 covered the tier head through ``dedup_clusters``, so
# this window resumes at ``dedup_exact``; names past slot 50 (with 16
# round-11 registrations the tier is covered through
# ``stream_sliding_agg``, leaving 8 tier names) stay listed in order
# for round 12, which then starts the round-4 tier.
# Names listed here but not (yet) registered are ignored; registered
# names absent from the list keep their original relative order after
# the prioritized block.
# Names first registered in round 11, in registration order. This is
# the single source of truth the STATUS.md changelog count is checked
# against (tests/test_contract.py::test_status_ledger_matches_registry)
# so the ledger can't drift from the registry (VERDICT r10 item 4).
ROUND11_REGISTRATIONS: list[str] = [
    "friedman_test_day_blocks",
    "mood_median_test",
    "grubbs_outlier_scan",
    "chow_break_test",
    "neyman_allocation_plan",
    "calinski_harabasz_index",
    "davies_bouldin_index",
    "fisher_g_periodicity",
    "zorder_pruning_audit",
    "rbp_err_retrieval_eval",
    "cdc_chunk_dedup",
    "g_test_type_dow",
    "ewma_control_chart",
    "partial_corr_value_hour",
    "cochran_q_test",
    "mcc_classifier_eval",
]

_DRIVER_WINDOW_FIRST: list[str] = ROUND11_REGISTRATIONS + [
    # ---- regression re-checks: the round-3-green tier, resumed at
    # the first name round 10's window did not reach
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
