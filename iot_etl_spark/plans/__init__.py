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

# --------------------------------------------------------------- ordering
# The correctness driver checks the FIRST 50 registry entries, so the
# window is curated: queries whose driver evidence is newest-needed come
# first (fresh fixes and new registrations this round, then the whole
# LLM-pipeline stack — text/embed/corpus/stream — and the warehouse
# pair), followed by the families already driver-verified green in
# CORRECTNESS_r02.json. Names listed here but not (yet) registered are
# ignored; registered names absent from the list keep their original
# relative order after the prioritized block.
_DRIVER_WINDOW_FIRST: list[str] = [
    # round-2 driver reds, fixed this round (HUGEINT oracle casts)
    "q5_local_supplier_volume",
    "q10_returned_items",
    "session_stats",
    "time_weighted_avg",
    # new round-3 registrations (no driver evidence yet)
    "anomaly_trends_7d",
    "device_mad_builtin",
    # text / dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_lsh_candidates",
    "simhash_fingerprint",
    "simhash_near_pairs",
    "dedup_clusters",
    "text_quality_stats",
    "token_count_by_lang",
    "langid_confusion",
    "doc_fingerprint",
    "multimodal_bytes_stats",
    "sample_stratified",
    "sample_mix_summary",
    "quality_percentile_gate",
    "bpe_token_stats",
    "text_normalize_stats",
    # embedding / ANN family
    "embedding_cosine_topk",
    "embedding_similar_pairs",
    "embedding_label_centroids",
    "embedding_ivf_topk",
    "embedding_int8_quant",
    "embedding_dim_stats",
    "semantic_dedup_verdict",
    # corpus-prep family
    "token_heavy_hitters",
    "doc_chunks",
    "decontaminate_overlap",
    "pii_redaction_stats",
    "knn_join",
    "repetition_stats",
    "unigram_logprob_score",
    "sequence_packing",
    "boilerplate_stats",
    "corpus_keep_verdict",
    # structured-streaming family (real engine runs)
    "stream_tumbling_agg",
    "stream_raw_passthrough",
    "stream_json_decode",
    "stream_ewma_by_device",
    "stream_dedup",
    "stream_interval_join",
    "stream_static_enrich",
    "stream_sliding_agg",
    "stream_session_window",
    # warehouse family
    "dim_time_calendar",
    "bucketed_join_revenue",
    # events stragglers never driver-checked in r2
    "seasonal_residual_anomaly",
    "device_availability",
    "device_mad_pandas",
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
