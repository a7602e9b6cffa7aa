"""Physical-plan regression guards (SURVEY.md §7.2): the properties
that make the headline queries scale are pinned here so a refactor
can't silently trade a broadcast for a shuffle, lose a pushed filter,
or reintroduce a global sort / all-pairs join.
"""

from __future__ import annotations

import pytest

from iot_etl_spark.plans import registry
from tests.conftest import SF_DIR


def _plans(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.toString()


def test_pushdown_reaches_parquet_scans(spark):
    """Filters land in the scan (PushedFilters), not above it."""
    for name, frag in [
        ("device_stats", "PushedFilters: [IsNotNull"),
        ("sql_shipping_priority", "LessThan(o_orderdate"),
        ("pricing_summary", "PushedFilters"),
        ("q5_local_supplier_volume", "GreaterThanOrEqual(o_orderdate"),
    ]:
        _, full = _plans(spark, name)
        assert frag in full, (name, frag)


def test_dim_joins_broadcast(spark):
    """Dimension/small-side joins are broadcast hash joins — the fact
    side never shuffles for enrichment."""
    for name in [
        "enriched_lineitem_topk",
        "sql_shipping_priority",
        "decontaminate_overlap",
        "unigram_logprob_score",
        "customer_activity_split",
        "q5_local_supplier_volume",
    ]:
        plan, _ = _plans(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_topk_compiles_to_take_ordered(spark):
    """ORDER BY + LIMIT never runs a global sort."""
    for name in ["enriched_lineitem_topk", "recent_anomalies_topk",
                 "sql_shipping_priority", "token_heavy_hitters",
                 "q10_returned_items"]:
        plan, _ = _plans(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "], true, 0" not in plan, name  # no global Sort node


def test_row_level_outputs_have_no_global_sort(spark):
    """Unlimited row-level queries must not end in a full sort (the
    driver hash is order-insensitive; a terminal orderBy is a full
    shuffle+sort for nothing at scale). Window-function sorts are
    per-partition (global=false) and allowed."""
    for name in ["zscore_anomaly", "lag_features", "rolling_window_stats",
                 "text_quality_stats", "simhash_fingerprint", "doc_chunks",
                 "repetition_stats", "time_grid_gapfill", "value_histogram",
                 "top_devices_per_type", "sensor_drift"]:
        plan, _ = _plans(spark, name)
        assert "], true, 0" not in plan, name


def test_no_cartesian_or_nested_loop_joins(spark):
    """Near-dup/candidate joins are banded bucket joins — never an
    all-pairs product. (The embedding top-k queries legitimately
    broadcast a 1-row query vector; they are excluded.)"""
    for name in ["simhash_near_pairs", "dedup_ngram_jaccard",
                 "minhash_lsh_candidates", "embedding_similar_pairs",
                 "dedup_clusters"]:
        plan, _ = _plans(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_column_pruning_reaches_scans(spark):
    """Projections prune at the parquet scan (ReadSchema): queries
    that don't touch wide columns must not read them — at 100 TB the
    unread column is the cheapest column."""
    cases = [
        # (query, column that must NOT be scanned)
        ("token_heavy_hitters", "lang"),       # only text is needed
        ("dedup_exact", "props"),              # never touches events
        ("hourly_event_type_pivot", "props"),  # events: ts+type only
        ("sequence_packing", "source"),
        ("order_priority_counts", "o_custkey"),
    ]
    for name, banned in cases:
        _, full = _plans(spark, name)
        schemas = [ln for ln in full.splitlines() if "ReadSchema" in ln]
        assert schemas, name
        assert not any(banned in ln for ln in schemas), (name, banned, schemas)
