"""Compression-ratio quality screen (extensions/textquality.py) —
pytest-pinned because DEFLATE has no oracle-side equivalent."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from iot_etl_spark.extensions.textquality import (
    DEFLATE_LEVEL,
    compression_quality_stats,
    with_compression_ratio,
)
from iot_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_ratio_matches_direct_zlib_and_handles_nulls(spark):
    docs = [
        (1, "the cat sat on the mat and looked at the hat", "en", "s1", 45),
        (2, "ab" * 400, "en", "s1", 800),
        (3, None, "en", "s1", 0),
        (4, "", "en", "s1", 0),
        (5, "q8Zl2vX9fKwP3mN7rT5yU1hJ4bG6dS0aE", "xx", "s2", 34),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in with_compression_ratio(df).collect()
    }
    for doc_id, text, *_ in docs:
        if not text:
            assert got[doc_id] is None
        else:
            raw = text.encode("utf-8")
            want = len(zlib.compress(raw, DEFLATE_LEVEL)) / len(raw)
            assert abs(got[doc_id] - want) < 1e-12
    # repetition compresses far better than prose; noise worse
    assert got[2] < got[1] < got[5]


def test_stats_rollup_consistent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    stats = {r["source"]: r for r in compression_quality_stats(docs).collect()}
    n_total = sum(r["n_docs"] for r in stats.values())
    assert n_total == docs.count()
    for r in stats.values():
        assert 0.0 < r["mean_ratio"] < 1.5
        assert 0 <= r["n_too_repetitive"] + r["n_noise_like"] <= r["n_docs"]


def test_map_only_plan(spark):
    """The scoring pass must stay a pure map: zero exchanges before
    the aggregate (only the rollup groupBy shuffles)."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        with_compression_ratio(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 0
    assert "MapInPandas" in plan
