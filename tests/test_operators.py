"""Operator unit tests on tiny inline frames (SURVEY.md §5 item 2):
edge semantics the differential tests can't isolate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from iot_etl_spark.operators.anomaly import add_zscore_anomaly
from iot_etl_spark.operators.enrich import enrich_left_join
from iot_etl_spark.operators.latest import latest_per_key
from iot_etl_spark.operators.quality import add_quality_flags
from iot_etl_spark.operators.rolling import add_rolling_features


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_zscore_stddev_zero_guard(spark):
    # constant values -> stddev 0 -> z must be 0, not NULL/NaN
    # (reference guard at spark_transform.py:168-170)
    df = spark.createDataFrame(
        [(1, 5.0), (1, 5.0), (1, 5.0)], "user_id LONG, value DOUBLE"
    )
    out = add_zscore_anomaly(df).select("z_score", "is_anomaly_zscore").collect()
    assert all(r.z_score == 0.0 for r in out)
    assert not any(r.is_anomaly_zscore for r in out)


def test_left_join_keeps_unmatched_fact_rows(spark):
    # enrichment must not drop readings (spark_transform.py:46-50)
    fact = spark.createDataFrame([(1, 10.0), (99, 20.0)], "user_id LONG, value DOUBLE")
    dim = spark.createDataFrame([(1, "alice")], "user_id LONG, name STRING")
    out = enrich_left_join(fact, dim, on="user_id")
    assert out.count() == 2
    row = out.filter(F.col("user_id") == 99).first()
    assert row.name is None


def test_latest_per_key_tiebreak(spark):
    # duplicate timestamps: highest tiebreak id wins deterministically
    # (SURVEY.md §7.3 item 4 — DISTINCT ON tie hardening)
    t = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame(
        [(1, t, 100, 1.0), (1, t, 200, 2.0), (2, t, 5, 3.0)],
        "user_id LONG, ts TIMESTAMP, event_id LONG, value DOUBLE",
    )
    out = {r.user_id: r.event_id for r in latest_per_key(df).collect()}
    assert out == {1: 200, 2: 5}


def test_rolling_range_frame_inclusivity(spark):
    # rangeBetween(-300, 0): a row exactly 300s earlier IS in frame,
    # 301s earlier is NOT (frame bounds of spark_transform.py:128)
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 10.0),
        (1, _ts("2024-01-01T00:05:00"), 20.0),   # 300s after first
        (1, _ts("2024-01-01T00:10:01"), 30.0),   # 301s after second
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE")
    out = sorted(
        add_rolling_features(df).select("ts", "rolling_avg_5min").collect(),
        key=lambda r: r.ts,
    )
    assert out[0].rolling_avg_5min == 10.0
    assert out[1].rolling_avg_5min == 15.0  # includes the -300s row
    assert out[2].rolling_avg_5min == 30.0  # excludes the -301s row


def test_quality_flags_null_and_range(spark):
    df = spark.createDataFrame(
        [(1, None), (2, -1.0), (3, 5.0)], "id LONG, value DOUBLE"
    )
    out = {r.id: r.is_valid_record for r in add_quality_flags(df).collect()}
    assert out == {1: False, 2: False, 3: True}


def test_broadcast_join_in_plan(spark):
    # dimension joins must broadcast: the fact side may be 100 TB
    fact = spark.range(1000).withColumnRenamed("id", "user_id")
    dim = spark.createDataFrame([(1, "x")], "user_id LONG, name STRING")
    plan = enrich_left_join(fact, dim, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
