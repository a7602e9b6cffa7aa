"""Backward as-of join: boundary, no-match, latest-wins, tolerance,
and column-collision semantics (operators/asof.py). The real-data path
is oracle-checked by the asof_click_attribution query; these pin the
operator's edge behavior on handcrafted rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_etl_spark.operators.asof import asof_join

US = 1_000_000


def _ts(sec: int):
    return F.timestamp_micros(F.lit(sec * US))


def _frames(spark):
    lrows = [(1, 10, "L10"), (1, 20, "L20"), (2, 5, "L5")]
    rrows = [(1, 10, 1.0), (1, 15, 2.0), (1, 19, 3.0), (3, 1, 9.0)]
    left = spark.createDataFrame(lrows, "k LONG, sec LONG, tag STRING").select(
        "k", F.timestamp_micros(F.col("sec") * US).alias("ts"), "tag"
    )
    right = spark.createDataFrame(rrows, "k LONG, sec LONG, rv DOUBLE").select(
        "k", F.timestamp_micros(F.col("sec") * US).alias("ts"), "rv"
    )
    return left, right


def test_latest_at_or_before_wins(spark):
    left, right = _frames(spark)
    out = {r.tag: r for r in asof_join(left, right, on=["k"]).collect()}
    # exact tie (sec=10) is matched, inclusive boundary
    assert out["L10"].rv == 1.0 and out["L10"].matched_ts_us == 10 * US
    # latest of {10, 15, 19} <= 20 is 19
    assert out["L20"].rv == 3.0 and out["L20"].matched_ts_us == 19 * US
    # key 2 has no right rows at all -> NULL match, left row kept
    assert out["L5"].rv is None and out["L5"].matched_ts_us is None


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {r.tag: r for r in
           asof_join(left, right, on=["k"], tolerance_us=3 * US).collect()}
    assert out["L20"].rv == 3.0          # gap 1s <= 3s: kept
    assert out["L10"].rv == 1.0          # gap 0: kept
    assert out["L5"].rv is None
    out2 = {r.tag: r for r in
            asof_join(left, right, on=["k"], tolerance_us=0).collect()}
    assert out2["L20"].rv is None        # gap 1s > 0: nulled
    assert out2["L10"].rv == 1.0         # exact tie survives tolerance 0


def test_collision_is_an_error(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "tag"), on=["k"])


def test_null_payload_comes_from_matched_row_not_older(spark):
    """The newest right row's NULL payload column must NOT be stitched
    from an older right row (ADVICE r2: frankenrow). DuckDB ASOF JOIN
    returns the latest row with its NULL intact."""
    left = spark.createDataFrame([(1, 20, "L20")], "k LONG, sec LONG, tag STRING").select(
        "k", F.timestamp_micros(F.col("sec") * US).alias("ts"), "tag"
    )
    rrows = [(1, 10, 1.0, "a"), (1, 15, None, "b")]
    right = spark.createDataFrame(rrows, "k LONG, sec LONG, rv DOUBLE, rl STRING").select(
        "k", F.timestamp_micros(F.col("sec") * US).alias("ts"), "rv", "rl"
    )
    row = asof_join(left, right, on=["k"]).collect()[0]
    assert row.matched_ts_us == 15 * US
    assert row.rl == "b"
    assert row.rv is None  # from the sec=15 row, not sec=10's 1.0
