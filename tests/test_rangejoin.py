"""Bucketed point-in-interval join: boundary inclusivity, multi-bucket
intervals, bucket-edge points, key isolation (operators/rangejoin.py).
The real-data path is oracle-checked by range_join_click_counts."""

from __future__ import annotations

import pytest

from iot_etl_spark.operators.rangejoin import point_in_interval_join

B = 100  # bucket width (us) for these tests


def _join(spark, points, intervals, bucket_us=B):
    p = spark.createDataFrame(points, "k LONG, pts LONG, ptag STRING")
    i = spark.createDataFrame(intervals, "k LONG, s LONG, e LONG, itag STRING")
    out = point_in_interval_join(
        p, i, on="k", point_ts_us="pts", start_us="s", end_us="e", bucket_us=bucket_us
    )
    return sorted((r.ptag, r.itag) for r in out.collect())


def test_boundaries_inclusive_and_outside_excluded(spark):
    got = _join(
        spark,
        points=[(1, 50, "at_start"), (1, 150, "inside"), (1, 250, "at_end"),
                (1, 49, "before"), (1, 251, "after")],
        intervals=[(1, 50, 250, "iv")],
    )
    assert got == [("at_end", "iv"), ("at_start", "iv"), ("inside", "iv")]


def test_interval_spanning_many_buckets_matches_all(spark):
    # interval covers 5+ buckets; points live in distinct buckets
    got = _join(
        spark,
        points=[(1, 10, "p0"), (1, 210, "p2"), (1, 460, "p4")],
        intervals=[(1, 0, 460, "wide")],
    )
    assert got == [("p0", "wide"), ("p2", "wide"), ("p4", "wide")]


def test_same_bucket_wrong_key_or_range_no_match(spark):
    got = _join(
        spark,
        points=[(2, 60, "other_key"), (1, 70, "same_bucket_out_of_range")],
        intervals=[(1, 0, 50, "iv")],
    )
    assert got == []


def test_point_matches_multiple_overlapping_intervals(spark):
    got = _join(
        spark,
        points=[(1, 120, "p")],
        intervals=[(1, 100, 200, "a"), (1, 0, 300, "b"), (1, 121, 300, "late")],
    )
    assert got == [("p", "a"), ("p", "b")]


def test_column_collision_is_an_error(spark):
    p = spark.range(1).selectExpr("id AS k", "id AS pts", "id AS dup")
    i = spark.range(1).selectExpr("id AS k", "id AS s", "id AS e", "id AS dup")
    with pytest.raises(ValueError, match="collide"):
        point_in_interval_join(p, i, on="k", point_ts_us="pts",
                               start_us="s", end_us="e", bucket_us=B)
