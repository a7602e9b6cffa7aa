"""Sketch profiles vs their exact twins, within published error bounds
(extensions/sketches.py). Run on real testdata so cardinalities are
realistic for the bounds being claimed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_etl_spark.extensions.sketches import (
    approx_distinct_profile,
    approx_quantile_profile,
)
from iot_etl_spark.sources.tables import load_events
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF_DIR).cache()


def test_hll_within_relative_error(spark, events):
    rsd = 0.023
    approx = {
        r.event_type: r
        for r in approx_distinct_profile(events, rsd=rsd).collect()
    }
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.countDistinct(F.to_date("ts")).alias("days"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, ex in exact.items():
        ap = approx[et]
        # HLL++ rsd is a standard deviation; 5 sigma is a safe test bound
        assert abs(ap.approx_distinct_devices - ex.d) <= max(5 * rsd * ex.d, 1.0), et
        assert abs(ap.approx_active_days - ex.days) <= max(5 * rsd * ex.days, 1.0), et
        assert ap.reading_count == ex.n  # plain count is exact


def test_gk_quantiles_within_rank_error(spark, events):
    accuracy = 10_000
    approx = {r.event_type: r for r in approx_quantile_profile(events, accuracy=accuracy).collect()}
    # GK guarantee: returned value's RANK is within n/accuracy of the
    # target rank -> check by rank, not by value distance
    vals = {
        et: sorted(
            r.value for r in events.filter(
                (F.col("event_type") == et) & F.col("value").isNotNull()
            ).select("value").collect()
        )
        for et in approx
    }
    for et, row in approx.items():
        v, n = vals[et], len(vals[et])
        tol = max(2 * n // accuracy, 2)
        for p, got in ((0.5, row.p50_value), (0.95, row.p95_value), (0.99, row.p99_value)):
            target = int(p * (n - 1))
            lo = v[max(0, target - tol)]
            hi = v[min(n - 1, target + tol)]
            assert lo <= got <= hi, (et, p, got, lo, hi)
