"""Round-13 optimization invariants.

The round's recurring structural fix is ``registry.spread_scan``: fan a
scan-rooted frame out to the session's shuffle width ONLY when the scan
provides fewer splits (the test tables are single-split parquet, so
expensive per-row stages inherited 1-way parallelism). These pins hold
the helper to its contract: it must fire on a narrow frame, be a
structural no-op on an already-wide one, and never change rows.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from iot_etl_spark.plans.registry import spread_scan


@pytest.fixture(scope="module")
def spark():
    from iot_etl_spark.session import get_spark

    return get_spark(app_name="test_r13_opt")


def test_spread_scan_fires_on_narrow_frame(spark):
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.range(0, 1000, 1, 1).withColumnRenamed("id", "k")
    assert df.rdd.getNumPartitions() == 1
    out = spread_scan(df, "k")
    # the fan-out is an explicit-width exchange (exempt from AQE
    # coalescing), so the static partition count equals the conf width
    assert out.rdd.getNumPartitions() == width
    assert "Exchange" in out._jdf.queryExecution().executedPlan().toString()


def test_spread_scan_noop_on_wide_frame(spark):
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.range(0, 1000, 1, width).withColumnRenamed("id", "k")
    out = spread_scan(df, "k")
    # structurally the SAME frame: no exchange inserted
    assert out is df


def test_spread_scan_preserves_rows(spark):
    df = spark.range(0, 257, 1, 1).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    base = sorted((r.k, r.v) for r in df.collect())
    spread = sorted((r.k, r.v) for r in spread_scan(df, "k").collect())
    assert spread == base
