"""UDTF (SQL-callable Python table function) tests: per-partition
ordered fold semantics and agreement with the native gaps-and-islands
window formulation."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from iot_etl_spark.extensions.udtf_ops import register_udtfs


def _events(spark):
    rows = [
        # user 1: runs [10,20] (2 rows) and [50] (1 row)
        (1, 10, True), (1, 20, True), (1, 30, False), (1, 40, False), (1, 50, True),
        # user 2: no anomalies
        (2, 10, False), (2, 20, False),
        # user 3: one run spanning everything
        (3, 5, True), (3, 6, True), (3, 7, True),
    ]
    return spark.createDataFrame(rows, "user_id LONG, ts_us LONG, is_anomaly BOOLEAN")


def test_udtf_partitioned_table_input(spark):
    register_udtfs(spark)
    _events(spark).createOrReplaceTempView("udtf_events")
    out = spark.sql(
        """
        SELECT * FROM anomaly_runs(
            TABLE(SELECT user_id, ts_us, is_anomaly FROM udtf_events)
            PARTITION BY user_id ORDER BY ts_us)
        ORDER BY run_start_us
        """
    ).collect()
    got = [(r.run_start_us, r.run_end_us, r.n_events) for r in out]
    assert got == [(5, 7, 3), (10, 20, 2), (50, 50, 1)]


def test_udtf_agrees_with_native_islands(spark):
    """The UDTF's runs equal the native gaps-and-islands window
    computation on real testdata-shaped input (value>95 as the flag)."""
    from iot_etl_spark.sources.tables import load_events

    register_udtfs(spark)
    ev = (
        load_events(spark, "/root/testdata/sf0.001")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            (F.col("value") > 95).alias("is_anomaly"),
        )
    )
    ev.createOrReplaceTempView("udtf_ev_real")
    udtf_runs = spark.sql(
        """
        SELECT * FROM anomaly_runs(
            TABLE(SELECT user_id, ts_us, is_anomaly FROM udtf_ev_real)
            PARTITION BY user_id ORDER BY ts_us)
        """
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    islands = (
        ev.withColumn(
            "new_run",
            (~F.coalesce(F.lag("is_anomaly").over(w), F.lit(False))).cast("int"),
        )
        .filter("is_anomaly")
        .withColumn(
            "run_id",
            F.sum("new_run").over(
                Window.partitionBy("user_id").orderBy("ts_us")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "run_id")
        .agg(
            F.min("ts_us").alias("run_start_us"),
            F.max("ts_us").alias("run_end_us"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
        )
        .select("run_start_us", "run_end_us", "n_events")
    )
    assert udtf_runs.exceptAll(islands).count() == 0
    assert islands.exceptAll(udtf_runs).count() == 0
    assert udtf_runs.count() > 0
