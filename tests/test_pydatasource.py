"""Python Data Source API connector tests (sources/pydatasource.py):
registration, schema, partition-planning parallelism, retry
determinism, and composability with ordinary DataFrame ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from iot_etl_spark.sources.pydatasource import (
    SYNTH_SCHEMA,
    register_synthetic_source,
)


def _load(spark, **opts):
    register_synthetic_source(spark)
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_schema_and_count(spark):
    df = _load(spark, n_rows=1000, n_partitions=4, seed=7)
    assert df.schema == SYNTH_SCHEMA
    assert df.count() == 1000
    assert df.select("event_id").distinct().count() == 1000


def test_partition_planning_drives_parallelism(spark):
    df = _load(spark, n_rows=1000, n_partitions=8)
    assert df.rdd.getNumPartitions() == 8
    # ragged split: 10 rows over 3 partitions still yields every row
    df2 = _load(spark, n_rows=10, n_partitions=3)
    assert df2.count() == 10
    # more partitions than rows: empty splits are planned away
    df3 = _load(spark, n_rows=2, n_partitions=8)
    assert df3.count() == 2


def test_deterministic_under_recompute(spark):
    a = _load(spark, n_rows=500, n_partitions=4, seed=11)
    b = _load(spark, n_rows=500, n_partitions=4, seed=11)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = _load(spark, n_rows=500, n_partitions=4, seed=12)
    assert c.exceptAll(a).count() > 0  # the seed actually matters


def test_composes_with_engine_operators(spark):
    """The custom source is a first-class scan: aggregates, filters and
    joins run on it like any parquet table."""
    df = _load(spark, n_rows=2000, n_partitions=4, seed=5)
    agg = (
        df.filter(F.col("value") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
    )
    rows = {r.event_type: r for r in agg.collect()}
    assert set(rows) <= {"view", "click", "purchase", "error", "refund"}
    assert all(r.avg_value > 50 for r in rows.values())
    # typed timestamp column supports time functions
    hours = df.select(F.hour("ts").alias("h")).agg(F.min("h"), F.max("h")).first()
    assert 0 <= hours[0] <= hours[1] <= 23


def test_stream_reader_drains_and_matches_batch(spark):
    """The STREAMING read of the connector yields exactly the same
    rows as the BATCH read for the same seed — one generator, two
    execution modes — and the finite feed drains cleanly through
    processAllAvailable."""
    import uuid

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 300).option("rows_per_batch", 75).option("seed", 9)
        .load()
    )
    assert stream.isStreaming
    name = f"synth_stream_{uuid.uuid4().hex[:6]}"
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name)
    batch = _load(spark, n_rows=300, n_partitions=4, seed=9)
    assert got.count() == 300
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_reader_replay_is_exact(spark):
    """readBetweenOffsets (the recovery/replay path) regenerates a
    committed range verbatim."""
    from iot_etl_spark.sources.pydatasource import SyntheticEventsStreamReader

    r = SyntheticEventsStreamReader({"n_rows": "50", "rows_per_batch": "20", "seed": "3"})
    rows1, off1 = r.read(r.initialOffset())
    first_batch = list(rows1)
    assert off1 == {"next_row": 20} and len(first_batch) == 20
    replay = list(r.readBetweenOffsets({"next_row": 0}, {"next_row": 20}))
    assert replay == first_batch
    # the tail batch is ragged and the feed then stays drained
    rows2, off2 = r.read({"next_row": 40})
    assert off2 == {"next_row": 50} and len(list(rows2)) == 10
    rows3, off3 = r.read(off2)
    assert off3 == {"next_row": 50} and list(rows3) == []
