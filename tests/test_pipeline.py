"""Batch pipeline assembly test (SURVEY.md §7.1 M4)."""

from __future__ import annotations

import os
import shutil
import tempfile

from iot_etl_spark.pipeline.batch import run_batch_pipeline
from tests.conftest import SF_DIR


def test_run_batch_pipeline_end_to_end(spark):
    tmp = tempfile.mkdtemp(prefix="iot_etl_batch_")
    try:
        audit = run_batch_pipeline(spark, SF_DIR, tmp)
        assert audit["total"] == 1000  # sf0.001 events
        assert 0 < audit["valid"] <= audit["total"]

        fact = spark.read.parquet(os.path.join(tmp, "fact_events_enriched"))
        assert fact.count() == audit["valid"]
        # date partitioning materialized (hypertable-chunk analog)
        assert "event_date" in fact.columns
        assert any(
            p.startswith("event_date=")
            for p in os.listdir(os.path.join(tmp, "fact_events_enriched"))
        )
        # fact rows all valid + stamped
        assert fact.filter(~fact.is_valid_record).count() == 0
        assert "etl_loaded_at" in fact.columns

        dim = spark.read.parquet(os.path.join(tmp, "dim_customer"))
        assert dim.count() > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_write_csv_roundtrip(spark, tmp_path):
    """S16 CSV sink: distributed write, lossless round-trip."""
    from iot_etl_spark.pipeline.batch import write_csv
    from iot_etl_spark.sources.tables import load_table

    nation = load_table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_console_sink_starts_and_stops(spark):
    """S13 console debug sink (spark_streaming_consumer.py:258-279)."""
    from iot_etl_spark.streaming.pipeline import read_stream_source, start_console_sink

    src = read_stream_source(spark, "parquet", path=f"{SF_DIR}/events.parquet")
    q = start_console_sink(src, num_rows=3)
    try:
        q.processAllAvailable()
        assert q.isActive
    finally:
        q.stop()


def test_date_partition_pruning_in_plan(spark, tmp_path):
    """The 100 TB layout claim, demonstrated: facts written partitioned
    by event_date are PARTITION-PRUNED for time predicates — the scan
    lists only matching date directories (the hypertable chunk-
    exclusion analog, SURVEY §2.11)."""
    import datetime
    from pyspark.sql import functions as F
    from iot_etl_spark.sources.tables import load_events

    out = str(tmp_path / "fact")
    ev = load_events(spark, SF_DIR).withColumn("event_date", F.to_date("ts"))
    ev.write.partitionBy("event_date").parquet(out)
    dates = sorted(r.event_date for r in
                   spark.read.parquet(out).select("event_date").distinct().collect())
    assert len(dates) >= 3
    target = dates[1]

    q = spark.read.parquet(out).filter(F.col("event_date") == F.lit(target))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and str(target) in plan.replace("%20", " ")
    # count of scanned files == files of exactly one partition dir
    import re
    scanned = q.select(F.input_file_name()).distinct().collect()
    assert all(f"event_date={target}" in r[0] for r in scanned)


def test_cli_list_and_unknown_query(capsys):
    """CLI surface: `list` prints the registry; unknown query name is a
    clean error exit, not a traceback. (Spark-touching subcommands are
    exercised by the module smoke paths; here we pin the argv
    contract without paying a JVM.)"""
    from iot_etl_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    from iot_etl_spark.plans import registry

    assert sorted(registry.QUERIES) == out
    assert main(["query", "no_such_query"]) == 2


def test_write_with_audit_collects_metrics_in_one_action(spark, tmp_path):
    """Observation-based audit: the write itself yields row counts and
    custom metrics — no second scan (the reference re-executed the
    lineage per count() audit; SURVEY §4 anti-pattern)."""
    from pyspark.sql import functions as F

    from iot_etl_spark.pipeline.batch import write_with_audit
    from iot_etl_spark.sources.tables import load_events
    from tests.conftest import SF_DIR

    ev = load_events(spark, SF_DIR).select("event_id", "user_id", "value")
    got = write_with_audit(
        ev,
        f"{tmp_path}/out",
        metrics={"null_values": F.sum(F.col("value").isNull().cast("long"))},
        mode="overwrite",
    )
    written = spark.read.parquet(f"{tmp_path}/out")
    assert got["rows_written"] == written.count()
    assert got["null_values"] == written.filter(F.col("value").isNull()).count()


def test_stream_to_continuous_aggregate_end_to_end(spark, tmp_path):
    """The reference's PRIMARY loop composed end to end from this
    engine's pieces: stream ingest -> fact table -> continuous-
    aggregate materialization -> late backfill -> dirty-window refresh
    -> reads routed to the (now fresh) materialized aggregate.
    (Reference: Kafka -> spark_streaming_consumer.py -> hypertable ->
    create_dwh_schema.sql:142-233 continuous aggregate + policy.)"""
    import pyspark.sql.functions as F
    from iot_etl_spark.streaming.pipeline import read_stream_source
    from iot_etl_spark.warehouse.lifecycle import (
        hourly_agg,
        materialize_agg,
        refresh_agg,
        route_to_agg,
    )
    from tests.conftest import SF_DIR

    facts_dir = str(tmp_path / "facts")
    ckpt = str(tmp_path / "ckpt")
    mv = str(tmp_path / "mv_hourly")

    # 1. stream the event feed into the fact table (real engine,
    #    checkpointed, availableNow drains the source)
    src = read_stream_source(
        spark, "parquet", path=f"{str(SF_DIR).rstrip('/')}/events.parquet"
    )
    q = (
        src.writeStream.format("parquet")
        .option("path", facts_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    facts = spark.read.parquet(facts_dir)
    assert facts.count() > 0

    # 2. materialize the hourly continuous aggregate from the facts
    materialize_agg(facts, mv, bucket="hour")
    routed = route_to_agg(spark, facts, mv, bucket="hour")
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan, "fresh MV must serve the read"

    # 3. late backfill lands (one day re-delivered 2 days later);
    #    router must refuse the stale MV until the refresh runs.
    #    The backfill gets its OWN directory: a streaming file sink
    #    owns its path via the _spark_metadata log, so batch-appended
    #    files there are silently invisible to readers — the union
    #    view below is the correct multi-writer layout.
    last_day = facts.agg(F.max(F.to_date("ts"))).first()[0]
    backfill_dir = str(tmp_path / "facts_backfill")
    late = facts.filter(F.to_date("ts") == last_day).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 2 DAYS")
    )
    late.write.mode("overwrite").parquet(backfill_dir)
    all_facts = facts.unionByName(spark.read.parquet(backfill_dir))
    stale = route_to_agg(spark, all_facts, mv, bucket="hour")
    assert "HashAggregate" in stale._jdf.queryExecution().executedPlan().toString()

    # 4. dirty-window refresh, then the routed read serves the MV and
    #    matches a direct aggregate bit-for-bit
    refresh_agg(all_facts, mv, since=str(last_day), bucket="hour")
    fresh = route_to_agg(spark, all_facts, mv, bucket="hour")
    assert "HashAggregate" not in fresh._jdf.queryExecution().executedPlan().toString()
    direct = hourly_agg(all_facts)
    got = {tuple(r) for r in fresh.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want


def test_write_orc_roundtrip_pushdown_and_partitioning(spark, tmp_path):
    """ORC round-trips exactly (values AND schema), partition columns
    prune directories, and filters reach the ORC scan as
    PushedFilters — the same scan discipline the parquet paths pin."""
    from pyspark.sql import functions as F

    from iot_etl_spark.pipeline.batch import read_orc, write_orc
    from iot_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_orc")
    write_orc(ev, out, partition_by=("event_type",),
              bloom_filter_cols=("user_id",))
    back = read_orc(spark, out)
    assert back.count() == ev.count()
    # exact value round-trip on a deterministic digest of every column
    digest = lambda df: df.select(  # noqa: E731
        F.md5(F.concat_ws("|", F.col("event_id"), F.col("user_id"),
                          F.unix_micros("ts"), F.col("event_type"),
                          F.format_number("value", 6)))
        .alias("h")
    ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long"))).first()[0]
    assert digest(back) == digest(ev)
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter((F.col("user_id") == 3) & (F.col("event_type") == "click"))
        ._jdf.queryExecution().toString()
    )
    assert "PushedFilters: [" in plan and "user_id" in plan
    # partition pruning: only the matching directory is listed
    import os
    assert any(d.startswith("event_type=") for d in os.listdir(out))
