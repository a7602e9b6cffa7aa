"""MERGE INTO semantics over the txlog table (warehouse/merge.py):
three-clause routing, ambiguity rejection, atomicity/time travel —
plus the dynamic-partition-pruning plan pin for partitioned fact
joins (the scan-time analog of MERGE's file pruning note)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

from iot_etl_spark.warehouse.merge import merge_into
from iot_etl_spark.warehouse.txlog import TxTable


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _bootstrap(spark, tmp_path):
    t = TxTable(str(tmp_path / "tx"))
    t.overwrite(
        spark.createDataFrame(
            [
                Row(k=1, v="a", n=10),
                Row(k=2, v="b", n=20),
                Row(k=3, v="c", n=30),
                Row(k=4, v="d", n=40),
            ]
        )
    )
    return t


def test_merge_update_delete_insert_routing(spark, tmp_path):
    t = _bootstrap(spark, tmp_path)
    src = spark.createDataFrame(
        [
            Row(k=2, v="B", n=200),   # matched -> update
            Row(k=3, v="c", n=-1),    # matched + delete condition -> delete
            Row(k=9, v="z", n=90),    # not matched -> insert
        ]
    )
    merge_into(
        spark, t, src, on=["k"], delete_condition=F.col("src_n") < 0
    )
    # untouched rows survive, k=2 updated, k=3 deleted, k=9 inserted
    assert _rows(t.read(spark)) == sorted(
        [(1, 10, "a"), (2, 200, "B"), (4, 40, "d"), (9, 90, "z")]
    )


def test_merge_update_condition_gates_matches(spark, tmp_path):
    t = _bootstrap(spark, tmp_path)
    src = spark.createDataFrame(
        [Row(k=1, v="A", n=100), Row(k=2, v="B", n=5)]
    )
    # only matches where the source n exceeds the target n update
    merge_into(
        spark, t, src, on=["k"],
        update_condition=F.col("src_n") > F.col("n"), insert=False,
    )
    got = {r["k"]: (r["v"], r["n"]) for r in t.read(spark).collect()}
    assert got[1] == ("A", 100)   # condition held -> updated
    assert got[2] == ("b", 20)    # condition failed -> target kept


def test_merge_rejects_ambiguous_source(spark, tmp_path):
    t = _bootstrap(spark, tmp_path)
    src = spark.createDataFrame(
        [Row(k=2, v="x", n=1), Row(k=2, v="y", n=2)]
    )
    with pytest.raises(ValueError, match="ambiguous"):
        merge_into(spark, t, src, on=["k"])
    # the failed merge committed NOTHING
    assert t.latest_version() == 0


def test_merge_is_one_commit_and_time_travels(spark, tmp_path):
    t = _bootstrap(spark, tmp_path)
    v0 = t.latest_version()
    src = spark.createDataFrame([Row(k=1, v="A", n=11), Row(k=8, v="h", n=80)])
    v1 = merge_into(spark, t, src, on=["k"])
    assert v1 == v0 + 1  # exactly one atomic commit
    before = {r["k"]: r["n"] for r in t.read(spark, version=v0).collect()}
    after = {r["k"]: r["n"] for r in t.read(spark).collect()}
    assert before[1] == 10 and after[1] == 11 and 8 not in before and after[8] == 80


def test_merge_null_match_keys_stay_honest(spark, tmp_path):
    t = TxTable(str(tmp_path / "tx"))
    t.overwrite(
        spark.createDataFrame(
            [Row(k=None, v="t-null", n=1), Row(k=5, v="e", n=50)],
            "k INT, v STRING, n INT",
        )
    )
    src = spark.createDataFrame(
        [Row(k=None, v="s-null", n=2)], "k INT, v STRING, n INT"
    )
    merge_into(spark, t, src, on=["k"])
    got = {r["v"]: r["n"] for r in t.read(spark).collect()}
    # NULL key null-safe-matches NULL key: updated, not duplicated
    assert got == {"s-null": 2, "e": 50}


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """The scan-side pruning capability: a selective dim filter on a
    partitioned fact's partition column must inject a runtime
    dynamicpruning subquery into the fact scan, so at 100 TB the join
    reads only the partitions the dim side selects."""
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("fk"),
        (F.col("id") % 50).alias("part_key"),
        (F.col("id") * 2).alias("val"),
    )
    fact_path = str(tmp_path / "fact_parted")
    fact.write.partitionBy("part_key").parquet(fact_path)
    dim = spark.range(0, 50).select(
        F.col("id").alias("part_key"), (F.col("id") % 5).alias("grp")
    )
    dim_path = str(tmp_path / "dim")
    dim.write.parquet(dim_path)

    f = spark.read.parquet(fact_path)
    d = spark.read.parquet(dim_path).filter(F.col("grp") == 3)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        # DPP must hold in the general (non-broadcast-reuse) case too
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
            "false",
        )
        joined = f.join(d, "part_key").groupBy("grp").agg(F.sum("val"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # and the pruned result is still correct
        expect = (
            f.join(d.hint("broadcast"), "part_key")
            .groupBy("grp")
            .agg(F.sum("val"))
            .collect()
        )
        assert joined.collect() == expect
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
            "true",
        )
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_aqe_skew_join_splits_hot_partition(spark, tmp_path):
    """The runtime half of the skew story (operators/skew.py salting
    is the manual half): with AQE skew-join enabled, a sort-merge
    join against a pathologically hot key must be re-planned at
    runtime into a skew=true SMJ (the hot partition split into
    multiple tasks), with results identical to the logical join.

    Two discoveries this pin encodes: the split works at MAPPER
    granularity, so the scan must produce several map tasks (tiny
    test files coalesce into one scan partition by default — hence
    the small maxPartitionBytes/openCost); and the thresholds compare
    against COMPRESSED shuffle bytes, far below the in-memory size at
    test scale."""
    big = spark.range(0, 60_000).select(
        # 95% of rows share key 0; the rest spread over 1000 keys
        F.when(F.col("id") % 20 != 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    big_path = str(tmp_path / "big")
    big.write.parquet(big_path)
    small = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    small_path = str(tmp_path / "small")
    small.write.parquet(small_path)

    confs = {
        # several map tasks, so the hot partition is mapper-splittable
        "spark.sql.files.maxPartitionBytes": "65536",
        "spark.sql.files.openCostInBytes": "0",
        # force SMJ (no broadcast); thresholds sized to COMPRESSED
        # shuffle bytes at test scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        # a downstream stage reusing the shuffle would otherwise veto
        # the split (it adds a shuffle); at 100 TB the split is worth it
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = (
            spark.read.parquet(big_path)
            .join(spark.read.parquet(small_path), "k")
            .select("k", "payload", "dim_val")
        )
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # the AQEShuffleRead carries the mark
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    # result identical to the broadcast twin, hot key included
    expect = (
        spark.read.parquet(big_path)
        .join(spark.read.parquet(small_path).hint("broadcast"), "k")
        .select("k", "payload", "dim_val")
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, expect))


def test_runtime_bloom_filter_injected_on_shuffle_join(spark, tmp_path):
    """The row-level runtime-filtering capability (the shuffle-join
    sibling of the DPP pin above): when a selective dim filter feeds a
    shuffle join against an UNPARTITIONED fact, Spark injects a Bloom
    filter built from the dim side into the fact scan
    (bloom_filter_might_contain), discarding non-joining fact rows
    BEFORE the shuffle — at 100 TB this is the difference between
    shuffling the whole fact table and shuffling the ~matching slice.
    DPP needs a partition column; the Bloom filter is the answer when
    the join key isn't the layout key.

    Thresholds pinned here: injection compares the APPLICATION side's
    scan size against applicationSideScanSizeThreshold (default 10GB —
    far above any test fixture, hence 0 here) and the CREATION side
    against creationSideThreshold; the join must be a shuffle join
    (broadcast joins skip the filter — the broadcast hash set already
    prunes)."""
    fact = spark.range(0, 200_000).select(
        F.col("id").alias("fk"), (F.col("id") * 2).alias("val")
    )
    fact_path = str(tmp_path / "fact_bloom")
    fact.write.parquet(fact_path)
    dim = spark.range(0, 2000).select(
        F.col("id").alias("fk"), (F.col("id") % 5).alias("grp")
    )
    dim_path = str(tmp_path / "dim_bloom")
    dim.write.parquet(dim_path)

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        f = spark.read.parquet(fact_path)
        d = spark.read.parquet(dim_path).filter(F.col("grp") == 3)
        joined = f.join(d, "fk").groupBy("grp").agg(F.sum("val").alias("s"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        rows = joined.collect()
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
    expect = (
        spark.read.parquet(fact_path)
        .join(spark.read.parquet(dim_path).filter(F.col("grp") == 3).hint("broadcast"), "fk")
        .groupBy("grp")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, expect))


def test_streaming_cdc_apply_end_to_end(spark, tmp_path):
    """CDC stream -> foreachBatch MERGE -> transactional table: the
    final table equals the batch application of the change log, the
    in-batch insert-then-delete nets to absence, and cross-batch
    update/delete ordering holds. Also pins idempotent-effect replay:
    re-applying the last batch leaves the table unchanged."""
    import iot_etl_spark.warehouse.txlog as txlog
    from iot_etl_spark.warehouse.merge import apply_cdc_batch, start_cdc_merge_sink

    table = txlog.TxTable(str(tmp_path / "cdc_tbl"))
    table.overwrite(
        spark.createDataFrame([(1, "one"), (2, "two")], "k LONG, v STRING")
    )

    schema = "k LONG, v STRING, op STRING, seq LONG"
    src_dir = tmp_path / "cdc_src"
    src_dir.mkdir()

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).write.parquet(str(src_dir / name))

    # b0: update k=1, insert k=3, and k=9 insert-then-delete (nets out)
    write_batch(
        [(1, "ONE", "U", 10), (3, "three", "I", 11),
         (9, "ghost", "I", 12), (9, "ghost", "D", 13)],
        "b0",
    )
    stream = spark.readStream.schema(schema).parquet(str(src_dir) + "/*")
    q = start_cdc_merge_sink(
        stream, table, str(tmp_path / "ckpt"), on=["k"]
    )
    try:
        q.processAllAvailable()
        got = {r.k: r.v for r in table.read(spark).collect()}
        assert got == {1: "ONE", 2: "two", 3: "three"}
        # b1: delete k=2, update k=3
        write_batch([(2, "two", "D", 20), (3, "THREE", "U", 21)], "b1")
        q.processAllAvailable()
        got = {r.k: r.v for r in table.read(spark).collect()}
        assert got == {1: "ONE", 3: "THREE"}
    finally:
        q.stop()

    # idempotent-effect replay: re-apply b1 as a batch -> fixed point
    v_before = table.latest_version()
    apply_cdc_batch(
        spark, table,
        spark.createDataFrame([(2, "two", "D", 20), (3, "THREE", "U", 21)], schema),
        on=["k"],
    )
    got = {r.k: r.v for r in table.read(spark).collect()}
    assert got == {1: "ONE", 3: "THREE"}
    assert table.latest_version() >= v_before  # commits ran, state unchanged


def test_analyze_stats_feed_cbo_estimates(spark, tmp_path):
    """Optimizer-surface pin for ANALYZE + CBO: after ANALYZE TABLE ..
    COMPUTE STATISTICS FOR ALL COLUMNS, (a) the optimized plan carries
    the EXACT row count for a plain scan, and (b) with
    spark.sql.cbo.enabled a selective equality filter's estimated
    rowCount shrinks below the table rowCount (column-level NDV
    statistics driving selectivity), which is what lets stats-based
    join planning (reorder / broadcast decisions) fire at all."""
    name = "cbo_stats_pin_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        spark.range(0, 10000)
        .selectExpr("id", "id % 7 AS grp", "CAST(id % 97 AS DOUBLE) AS val")
        .write.saveAsTable(name)
    )
    try:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
        prev = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            scan_stats = (
                spark.table(name)._jdf.queryExecution().optimizedPlan().stats()
            )
            assert scan_stats.rowCount().isDefined()
            assert int(str(scan_stats.rowCount().get())) == 10000

            filt = spark.table(name).filter("grp = 3")
            fstats = filt._jdf.queryExecution().optimizedPlan().stats()
            assert fstats.rowCount().isDefined()
            est = int(str(fstats.rowCount().get()))
            # NDV(grp) = 7 -> selectivity ~1/7; anything well below the
            # table count proves column stats reached the estimator
            assert 0 < est < 5000, est
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
