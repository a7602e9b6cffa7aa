"""Warehouse lifecycle tests (SURVEY.md §2.11 / M6): materialize,
incremental refresh equivalence, retention partition-drop."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from iot_etl_spark.sources.tables import load_events
from iot_etl_spark.warehouse import (
    daily_agg,
    drop_partitions_older_than,
    hourly_agg,
    materialize_agg,
    read_agg,
    refresh_agg,
)
from tests.conftest import SF_DIR


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(v) for v in row)
        for row in df.select(*cols).collect()
    )


def test_refresh_after_new_data_matches_direct_query(spark):
    """The continuous-aggregate contract: stale table + incremental
    refresh over the dirty window == direct aggregate over all data
    (create_dwh_schema.sql:216-233 refresh policy semantics)."""
    tmp = tempfile.mkdtemp(prefix="iot_etl_wh_")
    try:
        events = load_events(spark, SF_DIR)
        # split on a date inside the data range: "old" landed first,
        # "late" arrives after the initial materialization
        split = events.select(
            F.date_add(F.min(F.to_date("ts")), 3).alias("d")
        ).first()["d"]
        old = events.filter(F.to_date("ts") < F.lit(split))
        path = os.path.join(tmp, "hourly")

        materialize_agg(old, path, bucket="hour")
        stale = _canon(read_agg(spark, path).drop("agg_date"))
        direct_old = _canon(hourly_agg(old).withColumn(
            "agg_date", F.to_date("bucket")).drop("agg_date"))
        assert stale == direct_old

        # new data lands (including rows that extend already-agged
        # dates is impossible here: split is a day boundary — refresh
        # from the split date covers every dirty bucket)
        refresh_agg(events, path, since=split, bucket="hour")
        refreshed = _canon(read_agg(spark, path).drop("agg_date"))
        direct_all = _canon(hourly_agg(events))
        assert refreshed == direct_all, "refreshed table != direct aggregate"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_refresh_rewrites_only_dirty_partitions(spark):
    """Refresh must not touch partitions older than the dirty window
    (Timescale refresh recomputes [now-start_offset, now-end_offset],
    not history)."""
    tmp = tempfile.mkdtemp(prefix="iot_etl_wh_")
    try:
        events = load_events(spark, SF_DIR)
        path = os.path.join(tmp, "hourly")
        materialize_agg(events, path, bucket="hour")
        parts = sorted(p for p in os.listdir(path) if p.startswith("agg_date="))
        assert len(parts) >= 3
        old_part = os.path.join(path, parts[0])
        mtime_before = max(
            os.path.getmtime(os.path.join(old_part, f)) for f in os.listdir(old_part)
        )
        since = parts[-1].split("=", 1)[1]  # refresh only the last date
        refresh_agg(events, path, since=since, bucket="hour")
        mtime_after = max(
            os.path.getmtime(os.path.join(old_part, f)) for f in os.listdir(old_part)
        )
        assert mtime_before == mtime_after, "refresh rewrote clean history"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_retention_drops_old_partitions_only(spark):
    """Retention policy (create_dwh_schema.sql:255-262): partitions
    strictly older than now - keep_days are dropped, the rest remain."""
    tmp = tempfile.mkdtemp(prefix="iot_etl_wh_")
    try:
        events = load_events(spark, SF_DIR)
        path = os.path.join(tmp, "daily")
        materialize_agg(events, path, bucket="day")
        parts = sorted(p for p in os.listdir(path) if p.startswith("agg_date="))
        assert len(parts) >= 3
        last = datetime.date.fromisoformat(parts[-1].split("=", 1)[1])
        keep = 2  # keep the trailing 2 days
        dropped = drop_partitions_older_than(path, keep_days=keep, now=last)
        remaining = sorted(p for p in os.listdir(path) if p.startswith("agg_date="))
        assert dropped and remaining
        assert set(dropped) | set(remaining) == set(parts)
        cutoff = last - datetime.timedelta(days=keep)
        for p in remaining:
            assert datetime.date.fromisoformat(p.split("=", 1)[1]) >= cutoff
        for p in dropped:
            assert datetime.date.fromisoformat(p.split("=", 1)[1]) < cutoff
        # table still reads cleanly after the drop
        assert read_agg(spark, path).count() > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_daily_agg_business_hours_split(spark):
    """fact_daily_agg's conditional averages: business-hours AVG only
    aggregates business-hours rows (NULL-else CASE semantics)."""
    events = load_events(spark, SF_DIR)
    row = daily_agg(events).filter(F.col("avg_value_business_hours").isNotNull()).first()
    assert row is not None
    assert row["avg_value_business_hours"] != row["avg_value_non_business_hours"]


def test_compact_partitions_preserves_data(spark):
    """Compaction rewrites partitions into bounded file counts without
    changing a single row (the small-file follow-up to the streaming
    upsert sink's per-group directories)."""
    import os as _os
    from iot_etl_spark.warehouse import compact_partitions

    tmp = tempfile.mkdtemp(prefix="iot_etl_cmp_")
    try:
        events = load_events(spark, SF_DIR)
        path = _os.path.join(tmp, "hourly")
        # fragment: write the agg 8-way so each partition has many files
        from iot_etl_spark.warehouse import hourly_agg
        agg = hourly_agg(events).withColumn("agg_date", F.to_date("bucket"))
        agg.repartition(8).write.partitionBy("agg_date").parquet(path)
        before = _canon(spark.read.parquet(path))
        n_before = sum(
            1 for _r, _d, fs in _os.walk(path) for f in fs if f.endswith(".parquet")
        )
        n_after = compact_partitions(spark, path)
        assert n_after < n_before
        parts = [p for p in _os.listdir(path) if p.startswith("agg_date=")]
        assert n_after == len(parts)  # one file per partition
        assert _canon(spark.read.parquet(path)) == before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_zero_shuffle_exchanges(spark):
    """Two tables bucketed by the join key with the same bucket count
    sort-merge-join with NO Exchange on either side (the write-time
    shuffle is the only shuffle, ever), and the result matches the
    plain join. Broadcast is disabled so the assertion can't be
    satisfied trivially."""
    import tempfile

    from pyspark.sql import functions as F

    from iot_etl_spark.sources.tables import load_table
    from iot_etl_spark.warehouse.bucketing import (
        colocated_join,
        count_shuffle_exchanges,
        write_bucketed,
    )

    tmp = tempfile.mkdtemp(prefix="iot_etl_bkt_")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    try:
        write_bucketed(orders, "t_bkt_o", f"{tmp}/o", ("o_orderkey",), 4,
                       sort_cols=("o_orderkey",))
        write_bucketed(lineitem, "t_bkt_l", f"{tmp}/l", ("l_orderkey",), 4,
                       sort_cols=("l_orderkey",))
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = colocated_join(
                spark, "t_bkt_o", "t_bkt_l",
                on=[F.col("o_orderkey") == F.col("l_orderkey")],
            )
            assert count_shuffle_exchanges(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()
            got = joined.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert got == expected
    finally:
        for t in ("t_bkt_o", "t_bkt_l"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def test_clustered_layout_files_have_disjoint_tight_key_ranges(spark):
    """write_clustered: parquet files within a partition cover
    disjoint, narrow cluster-key ranges (provable min/max skipping),
    vs an unclustered write where every file spans ~the full key
    domain. Verified from the physical parquet footers, not the plan."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from iot_etl_spark.sources.tables import load_table
    from iot_etl_spark.warehouse.layout import write_clustered

    tmp = tempfile.mkdtemp(prefix="iot_etl_layout_")
    try:
        events = load_table(spark, SF_DIR, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        write_clustered(
            events, f"{tmp}/clustered", ("event_date",), ("user_id",), n_ranges=4
        )
        events.repartition(4).write.mode("overwrite").partitionBy("event_date").parquet(
            f"{tmp}/naive"
        )

        def file_ranges(root):
            out = {}
            for f in glob.glob(f"{root}/event_date=*/*.parquet"):
                md = pq.ParquetFile(f).metadata
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    col = next(
                        md.row_group(rg).column(i)
                        for i in range(md.num_columns)
                        if md.row_group(rg).column(i).path_in_schema == "user_id"
                    )
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
                out.setdefault(os.path.dirname(f), []).append((min(mins), max(maxs)))
            return [r for ranges in out.values() for r in ranges], out

        clustered, clustered_by_dir = file_ranges(f"{tmp}/clustered")
        naive, _ = file_ranges(f"{tmp}/naive")
        domain = max(mx for _, mx in naive) - min(mn for mn, _ in naive)
        avg_clustered_span = sum(mx - mn for mn, mx in clustered) / len(clustered)
        avg_naive_span = sum(mx - mn for mn, mx in naive) / len(naive)
        # clustered files are narrow; naive files span ~the whole domain
        assert avg_clustered_span < 0.5 * avg_naive_span, (avg_clustered_span, avg_naive_span)
        assert avg_clustered_span < domain, (avg_clustered_span, domain)
        # range tasks own disjoint key ranges, so WITHIN a partition
        # dir the files never overlap (equal boundary keys may touch):
        # a point predicate reads one file per dir, skipping the rest
        for d, ranges in clustered_by_dir.items():
            spans = sorted(ranges)
            overlaps = sum(
                1 for (a_mn, a_mx), (b_mn, _) in zip(spans, spans[1:]) if b_mn < a_mx
            )
            assert overlaps == 0, (d, spans)
        # round-trip integrity
        assert spark.read.parquet(f"{tmp}/clustered").count() == events.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zorder_layout_bounds_both_dimensions(spark):
    """cluster_by_zorder: each file's bounding box is narrow in BOTH
    cluster dimensions (a predicate on either column skips files),
    while single-key range clustering leaves the other dimension
    spanning ~the whole domain. Verified from parquet footers."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from iot_etl_spark.sources.tables import load_table
    from iot_etl_spark.warehouse.layout import cluster_by_range, cluster_by_zorder

    tmp = tempfile.mkdtemp(prefix="iot_etl_zorder_")
    try:
        ev = load_table(spark, SF_DIR, "events").withColumn(
            "ts_epoch", F.unix_timestamp("ts").cast("long")
        )
        cluster_by_zorder(ev, "user_id", "ts_epoch", bits=8, n_ranges=8).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/z")
        cluster_by_range(ev, ("ts_epoch",), 8).write.mode("overwrite").parquet(
            f"{tmp}/t"
        )

        def avg_norm_span(root, col):
            spans = []
            for f in glob.glob(f"{root}/*.parquet"):
                md = pq.ParquetFile(f).metadata
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    c = next(
                        md.row_group(rg).column(i)
                        for i in range(md.num_columns)
                        if md.row_group(rg).column(i).path_in_schema == col
                    )
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
                spans.append((min(mins), max(maxs)))
            domain = max(mx for _, mx in spans) - min(mn for mn, _ in spans)
            return sum(mx - mn for mn, mx in spans) / len(spans) / max(1, domain)

        # z-order: both dims individually bounded (measured ~0.58/~0.38)
        assert avg_norm_span(f"{tmp}/z", "user_id") < 0.75
        assert avg_norm_span(f"{tmp}/z", "ts_epoch") < 0.75
        # single-key ts clustering: its own dim tight, the other ~full
        assert avg_norm_span(f"{tmp}/t", "user_id") > 0.9
        assert avg_norm_span(f"{tmp}/t", "ts_epoch") < 0.3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_schema_evolution_widening_append(spark):
    """A batch with a new column appends without rewriting old files;
    the merged read NULLs the column for pre-widening rows, and
    projection/pushdown still prune at the scan."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from iot_etl_spark.warehouse.lifecycle import append_evolved, read_evolved

    tmp = tempfile.mkdtemp(prefix="iot_etl_evolve_")
    try:
        v1 = spark.createDataFrame(
            [(1, 21.5), (2, 22.0)], "event_id LONG, value DOUBLE"
        )
        v2 = spark.createDataFrame(
            [(3, 23.0, 85)], "event_id LONG, value DOUBLE, quality_score INT"
        )
        append_evolved(v1, f"{tmp}/t")
        append_evolved(v2, f"{tmp}/t")
        out = read_evolved(spark, f"{tmp}/t")
        assert set(out.columns) == {"event_id", "value", "quality_score"}
        rows = {r.event_id: r for r in out.collect()}
        assert rows[1].quality_score is None and rows[3].quality_score == 85
        # old column predicates still push down on the merged view
        plan = out.filter(F.col("event_id") == 3)._jdf.queryExecution().toString()
        assert "PushedFilters: [IsNotNull(event_id), EqualTo(event_id,3)" in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_snapshot_diff_classifies_rows(spark):
    """snapshot_diff: added/removed/changed/unchanged per key, NULL
    value columns compared safely through the struct hash."""
    from iot_etl_spark.warehouse.lifecycle import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "id LONG, name STRING, score DOUBLE",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "b", 20.0),        # changed (NULL -> value)
         (4, "D", 40.0),        # changed (name case)
         (5, "e", 50.0)],       # added; id 3 removed
        "id LONG, name STRING, score DOUBLE",
    )
    out = {r.id: r.diff_status for r in snapshot_diff(old, new, ("id",)).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_route_to_agg_serves_mv_when_fresh(spark, tmp_path):
    """Materialized-view routing: a fresh MV answers the hourly query
    (plan scans the MV path, values equal direct compute); a stale MV
    (newer raw events than its last bucket) falls back to raw."""
    from iot_etl_spark.sources.tables import load_events
    from iot_etl_spark.warehouse.lifecycle import (
        hourly_agg,
        materialize_agg,
        route_to_agg,
    )

    ev = load_events(spark, "/root/testdata/sf0.001")
    mv_path = str(tmp_path / "hourly_mv")
    materialize_agg(ev, mv_path, bucket="hour")

    routed = route_to_agg(spark, ev, mv_path, bucket="hour")
    plan = routed._jdf.queryExecution().executedPlan().toString()
    # a routed query is a pure scan+project of the MV — no aggregation
    assert "HashAggregate" not in plan, "fresh MV was not routed to"
    direct = hourly_agg(ev)
    assert routed.exceptAll(direct).count() == 0
    assert direct.exceptAll(routed).count() == 0

    # stale: raw now extends past the MV's last bucket -> fall back
    import pyspark.sql.functions as F

    later = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 400 DAYS"))
    fresh_plus = ev.unionByName(later)
    fallback = route_to_agg(spark, fresh_plus, mv_path, bucket="hour")
    plan2 = fallback._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan2, "stale MV must not serve"

    # no MV at all -> raw compute
    none = route_to_agg(spark, ev, str(tmp_path / "missing"), bucket="hour")
    assert "FileScan" in none._jdf.queryExecution().executedPlan().toString()


def test_delete_keys_rewrites_only_containing_partitions(spark, tmp_path):
    """GDPR erasure: keyed rows vanish, clean partitions are never
    touched (footer-stat pruning proven by file mtimes), accounting is
    exact, and absent keys are a no-op."""
    import os
    import pyspark.sql.functions as F
    from iot_etl_spark.warehouse.lifecycle import delete_keys

    path = str(tmp_path / "facts")
    # device 1 only in date A; device 99 only in date C; dates sorted
    # by device so row-group stats are tight
    rows = [
        (1, "2024-01-01", 10.0), (2, "2024-01-01", 11.0),
        (2, "2024-01-02", 12.0), (3, "2024-01-02", 13.0),
        (99, "2024-01-03", 14.0), (3, "2024-01-03", 15.0),
    ]
    df = spark.createDataFrame(rows, "device_id long, agg_date string, value double")
    (df.repartition(1).sortWithinPartitions("agg_date", "device_id")
       .write.partitionBy("agg_date").mode("overwrite").parquet(path))

    def mtimes():
        out = {}
        for d in os.listdir(path):
            if d.startswith("agg_date="):
                full = os.path.join(path, d)
                out[d] = max(
                    os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full) if f.endswith(".parquet")
                )
        return out

    before = mtimes()
    res = delete_keys(spark, path, "device_id", [1, 99])
    assert res["rows_deleted"] == 2
    assert sorted(res["partitions_rewritten"]) == [
        "agg_date=2024-01-01", "agg_date=2024-01-03",
    ]
    assert res["partitions_scanned"] == 3
    # untouched partition keeps its exact files
    after = mtimes()
    assert after["agg_date=2024-01-02"] == before["agg_date=2024-01-02"]
    # data correctness: keys gone, everything else intact
    back = spark.read.parquet(path)
    assert back.filter(F.col("device_id").isin(1, 99)).count() == 0
    assert back.count() == 4
    # absent key -> zero rewrites
    res2 = delete_keys(spark, path, "device_id", [12345])
    assert res2["partitions_rewritten"] == [] and res2["rows_deleted"] == 0


def test_delete_keys_preserves_null_keyed_rows(spark, tmp_path):
    """~isin() is NULL for NULL keys and a NULL predicate drops the
    row — the erase filter must keep unkeyed rows explicitly."""
    import pyspark.sql.functions as F
    from iot_etl_spark.warehouse.lifecycle import delete_keys

    path = str(tmp_path / "facts")
    rows = [(1, "2024-01-01", 1.0), (None, "2024-01-01", 2.0),
            (3, "2024-01-01", 3.0)]
    df = spark.createDataFrame(rows, "device_id long, agg_date string, value double")
    df.write.partitionBy("agg_date").mode("overwrite").parquet(path)
    res = delete_keys(spark, path, "device_id", [1])
    assert res["rows_deleted"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert back.filter(F.col("device_id").isNull()).count() == 1


# ------------------------------------------------- transaction log
def _tx_rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_txlog_append_overwrite_time_travel(spark, tmp_path):
    """Commits are versioned; time travel reads any historical
    snapshot; overwrite logically removes but never rewrites old
    files."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    v0 = t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"))
    v1 = t.append(spark.createDataFrame([(3, "c")], "k INT, v STRING"))
    v2 = t.overwrite(spark.createDataFrame([(9, "z")], "k INT, v STRING"))
    assert (v0, v1, v2) == (0, 1, 2)
    assert _tx_rows(t.read(spark)) == [(9, "z")]
    assert _tx_rows(t.read(spark, version=0)) == [(1, "a"), (2, "b")]
    assert _tx_rows(t.read(spark, version=1)) == [(1, "a"), (2, "b"), (3, "c")]


def test_txlog_snapshot_isolation(spark, tmp_path):
    """A resolved reader is pinned to its snapshot: commits that land
    after the read never change what it sees."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    reader = t.read(spark)  # resolves the v0 file list NOW
    t.overwrite(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    assert _tx_rows(reader) == [(1, "a")]  # isolation
    assert _tx_rows(t.read(spark)) == [(2, "b")]  # fresh read sees v1


def test_txlog_concurrent_commit_conflict(spark, tmp_path):
    """Two writers racing for the same version: exactly one wins; the
    loser gets ConcurrentCommitError and its staged files stay
    invisible (vacuum sweeps them)."""
    import pytest
    from iot_etl_spark.warehouse.txlog import ConcurrentCommitError, TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    # simulate the race: both writers plan version 1 from the same
    # read snapshot; the second O_EXCL create must lose
    staged = t._stage(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    planned = t.latest_version() + 1
    t._commit({"op": "append", "added": ["other.parquet"], "removed": []}, planned)
    with pytest.raises(ConcurrentCommitError):
        t._commit({"op": "append", "added": staged, "removed": []}, planned)
    # loser's files never became visible
    visible = {f.split("/")[-1] for f in t.snapshot_files()}
    assert not (set(staged) & visible)
    # the append() API retries a lost race at the new head and wins
    v = t.append(spark.createDataFrame([(3, "c")], "k INT, v STRING"))
    assert v == planned + 1


def test_txlog_vacuum_decouples_physical_deletion(spark, tmp_path):
    """Vacuum deletes only files referenced by no retained version;
    the latest snapshot is untouched, older time travel stops."""
    import pytest
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    t.overwrite(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    before = _tx_rows(t.read(spark, version=0))  # old snapshot readable pre-vacuum
    assert before == [(1, "a")]
    # retention_seconds=0: the explicit no-writers-in-flight override
    # (the 24h default would keep these seconds-old files)
    deleted = t.vacuum(retain_last=1, retention_seconds=0)
    assert deleted  # the overwritten v0 file went away physically
    assert _tx_rows(t.read(spark)) == [(2, "b")]  # latest intact
    with pytest.raises(Exception):
        t.read(spark, version=0).collect()  # time travel past horizon


def test_txlog_streaming_sink_exactly_once(spark, tmp_path):
    """The foreachBatch -> TxTable.append_batch sink is exactly-once:
    a full replay (fresh checkpoint, same source) re-delivers every
    micro-batch and ALL of them are recognized by batch id and
    skipped; a genuinely new batch still lands."""
    from iot_etl_spark.streaming.pipeline import read_stream_source, start_txlog_sink
    from iot_etl_spark.warehouse.txlog import TxTable
    from tests.conftest import SF_DIR

    t = TxTable(str(tmp_path / "tx"))
    src = read_stream_source(spark, "parquet", path=f"{SF_DIR}/events.parquet")
    proj = src.select("event_id", "event_type", "value")
    q = start_txlog_sink(proj, t, str(tmp_path / "ckpt0"), trigger_seconds=1)
    q.processAllAvailable()
    q.stop()
    n1 = t.read(spark).count()
    assert n1 > 0
    # replay: fresh checkpoint re-delivers batch 0 with the same id
    q = start_txlog_sink(proj, t, str(tmp_path / "ckpt1"), trigger_seconds=1)
    q.processAllAvailable()
    q.stop()
    assert t.read(spark).count() == n1, "replayed batch was appended twice"
    # direct re-delivery of the same (df, batch_id) is also a no-op
    assert t.append_batch(spark.range(3).toDF("event_id"), 0) is None
    # a new batch id commits
    v = t.append_batch(
        spark.createDataFrame([(999999, "x", 1.0)], "event_id LONG, event_type STRING, value DOUBLE"),
        batch_id=777,
    )
    assert v is not None
    assert t.read(spark).count() == n1 + 1


def test_txlog_change_data_feed(spark, tmp_path):
    """read_changes returns exactly the rows appended after the given
    version — the incremental-refresh primitive: consuming (v0, v2]
    plus the v0 snapshot reconstructs the table."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    v0 = t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    t.append(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    t.append(spark.createDataFrame([(3, "c")], "k INT, v STRING"))
    delta = _tx_rows(t.read_changes(spark, since_version=v0))
    assert delta == [(2, "b"), (3, "c")]
    # bounded range
    assert _tx_rows(t.read_changes(spark, since_version=v0, to_version=v0 + 1)) == [
        (2, "b")
    ]
    # empty range -> empty frame with the table schema
    empty = t.read_changes(spark, since_version=2)
    assert empty.count() == 0 and set(empty.columns) == {"k", "v"}


def test_txlog_optimize_compacts_in_one_commit(spark, tmp_path):
    """OPTIMIZE rewrites the snapshot into one file via a single
    atomic commit; values unchanged; pre-optimize time travel still
    reads the small files until vacuum."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    for i in range(3):
        t.append(spark.createDataFrame([(i, str(i))], "k INT, v STRING"))
    assert len(t.snapshot_files()) >= 3
    before = _tx_rows(t.read(spark))
    v = t.optimize(spark, target_files=1)
    assert v == 3
    assert len(t.snapshot_files()) == 1
    assert _tx_rows(t.read(spark)) == before
    assert _tx_rows(t.read(spark, version=2)) == before  # time travel intact
    assert t.optimize(spark, target_files=1) is None  # already compact


def test_txlog_schema_enforcement(spark, tmp_path):
    """Appends with a drifted schema fail at commit time; widening is
    opt-in and merges on read (old rows NULL the new column);
    overwrite may redefine the schema."""
    import pytest
    from iot_etl_spark.warehouse.txlog import SchemaMismatchError, TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    # type drift rejected
    with pytest.raises(SchemaMismatchError):
        t.append(spark.createDataFrame([("x", "b")], "k STRING, v STRING"))
    # column add rejected unless opted in
    with pytest.raises(SchemaMismatchError):
        t.append(spark.createDataFrame([(2, "b", 1.5)], "k INT, v STRING, w DOUBLE"))
    t.append(
        spark.createDataFrame([(2, "b", 1.5)], "k INT, v STRING, w DOUBLE"),
        allow_evolution=True,
    )
    rows = {r.k: (r.v, r.w) for r in t.read(spark).collect()}
    assert rows == {1: ("a", None), 2: ("b", 1.5)}
    # overwrite redefines
    t.overwrite(spark.createDataFrame([("z",)], "only STRING"))
    assert t.table_schema() == {"only": "string"}


def test_txlog_vacuum_retention_protects_inflight_staging(spark, tmp_path):
    """ADVICE r4: vacuum must not delete a concurrent writer's staged
    (not-yet-committed) files — the default retention age-gates them.
    Simulated by staging without committing: a default vacuum keeps
    the fresh files, the writer's commit then lands intact; only a
    later zero-retention maintenance vacuum may sweep true orphans."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    staged = t._stage(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    deleted = t.vacuum(retain_last=1)  # default 24h retention
    assert not (set(staged) & set(deleted)), "vacuum ate an in-flight write"
    # the in-flight writer commits; its files must all exist
    v = t._commit({"op": "append", "added": staged, "removed": [],
                   "schema": t.table_schema()})
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]
    # retain_last=0 is clamped: the live snapshot is never deleted
    assert t.vacuum(retain_last=0, retention_seconds=0) == []
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]


def test_txlog_append_retry_recheck_schema(spark, tmp_path):
    """ADVICE r4: an append that loses its commit race to an overwrite
    that REDEFINED the table schema must raise on retry, not stamp its
    now-conflicting schema back onto the table."""
    import pytest
    from iot_etl_spark.warehouse.txlog import SchemaMismatchError, TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))

    # make the first _commit lose exactly once, with an overwrite that
    # changes the schema landing in between (the race interleaving)
    real_commit = t._commit
    state = {"raced": False}

    def racing_commit(entry, version=None):
        if not state["raced"] and entry.get("op") == "append" and entry.get("schema"):
            state["raced"] = True
            t.overwrite(spark.createDataFrame([("z",)], "only STRING"))
        return real_commit(entry, version)

    t._commit = racing_commit
    with pytest.raises(SchemaMismatchError):
        t.append(spark.createDataFrame([(2, "b")], "k INT, v STRING"))
    t._commit = real_commit
    assert t.table_schema() == {"only": "string"}  # overwrite's schema intact
    assert [tuple(r) for r in t.read(spark).collect()] == [("z",)]


def test_txlog_batch_ledger_scoping(spark, tmp_path):
    """ADVICE r4: batch ids dedupe WITHIN a ledger scope. Same
    (scope, id) is a recognized replay; the same id under a different
    scope (a new checkpoint lineage with different batch boundaries)
    must land as new data, not be silently skipped."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    df = spark.createDataFrame([(1,)], "k INT")
    assert t.append_batch(df, 0, ledger_id="ckpt-A") is not None
    assert t.append_batch(df, 0, ledger_id="ckpt-A") is None  # replay
    assert t.append_batch(df, 0, ledger_id="ckpt-B") is not None  # new lineage
    assert t.append_batch(df, 0) is not None  # unscoped is its own ledger
    assert t.append_batch(df, 0) is None
    assert t.read(spark).count() == 3


def test_bucketed_layout_cross_session_reuse_no_rewrite(spark):
    """VERDICT r5 item 3: with unchanged inputs, a SECOND session must
    re-register the existing bucket tables (no re-shuffle, no rewrite
    — the write is paid once at ingest) and the stale-tag eviction
    sweep must remove nothing. Pinned by bucket-file mtimes: byte-for-
    byte the same files serve both sessions, and results agree."""
    import glob
    import os

    from iot_etl_spark.plans.registry import QUERIES

    q = QUERIES["bucketed_join_revenue"]
    first = {tuple(sorted(r.asDict().items())) for r in q(spark, SF_DIR).collect()}
    roots = sorted(glob.glob("/tmp/iot_etl_bucketed_*"))
    assert roots, "bucket layout was not materialized"
    ready = [r for r in roots if os.path.exists(os.path.join(r, "_BUCKETS_READY"))]
    assert ready, "no completed bucket layout on disk"

    def snapshot():
        out = {}
        for root in ready:
            for f in glob.glob(os.path.join(root, "**", "*"), recursive=True):
                if os.path.isfile(f):
                    out[f] = os.stat(f).st_mtime_ns
        return out

    before = snapshot()
    # fresh catalog, same JVM: the external bucket tables of session 1
    # are gone from the catalog and must be re-claimed from disk
    s2 = spark.newSession()
    second = {tuple(sorted(r.asDict().items())) for r in q(s2, SF_DIR).collect()}
    assert second == first
    after = snapshot()
    assert after == before, "second session rewrote or evicted live bucket files"


def test_compact_leaf_partitions_on_upsert_sink_layout(spark, tmp_path):
    """VERDICT r5 item 6: the streaming upsert sink's nested
    (window_key=..., event_type=...) layout accumulates tiny files;
    compact_leaf_partitions rewrites every leaf to one file with the
    stage/swap crash-safety, and reads are identical after."""
    import glob
    import os

    from iot_etl_spark.warehouse.lifecycle import compact_leaf_partitions

    path = str(tmp_path / "serve")
    rows = [
        ("20240101_100000", et, i, float(i))
        for et in ("view", "click")
        for i in range(4)
    ] + [("20240101_110000", "view", 9, 9.0)]
    df = spark.createDataFrame(
        rows, "window_key STRING, event_type STRING, n LONG, v DOUBLE"
    )
    # two appends -> >=2 files per touched leaf (the sink's many-
    # micro-batch shape)
    for _ in range(2):
        df.write.mode("append").partitionBy("window_key", "event_type").parquet(path)

    def snap():
        out = spark.read.parquet(path)
        return sorted(tuple(r) for r in out.collect())

    before = snap()
    leaves = {
        os.path.dirname(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }
    n_before = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    assert n_before > len(leaves), "test premise: multiple files per leaf"
    n_after = compact_leaf_partitions(spark, path)
    assert n_after == len(leaves), "each leaf must compact to one file"
    assert snap() == before, "compaction changed the data"
    # idempotent: already-compacted leaves are skipped
    assert compact_leaf_partitions(spark, path) == n_after


def test_compact_leaf_partitions_ignores_orphaned_staging(spark, tmp_path):
    """Crash-safety of the leaf compactor: a dot-prefixed staging dir
    orphaned by a mid-job crash is invisible to partition discovery
    (reads unchanged) and is not treated as a leaf by a later
    compaction run."""
    import os

    from iot_etl_spark.warehouse.lifecycle import compact_leaf_partitions

    path = str(tmp_path / "serve")
    df = spark.createDataFrame(
        [("20240101_100000", "view", i, float(i)) for i in range(4)],
        "window_key STRING, event_type STRING, n LONG, v DOUBLE",
    )
    for _ in range(2):
        df.write.mode("append").partitionBy("window_key", "event_type").parquet(path)

    def snap():
        return sorted(tuple(r) for r in spark.read.parquet(path).collect())

    before = snap()
    # simulate a crashed compaction: orphaned staging next to the leaf
    orphan = os.path.join(
        path, "window_key=20240101_100000", "._compact_deadbeef"
    )
    df.limit(1).select("n", "v").write.parquet(orphan)
    assert snap() == before, "orphaned ._compact_ dir leaked into reads"
    compact_leaf_partitions(spark, path)
    assert snap() == before
    assert os.path.isdir(orphan), "compactor must not treat staging as a leaf"


def test_cdf_driven_incremental_refresh(spark, tmp_path):
    """Compose the two lifecycle primitives end to end (the Delta/
    Iceberg incremental-MV pattern): the txlog CHANGE DATA FEED tells
    the refresh job its dirty window — read_changes since the last
    refreshed version yields exactly the late-arriving rows, their
    min date snaps the window, and refresh_agg over that window makes
    the aggregate equal a full recompute. No full-history rescan: the
    CDF read touches only the new files."""
    import os

    from iot_etl_spark.sources.tables import load_table
    from iot_etl_spark.warehouse.lifecycle import (
        hourly_agg,
        materialize_agg,
        read_agg,
        refresh_agg,
    )
    from iot_etl_spark.warehouse.txlog import TxTable

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    split = events.select(
        F.date_add(F.min(F.to_date("ts")), 3).alias("d")
    ).first()["d"]
    old = events.filter(F.to_date("ts") < F.lit(split))
    late = events.filter(F.to_date("ts") >= F.lit(split))

    t = TxTable(str(tmp_path / "events_tx"))
    v0 = t.append(old)
    agg_path = str(tmp_path / "hourly")
    materialize_agg(t.read(spark), agg_path, bucket="hour")

    t.append(late)  # late-arriving facts land as a new commit

    # the refresh job derives its dirty window FROM THE LOG, not from
    # a rescan: changes since the version it last aggregated
    delta = t.read_changes(spark, since_version=v0)
    assert delta.count() == late.count()
    dirty_start = delta.select(F.min(F.to_date("ts"))).first()[0]
    refresh_agg(t.read(spark), agg_path, since=dirty_start, bucket="hour")

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(r) for r in df.select(cols).collect())

    assert canon(read_agg(spark, agg_path).drop("agg_date")) == canon(
        hourly_agg(t.read(spark))
    )


def test_txlog_stats_pruning_skips_disjoint_files(spark, tmp_path):
    """Delta-style data skipping on the transaction log: every commit
    stamps per-file column [min, max] from the parquet footers, and
    read_pruned plans only the files whose stats intersect the
    predicate range — result equality with the full-scan filter, file
    count strictly smaller, and missing stats fail OPEN (read)."""
    import iot_etl_spark.warehouse.txlog as txlog

    t = txlog.TxTable(str(tmp_path / "skiptbl"))
    # three appends with disjoint k ranges -> three stats-bearing files
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 50).selectExpr(
                "id AS k", "CAST(id * 2 AS DOUBLE) AS v",
                "concat('u', CAST(id AS STRING)) AS s",
            ).coalesce(1)
        )
    stats = t.snapshot_file_stats()
    assert len(stats) == 3
    assert all("k" in s and "v" in s and "s" in s for s in stats.values())

    pruned = t.read_pruned(spark, {"k": (120, 130)})
    n_in = pruned.inputFiles()
    assert len(n_in) == 1, n_in  # only the [100,150) file survives
    got = sorted(r.k for r in pruned.filter("k BETWEEN 120 AND 130").collect())
    full = sorted(
        r.k for r in t.read(spark).filter("k BETWEEN 120 AND 130").collect()
    )
    assert got == full == list(range(120, 131))

    # half-open range + string column stats
    assert len(t.read_pruned(spark, {"k": (None, 40)}).inputFiles()) == 1
    assert len(t.read_pruned(spark, {"k": (500, None)}).inputFiles()) == 0
    # disjoint range -> empty frame with intact schema
    empty = t.read_pruned(spark, {"k": (500, None)})
    assert empty.columns == t.read(spark).columns and empty.count() == 0

    # optimize rewrites carry fresh stats; pruning still correct
    t.optimize(spark, target_files=1)
    assert len(t.read_pruned(spark, {"k": (120, 130)}).inputFiles()) == 1
    # un-stat'd column in the predicate -> fail open (all files read)
    assert t.read_pruned(spark, {"nosuchcol": (0, 1)}).count() == 150


def test_txlog_check_constraints_enforced_on_writes(spark, tmp_path):
    """Delta-style CHECK constraints: validated against existing data
    at ADD time, enforced on every write path (append, append_batch,
    overwrite) against the STAGED files, with Delta NULL semantics
    (only FALSE violates). A rejected write leaves no new data, no new
    version, and no orphan files visible to any snapshot."""
    import pytest

    from iot_etl_spark.warehouse.txlog import ConstraintViolationError, TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"))
    t.add_constraint(spark, "k_positive", "k > 0")
    assert t.constraints() == {"k_positive": "k > 0"}

    # adding a constraint the existing data violates must fail
    with pytest.raises(ConstraintViolationError):
        t.add_constraint(spark, "k_big", "k > 5")
    assert "k_big" not in t.constraints()

    # append of a violating row is rejected pre-commit
    head = t.latest_version()
    with pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(-1, "x")], "k INT, v STRING"))
    assert t.latest_version() == head
    assert sorted(_tx_rows(t.read(spark))) == [(1, "a"), (2, "b")]
    # the rejected write's staged files were cleaned up, not orphaned
    import os

    live = {os.path.basename(f) for f in t.snapshot_files()}
    assert {f for f in os.listdir(t.data_dir) if f.endswith(".parquet")} == live

    # NULL passes (Delta semantics): only explicit FALSE violates
    t.append(spark.createDataFrame([(None, "n")], "k INT, v STRING"))

    # overwrite and append_batch enforce too
    with pytest.raises(ConstraintViolationError):
        t.overwrite(spark.createDataFrame([(0, "z")], "k INT, v STRING"))
    with pytest.raises(ConstraintViolationError):
        t.append_batch(
            spark.createDataFrame([(-7, "s")], "k INT, v STRING"), batch_id=0
        )
    # the rejected batch did NOT claim its ledger slot
    assert t.committed_batch_ids() == set()

    # drop, then the same write succeeds; constraints survive overwrite
    t.drop_constraint("k_positive")
    assert t.constraints() == {}
    t.add_constraint(spark, "v_nonempty", "length(v) > 0")
    t.overwrite(spark.createDataFrame([(0, "z")], "k INT, v STRING"))
    assert t.constraints() == {"v_nonempty": "length(v) > 0"}
    with pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(1, "")], "k INT, v STRING"))


def test_txlog_history_summarizes_commits(spark, tmp_path):
    """DESCRIBE HISTORY: one summary row per commit, covering data,
    streaming and constraint-metadata operations."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.createDataFrame([(1, "a")], "k INT, v STRING"))
    t.append_batch(
        spark.createDataFrame([(2, "b")], "k INT, v STRING"),
        batch_id=7, ledger_id="led",
    )
    t.add_constraint(spark, "k_pos", "k > 0")
    t.overwrite(spark.createDataFrame([(3, "c")], "k INT, v STRING"))
    h = t.history()
    assert [e["version"] for e in h] == [0, 1, 2, 3]
    assert [e["op"] for e in h] == ["append", "append", "add_constraint", "overwrite"]
    assert h[1]["batch_id"] == 7 and h[1]["ledger_id"] == "led"
    assert h[2]["constraint"] == "k_pos" and h[2]["n_added"] == 0
    # overwrite logically removes every file the two appends added
    assert h[3]["n_removed"] == h[0]["n_added"] + h[1]["n_added"] > 0


def test_txlog_bloom_point_lookup_prunes_files(spark, tmp_path):
    """Per-file Bloom index: a point lookup on a high-cardinality key
    plans only the file(s) whose bitset might contain it (min/max
    stats cannot prune here — every append spans a disjoint id SET,
    not a disjoint range); no false negatives; pre-index files fail
    open; results equal the full-scan filter."""
    from iot_etl_spark.warehouse.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    # file committed BEFORE the index exists -> always read (fail open)
    t.append(
        spark.createDataFrame(
            [(f"legacy-{i}", i) for i in range(50)], "uid STRING, v INT"
        ).coalesce(1)
    )
    t.set_bloom_columns(["uid"])
    for gen in range(3):
        rows = [(f"u{gen}-{i}", gen * 1000 + i) for i in range(200)]
        t.append(spark.createDataFrame(rows, "uid STRING, v INT").coalesce(1))

    blooms = t.snapshot_file_blooms()
    indexed = [n for n, b in blooms.items() if "uid" in b]
    unindexed = [n for n, b in blooms.items() if "uid" not in b]
    assert len(indexed) == 3 and len(unindexed) == 1

    # point lookup: the legacy file (fail-open) + exactly the one
    # indexed file holding the key survive planning
    import os

    target = "u1-137"
    keep = []
    from iot_etl_spark.warehouse.txlog import _bloom_maybe_contains

    for n, b in blooms.items():
        if "uid" not in b or _bloom_maybe_contains(b["uid"], target):
            keep.append(n)
    assert len(keep) <= 2  # legacy + 1 (false positives would add more)

    got = t.read_point(spark, "uid", target).filter(f"uid = '{target}'")
    full = t.read(spark).filter(f"uid = '{target}'")
    assert [(r.uid, r.v) for r in got.collect()] == [(target, 1137)]
    assert got.collect() == full.collect()

    # no false negatives across every committed key
    for gen in range(3):
        probe = f"u{gen}-0"
        assert t.read_point(spark, "uid", probe).filter(
            f"uid = '{probe}'"
        ).count() == 1

    # absent key: bloom planning may drop every indexed file
    assert t.read_point(spark, "uid", "nope").filter("uid = 'nope'").count() == 0

    # OPTIMIZE rewrites with the index: the legacy rows become indexed
    t.optimize(spark, target_files=1)
    blooms2 = t.snapshot_file_blooms()
    assert all("uid" in b for b in blooms2.values())
    got2 = t.read_point(spark, "uid", "legacy-3").filter("uid = 'legacy-3'")
    assert got2.count() == 1


def test_append_with_quarantine_routes_violations(spark, tmp_path):
    """CHECK-violation quarantine: valid rows commit to the main
    table, violating rows land in the DLQ table tagged with every
    failed rule name; NULL predicates pass (Delta CHECK semantics);
    with no constraints the quarantine table stays untouched."""
    import iot_etl_spark.warehouse.txlog as txlog

    t = txlog.TxTable(str(tmp_path / "main"))
    q = txlog.TxTable(str(tmp_path / "dlq"))
    t.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k LONG, v DOUBLE")
    )
    t.add_constraint(spark, "v_positive", "v > 0")
    t.add_constraint(spark, "k_small", "k < 100")

    batch = spark.createDataFrame(
        [
            (3, 30.0),        # clean
            (4, -1.0),        # violates v_positive
            (400, -2.0),      # violates both
            (5, None),        # NULL passes (CHECK semantics)
        ],
        "k LONG, v DOUBLE",
    )
    v, qv = t.append_with_quarantine(batch, q)
    assert v is not None and qv is not None
    main_rows = {r.k for r in t.read(spark).collect()}
    assert main_rows == {1, 2, 3, 5}
    dlq = {r.k: r.violated for r in q.read(spark).collect()}
    assert dlq == {4: "v_positive", 400: "k_small,v_positive"}

    # no constraints -> plain append, no quarantine commit
    t2 = txlog.TxTable(str(tmp_path / "main2"))
    q2 = txlog.TxTable(str(tmp_path / "dlq2"))
    t2.overwrite(spark.createDataFrame([(1, 1.0)], "k LONG, v DOUBLE"))
    v2, qv2 = t2.append_with_quarantine(
        spark.createDataFrame([(2, -5.0)], "k LONG, v DOUBLE"), q2
    )
    assert qv2 is None and {r.k for r in t2.read(spark).collect()} == {1, 2}
    assert q2.latest_version() is None
