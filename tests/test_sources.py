"""Batch source tests: JSONL ingest with dead-letter split."""

from __future__ import annotations
def test_load_jsonl_dlq_split(spark, tmp_path):
    """Batch JSONL ingest: good lines parse to typed columns, corrupt
    lines land verbatim in the DLQ, blank lines vanish, and the two
    sides partition the non-blank input exactly."""
    from pyspark.sql import types as T

    from iot_etl_spark.sources.tables import load_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "v": 1.5}\n'
        "\n"
        '{"id": 2, "name": "b"}\n'
        "this is not json\n"
        '{"id": 3, "name": "c", "v": -2.0}\n'
        '{"broken": \n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    good, dlq = load_jsonl(spark, str(p), schema)
    rows = {r.id: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].v == 1.5 and rows[3].v == -2.0
    assert rows[2].v is None  # missing field -> NULL, not DLQ
    bad = sorted(r.raw_line for r in dlq.collect())
    assert bad == ["this is not json", '{"broken": ']


def test_register_views_memoized_and_sf_switch(spark):
    """register_views is a no-op for an already-registered
    (session, sf_dir) pair — the SQL-surface queries call it per build
    and re-registration costs ~0.8 s of parquet footer reads — but a
    DIFFERENT sf_dir (temp-view names are shared) and an externally
    dropped view must both force a real re-registration."""
    from iot_etl_spark.sources import tables as tb

    tb.register_views(spark, "/root/testdata/sf0.001")
    n_small = spark.sql("SELECT COUNT(*) c FROM region").first().c
    key = (spark.sparkContext.applicationId, id(spark))
    assert key in tb._REGISTERED
    state = tb._REGISTERED[key]

    # memo hit: registered state unchanged (same tuple object is fine)
    tb.register_views(spark, "/root/testdata/sf0.001")
    assert tb._REGISTERED[key] == state

    # switching sf_dir re-registers under the same view names
    tb.register_views(spark, "/root/testdata/sf0.01")
    assert tb._REGISTERED[key] != state
    assert spark.sql("SELECT COUNT(*) c FROM lineitem").first().c > 0

    # an externally dropped view defeats the memo (stale-id(…) guard)
    spark.catalog.dropTempView("lineitem")
    tb.register_views(spark, "/root/testdata/sf0.01")
    assert spark.catalog.tableExists("lineitem")

    # ... and ANY other dropped view too — the probe covers every
    # STAR_TABLE via per-table tableExists catalog RPCs (ADVICE r11: a
    # lineitem-only probe missed a dropped 'events'; VERDICT r12: the
    # listTables variant launched a Spark job, ~544 ms per memo hit)
    spark.catalog.dropTempView("events")
    tb.register_views(spark, "/root/testdata/sf0.01")
    assert spark.catalog.tableExists("events")

    # force always re-registers
    tb.register_views(spark, "/root/testdata/sf0.001", force=True)
    assert spark.sql("SELECT COUNT(*) c FROM region").first().c == n_small
