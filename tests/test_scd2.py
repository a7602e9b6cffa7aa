"""SCD2 dimension merge: bootstrap, incremental merge, run-length
compression of unchanged updates, idempotent replay, point-in-time
reads (warehouse/scd2.py)."""

from __future__ import annotations

from iot_etl_spark.warehouse.scd2 import scd2_merge, version_as_of

SCHEMA = "device_id LONG, location STRING, firmware STRING, effective_us LONG"


def _hist(df):
    rows = [
        (r.device_id, r.location, r.firmware, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in df.collect()
    ]
    return sorted(rows, key=lambda t: (t[0], t[3]))


def test_bootstrap_and_incremental_merge(spark):
    b1 = spark.createDataFrame(
        [(1, "lab", "v1", 100), (2, "roof", "v1", 100)], SCHEMA
    )
    dim = scd2_merge(None, b1, key="device_id", attrs=["location", "firmware"])
    assert _hist(dim) == [
        (1, "lab", "v1", 100, None, True),
        (2, "roof", "v1", 100, None, True),
    ]

    # device 1 moves at t=200; device 2 unchanged (update arrives, but
    # attributes identical -> version extended, no new row)
    b2 = spark.createDataFrame(
        [(1, "cellar", "v1", 200), (2, "roof", "v1", 200)], SCHEMA
    )
    dim2 = scd2_merge(dim, b2, key="device_id", attrs=["location", "firmware"])
    assert _hist(dim2) == [
        (1, "lab", "v1", 100, 200, False),
        (1, "cellar", "v1", 200, None, True),
        (2, "roof", "v1", 100, None, True),
    ]


def test_replay_is_idempotent(spark):
    b1 = spark.createDataFrame([(1, "lab", "v1", 100), (1, "roof", "v2", 300)], SCHEMA)
    dim = scd2_merge(None, b1, key="device_id", attrs=["location", "firmware"])
    replayed = scd2_merge(dim, b1, key="device_id", attrs=["location", "firmware"])
    assert _hist(replayed) == _hist(dim)


def test_out_of_order_update_lands_in_history(spark):
    dim = scd2_merge(
        None,
        spark.createDataFrame([(1, "lab", "v1", 100), (1, "roof", "v1", 500)], SCHEMA),
        key="device_id", attrs=["location", "firmware"],
    )
    # a late-arriving observation from t=300 splits the first interval
    late = spark.createDataFrame([(1, "truck", "v1", 300)], SCHEMA)
    dim2 = scd2_merge(dim, late, key="device_id", attrs=["location", "firmware"])
    assert _hist(dim2) == [
        (1, "lab", "v1", 100, 300, False),
        (1, "truck", "v1", 300, 500, False),
        (1, "roof", "v1", 500, None, True),
    ]


def test_version_as_of(spark):
    dim = scd2_merge(
        None,
        spark.createDataFrame(
            [(1, "lab", "v1", 100), (1, "roof", "v2", 300), (2, "dock", "v1", 250)], SCHEMA
        ),
        key="device_id", attrs=["location", "firmware"],
    )
    at_200 = {r.device_id: r.location for r in version_as_of(dim, 200, "device_id").collect()}
    assert at_200 == {1: "lab"}  # device 2 didn't exist yet
    at_300 = {r.device_id: r.location for r in version_as_of(dim, 300, "device_id").collect()}
    assert at_300 == {1: "roof", 2: "dock"}  # boundary: new version valid AT its start


def test_null_attributes_compress_and_transition(spark):
    rows = [(1, None, "v1", 100), (1, None, "v1", 200), (1, "lab", "v1", 300)]
    dim = scd2_merge(
        None, spark.createDataFrame(rows, SCHEMA),
        key="device_id", attrs=["location", "firmware"],
    )
    assert _hist(dim) == [
        (1, None, "v1", 100, 300, False),  # NULL==NULL compressed
        (1, "lab", "v1", 300, None, True),  # NULL->value opens a version
    ]


def test_same_instant_conflict_is_deterministic(spark):
    """Two updates for one key at the same effective_us with different
    attrs (ADVICE r2): the greatest attribute tuple wins, no
    zero-length version, stable across replays."""
    b = spark.createDataFrame(
        [(1, "lab", "v1", 100), (1, "roof", "v1", 100), (1, "cellar", "v2", 200)],
        SCHEMA,
    )
    expected = [
        (1, "roof", "v1", 100, 200, False),  # 'roof' > 'lab' in struct order
        (1, "cellar", "v2", 200, None, True),
    ]
    for _ in range(3):
        dim = scd2_merge(None, b, key="device_id", attrs=["location", "firmware"])
        assert _hist(dim) == expected
    # conflict split across current and a later batch resolves the same
    d1 = scd2_merge(
        None,
        spark.createDataFrame([(1, "lab", "v1", 100)], SCHEMA),
        key="device_id",
        attrs=["location", "firmware"],
    )
    d2 = scd2_merge(
        d1,
        spark.createDataFrame([(1, "roof", "v1", 100), (1, "cellar", "v2", 200)], SCHEMA),
        key="device_id",
        attrs=["location", "firmware"],
    )
    assert _hist(d2) == expected
