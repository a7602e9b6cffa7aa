"""Bucketed point-in-interval range join.

A naive ``p JOIN i ON key AND i.start <= p.ts <= i.end`` compiles (at
best) to a sort-merge on the key with a per-key quadratic filter, and
without the equality to a BroadcastNestedLoopJoin — both die at scale.
This operator turns the range predicate into an EQUI-join: intervals
are exploded to the fixed-width time buckets they cover, points carry
their single bucket, the join key is ``(key, bucket)``, and the exact
range predicate re-filters candidates. Work is proportional to true
candidate density per bucket, shuffles hash-partition evenly, and
Catalyst plans a plain shuffled hash / sort-merge join.

Pick ``bucket_us`` near the typical interval length: each interval
explodes to ``len/bucket + 1`` rows (2 for len == bucket), each point
to exactly 1.

The reference engine has no range join (equi-joins only); this is the
batch counterpart of ``streaming/joins.py::interval_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts_us: str,
    start_us: str,
    end_us: str,
    bucket_us: int,
) -> DataFrame:
    """Inner-join every ``points`` row to every ``intervals`` row with
    the same ``on`` key and ``start_us <= point_ts_us <= end_us``
    (inclusive both ends; all three are epoch-microsecond BIGINT
    columns). Column sets must be disjoint apart from ``on``."""
    overlap = (set(points.columns) & set(intervals.columns)) - {on}
    if overlap:
        raise ValueError(f"point/interval columns collide: {sorted(overlap)}")
    b = int(bucket_us)
    # `div` is integer division (float division would misplace bucket
    # boundaries); epoch-us values are non-negative so div == floor-div
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(F.expr(f"sequence({start_us} div {b}, {end_us} div {b})")),
    )
    pt = points.withColumn("_rj_bucket", F.expr(f"{point_ts_us} div {b}"))
    return (
        pt.join(iv, [on, "_rj_bucket"])
        .filter((F.col(point_ts_us) >= F.col(start_us)) & (F.col(point_ts_us) <= F.col(end_us)))
        .drop("_rj_bucket")
    )
