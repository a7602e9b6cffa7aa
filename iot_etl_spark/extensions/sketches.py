"""Approximate (sketch-backed) twins of the exact profile queries —
the documented 100 TB path.

Exact DISTINCT and exact percentiles are correct but expensive at
scale: COUNT(DISTINCT x) plans an Expand + double aggregation (one
extra shuffle of every distinct value), exact PERCENTILE buffers each
group's values. The sketch versions are one-pass, fixed-memory,
mergeable partial aggregates — the shape that survives 1000 executors:

- ``approx_distinct_profile``: HyperLogLog++ (`approx_count_distinct`,
  default rsd 2.3%, tunable) in place of
  ``distinct_devices_per_type``'s exact Expand.
- ``approx_quantile_profile``: Greenwald-Khanna (`percentile_approx`,
  accuracy = 1/relative_error observations) in place of the exact
  ``F.percentile`` in the stats queries.

Estimates are implementation-specific, so these are deliberately NOT
DuckDB-oracle-gated (cross-engine hashes cannot match); correctness is
pinned by pytest against the EXACT operators with the algorithms'
published error bounds (see tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct_profile(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    rsd: float = 0.023,
) -> DataFrame:
    """HLL++ distinct users + active days per key group — the scale
    twin of distinct_devices_per_type (exact Expand aggregation)."""
    return events.groupBy(*keys).agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_distinct_devices"),
        F.approx_count_distinct(F.to_date("ts"), rsd).alias("approx_active_days"),
        F.count(F.lit(1)).alias("reading_count"),
    )


def approx_quantile_profile(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    accuracy: int = 10_000,
) -> DataFrame:
    """Greenwald-Khanna approximate p50/p95/p99 of value per key group
    (error <= 1/accuracy of rank) — the scale twin of the exact
    F.percentile aggregates."""
    return events.groupBy(*keys).agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias("p50_value"),
        F.percentile_approx("value", F.lit(0.95), F.lit(accuracy)).alias("p95_value"),
        F.percentile_approx("value", F.lit(0.99), F.lit(accuracy)).alias("p99_value"),
    )


# ----------------------------------------------------- count-min sketch
CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_slot(key_col, i: int, width: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{i}#"), F.col(key_col))), 1, 8),
            16, 10,
        ).cast("long") % width
    ).cast("int")


def cms_build(
    df,
    key_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a key
    stream as a (depth x width) counter table — the mergeable
    fixed-memory answer to "how often does each of millions of keys
    occur" when the exact histogram is itself too wide to keep.
    Guarantees: estimate >= true count always; overestimate
    <= e/width * N with probability 1 - exp(-depth).

    Distributed shape: each row fans out to ``depth`` (row, slot)
    increments (map-side), then ONE aggregate with map-side combine
    onto depth*width cells — the sketch never exceeds depth*width
    rows no matter the stream, and two sketches merge by cell-wise
    addition (cms_merge), which is what makes it a partial-aggregate
    at 1000-executor scale."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_slot(key_col, i, width).alias("slot"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rs")
    )
    return (
        cells.groupBy(F.col("rs.row").alias("row"), F.col("rs.slot").alias("slot"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every key in ``keys``: estimate =
    min over the depth counters at the key's slots (0 when a slot was
    never touched). The sketch side is depth*width rows — broadcast."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_slot(key_col, i, width).alias("slot"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rs"),
    ).select(key_col, F.col("rs.row").alias("row"), F.col("rs.slot").alias("slot"))
    return (
        probes.join(F.broadcast(cms), ["row", "slot"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — cms(A) + cms(B) == cms(A union B) exactly."""
    return (
        a.unionByName(b)
        .groupBy("row", "slot")
        .agg(F.sum("c").cast("long").alias("c"))
    )
