"""Data layout for scan efficiency: partition + range-cluster + sort.

At 100 TB the cheapest query is the one that never reads the bytes:
after calendar partition pruning (coarse), the second pruning tier is
**parquet min/max statistics** — but those only help if the writer
physically clusters rows so each file/row-group covers a narrow key
range. This module is the write-side half of that contract:

``repartitionByRange(cluster_cols)`` gives every output task a
disjoint key range (files don't overlap on the cluster key), and
``sortWithinPartitions`` tightens row-group stats inside each file.
A point or range predicate on the cluster key then skips all but
O(1) of the files — the Spark-native equivalent of the reference's
btree secondary indexes (create_dwh_schema.sql index DDL) and of
Delta/Iceberg ZORDER at one dimension.

The range exchange samples the key distribution, so skewed keys get
proportionally more tasks — no manual bucket tuning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_by_range(df: DataFrame, cluster_cols: tuple[str, ...], n_ranges: int) -> DataFrame:
    """Range-repartition on ``cluster_cols`` (disjoint per-task key
    ranges) and sort within each task (tight row-group min/max)."""
    return df.repartitionByRange(n_ranges, *cluster_cols).sortWithinPartitions(*cluster_cols)


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    cluster_cols: tuple[str, ...],
    n_ranges: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hive-partitioned on ``partition_cols`` (pruning
    tier 1) with files range-clustered + sorted on ``cluster_cols``
    inside each partition (pruning tier 2: parquet min/max skipping).
    """
    w = cluster_by_range(df, cluster_cols, n_ranges).write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def cluster_by_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_ranges: int = 8,
) -> DataFrame:
    """Two-dimensional Z-order (Morton) clustering: both cluster keys
    are min-max scaled to ``bits``-bit grid cells and their bits
    interleaved into one sort key; range-repartitioning on that key
    gives files whose bounding box is narrow in BOTH dimensions — a
    predicate on either column alone skips most files, where
    single-key range clustering only serves its own column (the
    Delta/Iceberg ZORDER capability, expressed as pure column math —
    no table format needed).

    The min/max bounds come from a one-row aggregate broadcast back
    via crossJoin — no driver-side collect; at 100 TB the bounds pass
    is a cheap column-pruned scan (or comes free from table stats).

    Scale intuition: with F files, each file spans ~domain/sqrt(F) of
    each dimension instead of domain/F on one and the full domain on
    the other."""
    from pyspark.sql import functions as F

    a = F.col(col_a).cast("double")
    b = F.col(col_b).cast("double")
    bounds = df.agg(
        F.min(a).alias("__amin"), F.max(a).alias("__amax"),
        F.min(b).alias("__bmin"), F.max(b).alias("__bmax"),
    )
    top = (1 << bits) - 1

    def scaled(x, mn, mx):
        rng = F.col(mx) - F.col(mn)
        return F.when(rng > 0, F.floor((x - F.col(mn)) / rng * top)).otherwise(
            F.lit(0)
        ).cast("long")

    ga, gb = scaled(a, "__amin", "__amax"), scaled(b, "__bmin", "__bmax")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(ga, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(gb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z)
        .repartitionByRange(n_ranges, "__z")
        .sortWithinPartitions("__z")
        .drop("__amin", "__amax", "__bmin", "__bmax", "__z")
    )
