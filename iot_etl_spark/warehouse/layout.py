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
