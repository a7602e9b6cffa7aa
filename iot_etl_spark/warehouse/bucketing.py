"""Bucketed table layout: shuffle-free co-located fact-fact joins.

The reference relies on PostgreSQL btree PKs for join locality
(create_dwh_schema.sql fact/dim DDL); the Spark-native equivalent for
repeated big joins is **bucketing**: `bucketBy(N, key)` pre-shuffles
the data ONCE at write time into N hash buckets per table (optionally
`sortBy` within buckets). Two tables bucketed by the same key with the
same N join with ZERO runtime Exchange — the sort-merge join reads
bucket i of each side directly. At 100 TB this turns every
orders-lineitem style join from a full network shuffle of both sides
into a local merge; the shuffle cost is paid once at ingest and
amortized over every downstream query. Bucket pruning additionally
skips N-1 of N buckets on point predicates over the bucket key.

Sizing: N should be chosen so one bucket of the larger table fits an
executor core's working set (~128-256 MB compressed) — e.g. 100 TB
lineitem at 200 MB/bucket-file x 2048 buckets per date partition.
Local tests use small N; the layout contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table hash-bucketed on
    ``bucket_cols`` (Spark's Hive-compatible bucketing: file-per-bucket
    with the bucket id in the filename, registered in the catalog so
    the planner can claim the partitioning). ``sort_cols`` additionally
    sorts within each bucket, letting sort-merge join skip its sort."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode(mode).format("parquet").option("path", path)
    w = w.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def register_bucketed_external(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    """(Re-)register an external bucketed table over files previously
    produced by :func:`write_bucketed` — bucket ids live in the data
    file names, so a new session can claim the layout with a CREATE
    TABLE carrying the same bucket spec instead of re-shuffling and
    rewriting. This is how bucketed layouts behave on a real warehouse:
    written once at ingest, registered cheaply everywhere else."""
    if spark.catalog.tableExists(table):
        return
    clustered = ", ".join(bucket_cols)
    sorted_clause = (
        f"SORTED BY ({', '.join(f'{c} ASC' for c in sort_cols)}) " if sort_cols else ""
    )
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET "
        f"CLUSTERED BY ({clustered}) {sorted_clause}INTO {num_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan as text (for plan assertions)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (BroadcastExchange excluded — broadcasts are not shuffles)."""
    plan = physical_plan(df)
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-key same-N bucketed catalog tables. With
    bucketing both sides report HashPartitioning(on, N) so
    EnsureRequirements inserts no Exchange; assert with
    ``count_shuffle_exchanges`` in tests."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
