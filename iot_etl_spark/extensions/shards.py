"""Training-shard writeout: the last step of a corpus pipeline —
deterministic global shuffle + fixed-count sharded parquet, the layout
a data loader streams during training.

Two properties matter and both are deterministic here:

- **Assignment** is content-addressed (md5 of the id, not
  ``rand()``/``monotonically_increasing_id``), so a re-run, a retried
  task, or a different cluster produces byte-identical shards —
  training jobs can resume against re-generated data.
- **Within-shard order** is the hash order, not ingest order, which IS
  the "global shuffle" training wants: adjacent source documents land
  in different shards and far-apart positions, de-clustering crawl
  locality without an explicit random permutation.

100 TB shape: one repartition on the shard key (the only shuffle),
`partitionBy` writeout so each shard is its own directory; shard count
picks the file granularity (per-shard size = corpus/n_shards —
choose n_shards so files land in the 100 MB-1 GB sweet spot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# md5-derived 32-bit id hash — the registry's cross-engine hash
# convention (queries_text.py: conv(substr(md5(x),1,8),16,10))
def shard_of(id_col: str, n_shards: int):
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> None:
    """Write ``docs`` as ``out_dir/shard=K/*.parquet``, K in
    [0, n_shards): deterministic content-addressed assignment, one
    shuffle, hash-ordered rows within each shard."""
    sharded = docs.withColumn("shard", shard_of(id_col, n_shards))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(
            "shard", F.md5(F.col(id_col).cast("string"))
        )
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )


def read_shard(spark, out_dir: str, shard: int) -> DataFrame:
    """One shard, partition-pruned (the scan touches only that
    directory — verify PartitionFilters in the plan)."""
    return spark.read.parquet(out_dir).filter(F.col("shard") == shard)
