"""SparkSession factory and runtime configuration guard.

The reference creates its session in ``batch_etl/spark_extract.py:31-51``
(local[*], shuffle.partitions=4, JDBC jars) and
``stream_etl/spark_streaming_consumer.py:60-92``. This engine keeps the
same "one session, tuned shuffle" stance but:

- AQE on (runtime coalesce / skew-join) instead of a fixed partition
  count — at 100 TB the right shuffle width is data-dependent.
- Session timezone pinned to UTC so time features (hour/day-of-week)
  are deterministic regardless of host TZ (SURVEY.md §7.3 item 5).
- ``spark.sql.legacy.parquet.nanosAsLong=true`` so nanosecond-precision
  parquet timestamps (the ``events.ts`` column) are readable; loaders
  convert to microsecond TimestampType explicitly.

``ensure_runtime_confs(spark)`` applies the *runtime-settable* subset to
an externally-created session (the verify driver constructs its own
SparkSession); every public query entry point calls it defensively.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

# Confs that are session-settable at runtime (all spark.sql.* SQLConfs).
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Allow shuffled hash join where its size conditions hold (guide
    # §3.1): the planner's own guards (one side much smaller, build
    # side under threshold x partitions) keep the choice size-based —
    # so it adapts with data volume, not core count. The AQE rewrite
    # threshold converts a planned sort-merge to shuffled-hash only
    # when EVERY post-shuffle partition is under 64 MB (default 0 =
    # never), so at 100 TB with 256 MB-advisory partitions it simply
    # stops firing. r13 A/B on the iterative graph family: kcore
    # 2.9->2.7, pagerank 2.3->2.1, dedup_threshold_curve 2.3->1.5,
    # lsh_recall_audit 1.3->1.0 s steady; no query slower.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB",
    # InferFiltersFromGenerate turns explode(expensive_expr) into a
    # pre-Generate filter that INLINES the generator expression (via
    # project collapse) into size()/isnotnull() checks — the shingle
    # pipeline was re-evaluated ~3x per row with split(text) expanded
    # per lambda reference, an O(words^2) blowup measured at 14x wall
    # time on doc_fingerprint. The inferred filter only skips rows
    # with empty arrays — worthless for our generators, so exclude the
    # rule engine-wide.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


# Sessions already guarded this process: each conf.set is a Py4J round
# trip (~0.5-1 ms), and every load_table call guards defensively —
# ~800 calls/bench-pass made the 7-conf loop a measurable slice of the
# sub-second query tail (guide §1: fixed overhead). Nothing in the
# engine or its tests mutates these keys mid-session, so once applied
# to a live session object they stay applied.
_CONFS_APPLIED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    if spark in _CONFS_APPLIED:
        return spark
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - read-only conf on some builds
            pass
    _CONFS_APPLIED.add(spark)
    return spark


def get_spark(
    app_name: str = "iot_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine SparkSession.

    Defaults size the shuffle to the local core count rather than
    Spark's 200 — on a real cluster this is overridden per deployment
    and AQE coalesces at runtime anyway.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Janino compiled-class cache (STATIC conf, so it must ride the
        # builder — ensure_runtime_confs can't set it on a foreign
        # session). Default 100 entries thrashes on a many-hundreds-of-
        # queries workload: every re-run re-compiles codegen from
        # scratch. Sized to distinct-plan count, not cores/data, so it
        # is not a local-mode tune. Measured 2x off an 80-query warm
        # pass (bench.py has the A/B numbers).
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_CODEGEN_CACHE_ENTRIES", "20000"),
        )
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_confs(spark)
