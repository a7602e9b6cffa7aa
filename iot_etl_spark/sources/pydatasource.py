"""Custom connector via the Spark 4 Python Data Source API.

The reference ships hand-rolled connectors (JDBC extract
``batch_etl/spark_extract.py:60-118``, Kafka consume
``stream_etl/spark_streaming_consumer.py:104-126``); since Spark 4 the
sanctioned way to add a source Spark doesn't ship is
``pyspark.sql.datasource.DataSource`` — the connector registers by
name and then reads like any built-in format, with Catalyst seeing an
ordinary scan. This module implements that API end to end with a
deterministic synthetic-events generator (the in-repo stand-in for
"a feed only your shop can decode": a device fleet simulator, a
proprietary wire format, a metering API).

Scale design — the two things a Python connector must get right:

- **Partition planning IS the parallelism.** ``partitions()`` returns
  one ``InputPartition`` per requested split; Spark schedules one task
  per partition and calls ``read(partition)`` executor-side. A
  connector that returns a single partition serializes the whole
  ingest through one core no matter the cluster size.
- **Determinism under retry.** Each partition's rows derive only from
  (seed, partition_id) — a re-scheduled task regenerates identical
  rows, so downstream exactly-once sinks stay correct. Never generate
  from wall-clock/RNG-without-seed inside ``read``.

Python-source rows cross into the JVM via Arrow batches (the same
plumbing as Pandas UDFs) — fine for feeds; for 100 TB bulk ingest
prefer native file formats and keep Python connectors at the edges.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_BASE_INSTANT = datetime(2024, 1, 1, tzinfo=timezone.utc)
_EVENT_TYPES = ("view", "click", "purchase", "error", "refund")

SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration.

    Options: ``n_rows`` total rows (default 1000), ``n_partitions``
    parallel splits (default 4), ``seed`` (default 42).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class _Split(InputPartition):
    def __init__(self, index: int, start: int, end: int, seed: int):
        self.index = index
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        # Contiguous row-id ranges: planning is driver-side and cheap,
        # row generation is deferred to executor-side read().
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _Split(i, i * per, min((i + 1) * per, self.n_rows), self.seed)
            for i in range(self.n_partitions)
            if i * per < self.n_rows
        ]

    def read(self, partition: _Split):
        # Executor-side, one call per task. Rows depend ONLY on
        # (seed, row range) — identical under task retry.
        import numpy as np

        n = partition.end - partition.start
        rng = np.random.default_rng(partition.seed * 1_000_003 + partition.index)
        users = rng.integers(0, 500, size=n)
        types = rng.integers(0, len(_EVENT_TYPES), size=n)
        values = np.round(rng.uniform(0, 100, size=n), 4)
        offsets = rng.integers(0, 86_400, size=n)
        with_props = rng.integers(0, 2, size=n)
        for j in range(n):
            row_id = partition.start + j
            yield (
                row_id,
                _BASE_INSTANT + timedelta(seconds=int(offsets[j])),
                int(users[j]),
                _EVENT_TYPES[types[j]],
                float(values[j]),
                '{"k": %d}' % (row_id % 100) if with_props[j] else None,
            )


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent registration; after this,
    ``spark.read.format("synthetic_events").option(...).load()`` works
    anywhere in the session, including SQL via a temp view."""
    spark.dataSource.register(SyntheticEventsDataSource)
