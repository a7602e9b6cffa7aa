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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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


def _gen_rows(seed: int, start: int, end: int):
    """The ONE generator both batch partitions and stream batches call:
    rows depend only on (seed, row-id range), so a batch read, a
    streaming read, and a retried/replayed task of either all produce
    identical rows for the same ids — the property exactly-once sinks
    rely on."""
    import numpy as np

    n = end - start
    if n <= 0:
        return
    # Per-row-id generation (not per-call): the stream may cut the id
    # space into different chunk boundaries than the batch splits, so
    # randomness must key on the row id alone.
    for row_id in range(start, end):
        rng = np.random.default_rng(seed * 1_000_003 + row_id)
        user, etype, value, offset, with_props = (
            int(rng.integers(0, 500)),
            int(rng.integers(0, len(_EVENT_TYPES))),
            float(np.round(rng.uniform(0, 100), 4)),
            int(rng.integers(0, 86_400)),
            int(rng.integers(0, 2)),
        )
        yield (
            row_id,
            _BASE_INSTANT + timedelta(seconds=offset),
            user,
            _EVENT_TYPES[etype],
            value,
            '{"k": %d}' % (row_id % 100) if with_props else None,
        )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` (batch) and
    ``spark.readStream.format("synthetic_events")`` (streaming) after
    registration — one connector, both execution modes, identical rows
    for identical row ids.

    Options: ``n_rows`` total rows (default 1000), ``n_partitions``
    batch splits (default 4), ``rows_per_batch`` stream micro-batch
    size (default 100), ``seed`` (default 42).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


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
        # Executor-side, one call per task; retry-identical because
        # _gen_rows keys on (seed, row id) alone.
        yield from _gen_rows(partition.seed, partition.start, partition.end)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: the offset is just the next
    unread row id, each micro-batch advances it by ``rows_per_batch``
    until ``n_rows`` is exhausted (a finite feed — lets tests drain
    with processAllAvailable; production feeds simply never stop
    advancing).

    ``readBetweenOffsets`` regenerates any committed range verbatim —
    this is the replay path the engine uses on recovery, and it is
    exact here because generation keys on row ids, not on call
    history."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next_row": 0}

    def read(self, start: dict):
        # iter(list), not a generator: the engine's prefetch cache
        # needs an ITERATOR (it calls next() to probe emptiness) that
        # is also PICKLABLE (batches ship driver->executor pickled);
        # generators fail the second, bare lists the first. Bounded by
        # rows_per_batch, so materializing is safe.
        first = int(start["next_row"])
        last = min(first + self.rows_per_batch, self.n_rows)
        return iter(list(_gen_rows(self.seed, first, last))), {"next_row": last}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            list(_gen_rows(self.seed, int(start["next_row"]), int(end["next_row"])))
        )


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent registration; after this,
    ``spark.read.format("synthetic_events").option(...).load()`` works
    anywhere in the session, including SQL via a temp view."""
    spark.dataSource.register(SyntheticEventsDataSource)
