"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(Spark 4.1's successor to ``applyInPandasWithState``).

Where the older API hands the processor ONE opaque state tuple, the
``StatefulProcessor`` handle owns NAMED, independently-evolvable state
primitives (value/list/map state, optional TTL, timers) — the API a
long-lived production operator actually wants: adding a new state
field later doesn't force a wire-format migration of the old one.

The operator here is a per-user running profile (count, total,
min, max — mean derived at emit): a sequential fold the windowed
built-ins can't express, emitted once per key per micro-batch in
update mode. The EWMA operator (``streaming/stateful.py``) keeps the
older API for comparison; both are Arrow-batched and carry
O(|keys| x state-width) bounded state.

Scale: state lives in the state store (per-partition, checkpointed);
a key's update cost is O(its batch rows); emissions are one row per
ACTIVE key per batch (quiet keys emit nothing — important at 1e9
keys, where per-trigger full-state scans would dominate).

ENVIRONMENT GATE: executing this operator needs ``google.protobuf``
(the state-server wire protocol), whose installation is broken in
this container — the cross-batch test skips with an explicit reason
(same gate class as the Kafka broker, STATUS.md S7). The module
itself is plain PySpark 4.1 API usage and imports/serializes fine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

PROFILE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)

PROFILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("min_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


class RunningProfileProcessor(StatefulProcessor):
    """Named ValueState fold: profile = (count, total, min, max)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", PROFILE_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, total, vmin, vmax = self._state.get()
        else:
            n, total, vmin, vmax = 0, 0.0, None, None
        for pdf in rows:
            vals = pdf["value"].dropna()
            if len(vals):
                n += int(len(vals))
                total += float(vals.sum())
                bmin, bmax = float(vals.min()), float(vals.max())
                vmin = bmin if vmin is None else min(vmin, bmin)
                vmax = bmax if vmax is None else max(vmax, bmax)
        self._state.update((n, total, vmin, vmax))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "mean_value": (total / n) if n else None,
                    "min_value": vmin,
                    "max_value": vmax,
                }
            ]
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def streaming_running_profile(df: DataFrame) -> DataFrame:
    """Per-user cumulative value profile over a stream, update mode.

    The projection before the stateful operator matters: columns do
    not prune through the Python state operator, so everything
    selected here is Arrow-shipped to Python per event."""
    return (
        df.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningProfileProcessor(),
            outputStructType=PROFILE_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_profile_batch(df: DataFrame) -> DataFrame:
    """Batch twin: the final state every key converges to."""
    from pyspark.sql import functions as F

    return (
        df.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("value") / F.count(F.lit(1))).alias("mean_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
