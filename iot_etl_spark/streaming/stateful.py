"""Custom stateful streaming operator: per-key EWMA via
``applyInPandasWithState``.

The reference has no arbitrary-stateful operators (SURVEY §2.9 "not
present"); this is the capability extension the driver brief names for
operators Spark's built-ins cannot express — an exponentially-weighted
moving average is inherently a sequential fold (each output depends on
the full prior history), not a windowed aggregate. State = (ewma,
n_events) per key, persisted in the state store across micro-batches,
updated in deterministic (ts, event_id) order inside each batch.

Scale shape: state is O(|keys|) doubles (bounded, unlike the
reference's unbounded windowed state), grouped processing is Arrow-
batched pandas per key, and the same function body serves batch
backfill (`ewma_batch`) and the live stream — one definition, two
execution modes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_ALPHA = 0.2

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _fold_ewma(values: list[float], ewma: float | None, alpha: float) -> float | None:
    for v in values:
        ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
    return ewma


def _ewma_update_fn(alpha: float):
    def update(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ewma, n = state.get if state.exists else (None, 0)
        for pdf in pdf_iter:
            # deterministic fold order within the batch
            pdf = pdf.sort_values(["ts", "event_id"])
            ewma = _fold_ewma([float(v) for v in pdf["value"]], ewma, alpha)
            n += len(pdf)
        state.update((ewma, n))
        yield pd.DataFrame([{"user_id": key[0], "n_events": n, "ewma": ewma}])

    return update


def streaming_ewma(df: DataFrame, alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Stateful per-user EWMA over a stream: emits one (user, n_events,
    ewma) row per key per micro-batch in update mode; state carries the
    running average across batches.

    The projection below matters at scale: Catalyst cannot prune
    columns through FlatMapGroupsInPandasWithState, so without it the
    ENTIRE source row (props JSON and all) is Arrow-serialized into
    Python per event. At sf0.1's narrow schema the delta is within
    run-to-run noise; on a wide production event it is the difference
    between shipping 4 columns and shipping all of them."""
    df = df.select("user_id", "ts", "event_id", "value")
    return df.groupBy("user_id").applyInPandasWithState(
        _ewma_update_fn(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_batch(df: DataFrame, alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """Batch twin of streaming_ewma (same fold, applyInPandas without
    state) — used for backfill and as the oracle-checkable surface."""
    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        ewma = _fold_ewma([float(v) for v in pdf["value"]], None, alpha)
        return pd.DataFrame(
            [{"user_id": pdf["user_id"].iloc[0], "n_events": len(pdf), "ewma": ewma}]
        )

    return df.groupBy("user_id").applyInPandas(compute, schema=EWMA_OUTPUT_SCHEMA)
