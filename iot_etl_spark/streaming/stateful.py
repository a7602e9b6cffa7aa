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
    # The closure must be SELF-CONTAINED: a reference to a module-level
    # helper pickles by module path, and the executor's Python worker
    # can only import iot_etl_spark when the driver's cwd (or
    # PYTHONPATH) happens to expose the repo — true in the test
    # harness, not guaranteed for an arbitrary driver (found by the
    # round-8 vanilla-session check run from /tmp). Locals pickle by
    # value, so the fold is defined inside.
    def fold(values, ewma):
        for v in values:
            ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
        return ewma

    def update(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np  # self-contained closure (see above)

        ewma, n = state.get if state.exists else (None, 0)
        # A key's micro-batch can span multiple Arrow chunks (default
        # ~10k rows), and chunk boundaries carry NO ordering guarantee;
        # sorting each chunk independently would let a later-arriving
        # chunk hold earlier events and break the sequential fold.
        # Concatenate the key's whole batch and sort ONCE — buffering
        # the key-batch is the price of the global-order contract (the
        # state itself stays O(1); micro-batch duration bounds the
        # buffer). r14 (guide §4.2): the per-key sort is np.lexsort
        # over the two key arrays (event_id unique -> identical order
        # to the old pandas sort_values) and the emission frame is
        # built column-wise — this function runs once PER KEY per
        # micro-batch, so its constant factors are the operator's
        # floor.
        chunks = list(pdf_iter)
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            order = np.lexsort(
                (pdf["event_id"].to_numpy(), pdf["ts"].to_numpy())
            )
            vals = pdf["value"].to_numpy()[order]
            ewma = fold([float(v) for v in vals], ewma)
            n += len(vals)
        state.update((ewma, n))
        yield pd.DataFrame(
            {"user_id": (key[0],), "n_events": (n,), "ewma": (ewma,)}
        )

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
        # self-contained (no module-global helper): see _ewma_update_fn
        ewma = None
        for v in pdf["value"]:
            v = float(v)
            ewma = v if ewma is None else alpha * v + (1.0 - alpha) * ewma
        return pd.DataFrame(
            [{"user_id": pdf["user_id"].iloc[0], "n_events": len(pdf), "ewma": ewma}]
        )

    return df.groupBy("user_id").applyInPandas(compute, schema=EWMA_OUTPUT_SCHEMA)


# ------------------------------------------------ stateful window funnel
FUNNEL_WINDOW_US = 86_400_000_000  # 24 h; matches the batch twin

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s1", T.LongType()),
        T.StructField("s2", T.LongType()),
        T.StructField("s3", T.LongType()),
    ]
)

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("funnel_depth", T.IntegerType()),
        T.StructField("s1", T.LongType()),
        T.StructField("s2", T.LongType()),
        T.StructField("s3", T.LongType()),
    ]
)


def _fold_funnel(
    rows: "pd.DataFrame", s1: int | None, s2: int | None, s3: int | None
) -> tuple[int | None, int | None, int | None]:
    """Greedy in-time-order funnel fold: first view anchors the 24h
    window; first qualifying click after it; first qualifying purchase
    after that. Processing rows in (t, event_id) order makes greedy
    equal to the batch MIN semantics (each step takes the earliest
    candidate, which in time order is the first seen)."""
    for et, t in zip(rows["event_type"], rows["t"]):
        t = int(t)
        if s1 is None:
            if et == "view":
                s1 = t
        elif s2 is None:
            if et == "click" and t > s1 and t <= s1 + FUNNEL_WINDOW_US:
                s2 = t
        elif s3 is None:
            if et == "purchase" and t > s2 and t <= s1 + FUNNEL_WINDOW_US:
                s3 = t
    return s1, s2, s3


def _funnel_update_fn():
    # self-contained closure: the executor worker must never need to
    # import iot_etl_spark (see _ewma_update_fn); the window constant
    # and the fold are locals, pickled by value.
    win = FUNNEL_WINDOW_US

    def fold(rows, s1, s2, s3):
        for et, t in zip(rows["event_type"], rows["t"]):
            t = int(t)
            if s1 is None:
                if et == "view":
                    s1 = t
            elif s2 is None:
                if et == "click" and t > s1 and t <= s1 + win:
                    s2 = t
            elif s3 is None:
                if et == "purchase" and t > s2 and t <= s1 + win:
                    s3 = t
        return s1, s2, s3

    def update(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np  # self-contained closure (see above)

        s1, s2, s3 = state.get if state.exists else (None, None, None)
        # concat-then-sort-once: Arrow chunk boundaries are unordered,
        # so a per-chunk sort does NOT give global (t, event_id) order
        # within the batch (see _ewma_update_fn for the full argument;
        # r14: np.lexsort + column-wise emission, same per-key-floor
        # rationale as the EWMA operator — identical order, event_id
        # is unique)
        chunks = list(pdf_iter)
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            order = np.lexsort(
                (pdf["event_id"].to_numpy(), pdf["t"].to_numpy())
            )
            rows = {
                "event_type": pdf["event_type"].to_numpy()[order],
                "t": pdf["t"].to_numpy()[order],
            }
            s1, s2, s3 = fold(rows, s1, s2, s3)
        state.update((s1, s2, s3))
        depth = 3 if s3 is not None else 2 if s2 is not None else (
            1 if s1 is not None else 0
        )
        yield pd.DataFrame(
            {"user_id": (key[0],), "funnel_depth": (depth,),
             "s1": (s1,), "s2": (s2,), "s3": (s3,)}
        )

    return update


def streaming_window_funnel(df: DataFrame) -> DataFrame:
    """Stateful 24h window funnel (view -> click -> purchase) on the
    streaming engine: per-user state is THREE BIGINT step anchors —
    O(|users|) fixed-size state, never event history — updated by the
    greedy in-order fold and emitted (user, depth, anchors) per key
    per micro-batch in update mode.

    Correctness contract: greedy == the batch twin's MIN semantics
    when each key's events are processed in event-time order — true
    within a batch (explicit sort) and across batches when delivery
    is time-ordered per key (the single-file test source; production
    pairs this with a watermark and per-key ordered replay, the
    standard caveat for any sequential stateful fold, EWMA included).

    Scale shape: the pre-projection keeps the Arrow transfer to four
    narrow columns (Catalyst cannot prune through
    FlatMapGroupsInPandasWithState); state store traffic is 24 bytes
    per user."""
    from pyspark.sql import functions as F

    slim = df.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        _funnel_update_fn(),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
