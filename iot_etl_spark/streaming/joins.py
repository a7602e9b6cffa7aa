"""Stream-stream interval join — Structured Streaming's watermarked
two-sided join, a capability the reference engine lacks entirely (its
streaming layer never joins two streams,
``stream_etl/spark_streaming_consumer.py``).

Semantics: inner-join rows of two streams on equal keys where the
right event falls inside a time interval ending at the left event
(``left.ts - window <= right.ts <= left.ts``) — windowed attribution,
request/response pairing, sensor cross-correlation.

Scale shape: both sides are watermarked, and the join carries BOTH a
key equality (state is hash-partitioned by key) and a two-sided time
constraint, so the state store provably evicts rows older than
``watermark + window`` — bounded state at any throughput. Without the
time bounds Spark would have to keep every row forever; that shape is
deliberately not exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_seconds: int,
    left_ts: str = "left_ts",
    right_ts: str = "right_ts",
    watermark: str = "4 hours",
) -> DataFrame:
    """Inner interval join of two STREAMING frames.

    ``left``/``right`` must already expose distinct column names apart
    from the shared key ``on`` (alias before calling); their event-time
    columns are ``left_ts``/``right_ts``. Matches every pair with
    ``left_ts - window_seconds <= right_ts <= left_ts``. Both sides get
    ``watermark`` so join state is evicted once events age out of
    ``watermark + window_seconds``.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {int(window_seconds)} SECONDS"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
