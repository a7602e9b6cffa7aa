"""Stream-stream interval join — Structured Streaming's watermarked
two-sided join, a capability the reference engine lacks entirely (its
streaming layer never joins two streams,
``stream_etl/spark_streaming_consumer.py``).

Semantics: join rows of two streams on equal keys where the right
event falls inside a time interval ending at the left event
(``left.ts - window <= right.ts <= left.ts``) — windowed attribution,
request/response pairing, sensor cross-correlation. ``inner`` emits
matches as they arrive; ``left_outer`` additionally emits unmatched
left rows (NULL right side) once the watermark proves no match can
still arrive — the "purchase with no attributable click" shape;
``full_outer`` additionally flushes unmatched RIGHT rows once the
watermark passes their whole match interval (``right_ts + window``) —
the "click that never converted" side only a full outer can surface.

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
    how: str = "inner",
) -> DataFrame:
    """Interval join of two STREAMING frames (``inner`` or
    ``left_outer``).

    ``left``/``right`` must already expose distinct column names apart
    from the shared key ``on`` (alias before calling); their event-time
    columns are ``left_ts``/``right_ts``. Matches every pair with
    ``left_ts - window_seconds <= right_ts <= left_ts``. Both sides get
    ``watermark`` so join state is evicted once events age out of
    ``watermark + window_seconds``.

    ``left_outer`` additionally emits every unmatched left row with
    NULL right columns — but only once the right-side watermark proves
    no future match can arrive, i.e. a left row's outer result
    surfaces when the watermark passes ``left_ts`` (upper bound of its
    match interval) plus the delay. Consumers comparing against a
    batch oracle must therefore restrict both sides to rows older than
    ``max event time - watermark - window`` (plus slack): younger left
    rows are still pending in the state store when a finite source
    drains, BY DESIGN — on an unbounded stream they would emit as the
    watermark advances.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {int(window_seconds)} SECONDS"))
    )
    joined = lw.join(rw, cond, how)
    if how == "full_outer":
        # right-only rows carry a NULL left key: surface the key as
        # the coalesce of both sides instead of dropping one
        return (
            joined.withColumn("_k_", F.coalesce(lw[on], rw[on]))
            .drop(lw[on])
            .drop(rw[on])
            .withColumnRenamed("_k_", on)
        )
    return joined.drop(rw[on])
