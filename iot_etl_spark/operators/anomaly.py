"""Z-score anomaly detection.

Reference: ``batch_etl/spark_transform.py:149-181`` — whole-partition
mean/stddev via a Window with no orderBy (frame = entire partition),
z = (value - mean) / stddev guarded by stddev > 0 else 0, anomaly if
|z| > threshold (3.0, ``config.py:127``), OR-combined with any
source-provided flag.

Scale note: the no-orderBy window computes per-key global stats with
one shuffle; an equivalent groupBy+broadcast-join form is exposed for
very hot keys, but the window form is the reference semantic and AQE
handles moderate skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

Z_THRESHOLD = 3.0


def add_zscore_anomaly(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    value_col: str = "value",
    threshold: float = Z_THRESHOLD,
    source_flag_col: str | None = None,
) -> DataFrame:
    w = Window.partitionBy(*[F.col(c) for c in key_cols])
    v = F.col(value_col)
    df = (
        df.withColumn("value_mean", F.avg(v).over(w))
        .withColumn("value_stddev", F.stddev(v).over(w))
        .withColumn(
            "z_score",
            F.when(
                F.col("value_stddev") > 0,
                (v - F.col("value_mean")) / F.col("value_stddev"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("is_anomaly_zscore", F.abs(F.col("z_score")) > threshold)
    )
    if source_flag_col is not None:
        df = df.withColumn(
            "is_anomaly_combined",
            F.col("is_anomaly_zscore") | F.coalesce(F.col(source_flag_col), F.lit(False)),
        )
    else:
        df = df.withColumn("is_anomaly_combined", F.col("is_anomaly_zscore"))
    return df
