"""Rolling time-range window statistics and lag features.

Reference: ``batch_etl/spark_transform.py:113-147`` — 5-minute and
1-hour *time-range* rolling frames built with the epoch-seconds trick
(``unix_timestamp`` + ``rangeBetween(-300, 0)``), plus lag(1)/lag(2)
and first-difference. Reproduced with the same Window frames.

Scale note (100 TB): a per-device range frame requires one shuffle on
the partition key and a sort within partitions — Spark's window exec
handles this without collecting state beyond the frame. For extreme
per-key cardinality, bound partitions by (device, day) and accept
bucket-local frames (SURVEY.md §7.3 item 8); the operator exposes
``extra_partition_cols`` for that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

ROLLING_5MIN_S = 300
ROLLING_1H_S = 3600


def add_rolling_features(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    time_col: str = "ts",
    value_col: str = "value",
    extra_partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Add rolling_avg_5min, rolling_avg_1h, rolling_stddev_1h."""
    df = df.withColumn("_ts_epoch", F.unix_timestamp(F.col(time_col)))
    part = list(key_cols) + list(extra_partition_cols)
    base = Window.partitionBy(*part).orderBy("_ts_epoch")
    w5 = base.rangeBetween(-ROLLING_5MIN_S, 0)
    w60 = base.rangeBetween(-ROLLING_1H_S, 0)
    v = F.col(value_col)
    return (
        df.withColumn("rolling_avg_5min", F.avg(v).over(w5))
        .withColumn("rolling_avg_1h", F.avg(v).over(w60))
        .withColumn("rolling_stddev_1h", F.stddev(v).over(w60))
        .drop("_ts_epoch")
    )


def add_lag_features(
    df: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    time_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """lag(1), lag(2) and first difference (reference
    ``spark_transform.py:139-144``). A deterministic tiebreak column is
    added to the ordering — the reference orders by time alone, which
    is nondeterministic on duplicate timestamps (SURVEY.md §7.3)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(time_col), F.col(tiebreak_col))
    v = F.col(value_col)
    return (
        df.withColumn("value_lag_1", F.lag(v, 1).over(w))
        .withColumn("value_lag_2", F.lag(v, 2).over(w))
        .withColumn("value_change", v - F.col("value_lag_1"))
    )
