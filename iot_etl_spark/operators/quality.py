"""Data-quality flags and the valid-record gate.

Reference: ``batch_etl/spark_transform.py:184-213`` — null checks,
range checks on value/quality_score, and an ``is_valid_record`` flag
that the fact-table sink filters on (``spark_load.py:100``). The
events stand-in has no quality_score column, so the generic form takes
configurable bounds; the sensor-contract form mirrors the reference
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def add_quality_flags(
    df: DataFrame,
    value_col: str = "value",
    min_value: float | None = 0.0,
    max_value: float | None = None,
    quality_col: str | None = None,
) -> DataFrame:
    v = F.col(value_col)
    has_null = v.isNull()
    invalid = F.lit(False)
    if min_value is not None:
        invalid = invalid | (v < F.lit(min_value))
    if max_value is not None:
        invalid = invalid | (v > F.lit(max_value))
    if quality_col is not None:
        q = F.col(quality_col)
        invalid = invalid | q.isNull() | (q < 0) | (q > 100)
    return (
        df.withColumn("has_null_value", has_null)
        .withColumn("has_invalid_value", F.coalesce(invalid, F.lit(True)))
        .withColumn("is_valid_record", ~(has_null | F.coalesce(invalid, F.lit(True))))
    )
