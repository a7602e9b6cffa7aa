"""Type-2 slowly-changing dimension merge.

The reference's dimension loads are full overwrites
(``batch_etl/spark_load.py`` — mode('overwrite') on dim tables), which
destroys history: re-pointing a device's location rewrites the past.
SCD2 is the warehouse-standard fix — each natural key keeps a history
of attribute versions with ``[valid_from_us, valid_to_us)`` validity
and an ``is_current`` flag — and is the missing piece that makes
``operators/asof.py`` useful against dimensions (as-of join a fact's
event time onto the dimension version valid at that time).

Spark-first design: the merge is ONE window pass over
``current UNION incoming`` — no per-key driver loops, no MERGE
statement needed. Per natural key, versions are ordered by
``valid_from_us``; consecutive duplicates (no attribute change) are
dropped (run-length compression via lag()); ``valid_to_us`` is the
next version's start (open = NULL). Shuffle: exactly one, on the
natural key. Idempotent: re-applying the same batch is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

OPEN_END = None  # valid_to_us of the current version


def scd2_merge(
    current: DataFrame | None,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_us_col: str = "effective_us",
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension.

    ``current``: existing SCD2 table with columns
    ``key, *attrs, valid_from_us, valid_to_us, is_current`` (or None
    to bootstrap). ``updates``: one row per observed (key, attrs) at
    ``effective_us_col``. Returns the full new SCD2 table.

    A key's history is the run-length-compressed sequence of attribute
    tuples ordered by effective time: updates that do not change any
    attribute extend the current version instead of opening a new one.

    Same-instant conflicts (one key, two updates at the same
    ``effective_us`` with different attrs) resolve deterministically:
    the greatest attribute tuple (struct ordering, field order = the
    ``attrs`` list) wins and the others are discarded — no zero-length
    versions, no run-order-dependent ``is_current``.
    """
    inc = updates.select(
        key, *attrs, F.col(effective_us_col).cast("long").alias("valid_from_us")
    )
    if current is not None:
        inc = inc.unionByName(
            current.select(key, *attrs, "valid_from_us")
        )
    # Tie-break pass: within a key, order by (valid_from_us, attrs DESC)
    # and keep only the first row of each instant — the greatest
    # attribute tuple. Subsumes exact-duplicate removal. Shares the
    # partitionBy(key) shuffle with the history window below (Catalyst
    # reuses the exchange; the second window only re-sorts).
    w_tie = Window.partitionBy(key).orderBy("valid_from_us", F.struct(*attrs).desc())
    inc = (
        inc.withColumn("_prev_from", F.lag("valid_from_us").over(w_tie))
        .filter(
            F.col("_prev_from").isNull()
            | (F.col("_prev_from") != F.col("valid_from_us"))
        )
        .drop("_prev_from")
    )
    w = Window.partitionBy(key).orderBy("valid_from_us")
    changed = (
        inc.withColumn(
            "_prev",
            F.lag(F.struct(*attrs)).over(w),
        )
        .filter(~F.col("_prev").eqNullSafe(F.struct(*attrs)))  # null-safe: NULL attrs compare, first row passes
        .drop("_prev")
    )
    return changed.select(
        key,
        *attrs,
        "valid_from_us",
        F.lead("valid_from_us").over(w).alias("valid_to_us"),
        F.lead("valid_from_us").over(w).isNull().alias("is_current"),
    )


def version_as_of(dim: DataFrame, at_us: int, key: str) -> DataFrame:
    """The dimension snapshot valid at ``at_us`` (one row per key that
    existed by then) — the point-in-time read an SCD2 table exists to
    answer. A plain filter: partition-prunable when the table is
    written partitioned on ``is_current`` or bucketed by key."""
    return dim.filter(
        (F.col("valid_from_us") <= at_us)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > at_us))
    ).drop("valid_to_us", "is_current")
