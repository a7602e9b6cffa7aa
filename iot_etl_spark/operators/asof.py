"""Backward as-of join — attach to each left row the most recent right
row at-or-before its timestamp, per key.

The reference engine has no as-of operator (its enrichment joins are
all equi-joins, ``batch_etl/spark_transform.py``); this is a capability
extension the IoT/attribution domain needs constantly (latest
calibration before a reading, last click before a purchase).

Spark-first design — the UNION + running-last trick, not a range join:

    tag left rows side=1, right rows side=0
    union on (keys, ts_us, side, struct(matched_ts, payload...))
    window PARTITION BY keys ORDER BY (ts_us, side) ROWS UNBOUNDED
        PRECEDING: last(struct, ignorenulls) — one struct per right
        row, so all matched fields come from the SAME right row even
        when its payload contains NULLs
    keep side=1 rows, unpack the struct

One shuffle on the key columns, linear scan per key — no candidate
explosion, no per-row range probe. A range-join formulation
(``l JOIN r ON key AND r.ts <= l.ts`` + max) is O(n·m) per key and
shuffles twice; this is the shape that survives 100 TB. Right rows at
exactly the left timestamp ARE matched (side 0 sorts first), matching
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` inclusive semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TS_US = "_asof_ts_us"
_SIDE = "_asof_side"
_PACK = "_asof_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    matched_ts_alias: str = "matched_ts_us",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join.

    Returns every ``left`` row with ``right_cols`` from the latest
    ``right`` row whose ``ts_col`` <= left's ``ts_col`` on the same
    ``on`` keys (NULLs when no such row), plus ``matched_ts_alias``
    (epoch microseconds of the matched right row). ``tolerance_us``
    nulls out matches older than the tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics).

    ``right_cols`` must not collide with left column names — alias on
    the right side first (deliberate: implicit suffixing hides schema
    bugs).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {ts_col}]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")

    # The matched timestamp and ALL right payload columns travel as ONE
    # struct, and the running F.last picks the whole struct or nothing:
    # every output field is guaranteed to come from the same right row.
    # (Per-column last(ignorenulls) would stitch a 'frankenrow' when the
    # newest right row carries a NULL in one payload column — DuckDB
    # ASOF JOIN returns that row's NULL, and so do we.)
    pack = F.struct(
        F.unix_micros(F.col(ts_col)).alias(matched_ts_alias),
        *[F.col(c) for c in right_cols],
    )
    pack_type = right.select(pack.alias(_PACK)).schema[0].dataType

    left_payload = [c for c in left.columns if c not in on]
    l2 = left.select(
        *on,
        F.unix_micros(F.col(ts_col)).alias(_TS_US),
        F.lit(1).alias(_SIDE),
        *left_payload,
        F.lit(None).cast(pack_type).alias(_PACK),
    )
    r2 = right.select(
        *on,
        F.unix_micros(F.col(ts_col)).alias(_TS_US),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        pack.alias(_PACK),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(_TS_US, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l2.unionByName(r2).select(
        *on,
        F.col(_TS_US),
        F.col(_SIDE),
        *left_payload,
        F.last(_PACK, ignorenulls=True).over(w).alias(_PACK),
    )
    out = matched.filter(F.col(_SIDE) == 1)
    if tolerance_us is None:
        stale = F.lit(False)
    else:
        stale = F.col(_PACK)[matched_ts_alias] < F.col(_TS_US) - F.lit(int(tolerance_us))
    return out.select(
        *on,
        F.col(_TS_US).alias("ts_us"),
        *left_payload,
        *[
            F.when(stale, F.lit(None)).otherwise(F.col(_PACK)[c]).alias(c)
            for c in [matched_ts_alias, *right_cols]
        ],
    )
