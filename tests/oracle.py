"""Local replica of the driver's DuckDB-oracle differential check.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (views pre-registered over the same
parquet), then compares row count + schema + order-insensitive value
hash. This harness reproduces that comparison so parity is verified
*before* the driver sees the code.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from iot_etl_spark.schemas import STAR_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == int(v) and abs(v) < 1e15:
            # -0.0 == 0 but the driver's byte hash distinguishes them
            # (the round-7 theilsen escape) — keep the sign visible so
            # this harness is at least as strict as the driver.
            if v == 0.0 and math.copysign(1.0, v) < 0.0:
                return "-0"
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def negzero_columns(df: pd.DataFrame) -> list[str]:
    """Float columns containing a literal -0.0 — fragile output even
    when both engines agree today, because any plan change can flip
    one side's zero sign and break the driver's byte hash."""
    import numpy as np

    hits = []
    for c in df.columns:
        v = df[c]
        if v.dtype.kind == "f" and bool((np.signbit(v.values) & (v.values == 0.0)).any()):
            hits.append(c)
    return hits


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    actual = spark_df.toPandas()
    expected = con.execute(sql).df()
    nz = sorted(set(negzero_columns(actual)) | set(negzero_columns(expected)))
    assert not nz, (
        f"[{name}] -0.0 present in columns {nz}: normalize with `+ 0.0` on "
        f"both sides (see theilsen_trend_recent)"
    )
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"[{name}] column mismatch: spark={sorted(actual.columns)} "
        f"oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"[{name}] row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    a_rows = canonical_rows(actual)
    e_rows = canonical_rows(expected)
    if a_rows != e_rows:
        diffs = [(a, e) for a, e in zip(a_rows, e_rows) if a != e][:5]
        raise AssertionError(f"[{name}] value mismatch; first diffs: {diffs}")
