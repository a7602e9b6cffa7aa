"""Registry-wide oracle dtype guard.

The correctness driver hashes raw values after sorting columns by
name — a DuckDB oracle column that materializes as float64 (e.g. an
uncast HUGEINT from a windowed SUM(BIGINT), or an integer division)
hash-mismatches a Spark int64 twin even when every value is equal.
This class caused all five driver hash failures across rounds 2–3
(q5, q10, session_stats, time_weighted_avg, sequence_packing).

The local parity harness (tests/oracle.py) canonicalizes 5.0 == 5, so
it cannot catch the class; this test checks dtypes directly: for every
column where the Spark plan's schema is integral, the DuckDB result's
pandas dtype must also be integral — unless the column actually
contains nulls (then BOTH sides surface as float64 in pandas and the
driver hash agrees).
"""

from __future__ import annotations

import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES, ORACLES
from tests.conftest import SF_DIR
from tests.oracle import duck_connection

_INTEGRAL_SPARK = {"byte", "short", "integer", "long"}


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_integral_columns_stay_integral(spark, duck, name):
    schema = QUERIES[name](spark, SF_DIR).schema
    integral = {
        f.name for f in schema.fields if f.dataType.typeName() in _INTEGRAL_SPARK
    }
    if not integral:
        pytest.skip("no integral columns in the Spark schema")
    pdf = duck.execute(ORACLES[name]).df()
    offenders = []
    for col in sorted(integral):
        assert col in pdf.columns, f"[{name}] oracle missing column {col!r}"
        s = pdf[col]
        if pd.api.types.is_integer_dtype(s.dtype):
            continue
        if s.isna().any():
            # nulls force float64 on the Spark toPandas side too; the
            # driver hash agrees in that case.
            continue
        offenders.append(f"{col}: duckdb dtype {s.dtype}")
    assert not offenders, (
        f"[{name}] oracle emits non-integral dtype where Spark emits an "
        f"integer column — add an explicit CAST(... AS BIGINT) in BOTH the "
        f"SELECT and any GROUP BY using the expression: {offenders}"
    )
