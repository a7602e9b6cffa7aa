"""Differential tests: every registered query with an oracle must
match DuckDB exactly at sf0.001 (fast) — the same comparison the
correctness driver runs at sf0.01."""

from __future__ import annotations

import pytest

from iot_etl_spark.plans import QUERIES, ORACLES
from tests.conftest import SF_DIR
from tests.oracle import duck_connection, assert_matches_oracle


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_all_queries_return_rows(spark):
    for name, fn in QUERIES.items():
        n = fn(spark, SF_DIR).count()
        assert n >= 0, name
