"""Named query library.

Each query is registered with a builder ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) a DuckDB-compatible oracle SQL string over
the pre-registered views ``region nation customer supplier part orders
lineitem events documents embeddings``. Column names and rounding are
kept identical on both sides — the correctness driver hashes values
after sorting columns by name.

Importing this package populates the registry.
"""

from iot_etl_spark.plans.registry import QUERIES, ORACLES, query

# registration side-effects
from iot_etl_spark.plans import queries_tpch  # noqa: F401
from iot_etl_spark.plans import queries_events  # noqa: F401
from iot_etl_spark.plans import queries_text  # noqa: F401
from iot_etl_spark.plans import queries_embed  # noqa: F401
from iot_etl_spark.plans import queries_corpus  # noqa: F401
from iot_etl_spark.plans import queries_stream  # noqa: F401
from iot_etl_spark.plans import queries_warehouse  # noqa: F401

__all__ = ["QUERIES", "ORACLES", "query"]
