"""Command-line entry points (the reference's runnable-script surface:
``run_batch_pipeline.py``, ``spark_streaming_consumer.py``, and ad-hoc
warehouse SQL — SURVEY.md §3).

    python -m iot_etl_spark query <name> [--sf-dir DIR] [-n ROWS]
    python -m iot_etl_spark explain <name> [--sf-dir DIR]
    python -m iot_etl_spark list
    python -m iot_etl_spark batch --out DIR [--sf-dir DIR]
    python -m iot_etl_spark sql "SELECT ..." [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from iot_etl_spark.session import get_spark

    return get_spark(app_name="iot_etl_spark_cli")


def main(argv: list[str] | None = None) -> int:
    from iot_etl_spark.sources.tables import DEFAULT_SF_DIR

    p = argparse.ArgumentParser(prog="iot_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run a named registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    q.add_argument("-n", type=int, default=20, help="rows to show")

    e = sub.add_parser(
        "explain", help="print a query's formatted physical plan"
    )
    e.add_argument("name")
    e.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    sub.add_parser("list", help="list registry queries")

    b = sub.add_parser("batch", help="run the batch ETL pipeline")
    b.add_argument("--out", required=True)
    b.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    s = sub.add_parser("sql", help="run SQL over the registered views")
    s.add_argument("statement")
    s.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    s.add_argument("-n", type=int, default=20)

    a = p.parse_args(argv)

    from iot_etl_spark.plans import registry  # populates QUERIES

    if a.cmd == "list":
        for name in sorted(registry.QUERIES):
            print(name)
        return 0

    if a.cmd in ("query", "explain") and a.name not in registry.QUERIES:
        print(f"unknown query {a.name!r}; see `list`", file=sys.stderr)
        return 2

    spark = _spark()
    if a.cmd == "query":
        registry.QUERIES[a.name](spark, a.sf_dir).show(a.n, truncate=False)
    elif a.cmd == "explain":
        registry.QUERIES[a.name](spark, a.sf_dir).explain("formatted")
    elif a.cmd == "batch":
        from iot_etl_spark.pipeline.batch import run_batch_pipeline

        run_batch_pipeline(spark, a.sf_dir, a.out)
    elif a.cmd == "sql":
        from iot_etl_spark.sources.tables import register_views

        register_views(spark, a.sf_dir)
        spark.sql(a.statement).show(a.n, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
