"""Batch pipeline assembly test (SURVEY.md §7.1 M4)."""

from __future__ import annotations

import os
import shutil
import tempfile

from iot_etl_spark.pipeline.batch import run_batch_pipeline
from tests.conftest import SF_DIR


def test_run_batch_pipeline_end_to_end(spark):
    tmp = tempfile.mkdtemp(prefix="iot_etl_batch_")
    try:
        audit = run_batch_pipeline(spark, SF_DIR, tmp)
        assert audit["total"] == 1000  # sf0.001 events
        assert 0 < audit["valid"] <= audit["total"]

        fact = spark.read.parquet(os.path.join(tmp, "fact_events_enriched"))
        assert fact.count() == audit["valid"]
        # date partitioning materialized (hypertable-chunk analog)
        assert "event_date" in fact.columns
        assert any(
            p.startswith("event_date=")
            for p in os.listdir(os.path.join(tmp, "fact_events_enriched"))
        )
        # fact rows all valid + stamped
        assert fact.filter(~fact.is_valid_record).count() == 0
        assert "etl_loaded_at" in fact.columns

        dim = spark.read.parquet(os.path.join(tmp, "dim_customer"))
        assert dim.count() > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
