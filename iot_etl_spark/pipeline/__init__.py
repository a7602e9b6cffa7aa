from iot_etl_spark.pipeline.batch import transform_all, run_batch_pipeline

__all__ = ["transform_all", "run_batch_pipeline"]
