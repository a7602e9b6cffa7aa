from iot_etl_spark.operators.timefeatures import add_time_features
from iot_etl_spark.operators.rolling import add_rolling_features, add_lag_features
from iot_etl_spark.operators.anomaly import add_zscore_anomaly
from iot_etl_spark.operators.quality import add_quality_flags
from iot_etl_spark.operators.latest import latest_per_key
from iot_etl_spark.operators.enrich import enrich_left_join

__all__ = [
    "add_time_features",
    "add_rolling_features",
    "add_lag_features",
    "add_zscore_anomaly",
    "add_quality_flags",
    "latest_per_key",
    "enrich_left_join",
]
