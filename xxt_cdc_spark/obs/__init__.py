from xxt_cdc_spark.obs.metrics import CDCMetricsListener, HealthCheck, MetricsSnapshot

__all__ = ["CDCMetricsListener", "HealthCheck", "MetricsSnapshot"]
