from xxt_cdc_spark.sinks.upsert import (
    CircuitBreaker,
    ErrorClass,
    JdbcUpsertWriter,
    RetryPolicy,
    apply_batch,
    classify_error,
)

__all__ = [
    "JdbcUpsertWriter",
    "RetryPolicy",
    "CircuitBreaker",
    "ErrorClass",
    "classify_error",
    "apply_batch",
]
