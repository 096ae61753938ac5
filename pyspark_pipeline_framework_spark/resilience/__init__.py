from pyspark_pipeline_framework_spark.resilience.retry import RetryPolicy, RetryExecutor, with_retry
from pyspark_pipeline_framework_spark.resilience.circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerOpenError,
    CircuitState,
)
from pyspark_pipeline_framework_spark.resilience.presets import (
    AGGRESSIVE,
    CONSERVATIVE,
    DEFAULT,
    NO_RETRY,
    ResiliencePolicy,
)

__all__ = [
    "RetryPolicy",
    "RetryExecutor",
    "with_retry",
    "CircuitBreaker",
    "CircuitBreakerOpenError",
    "CircuitState",
    "ResiliencePolicy",
    "NO_RETRY",
    "DEFAULT",
    "AGGRESSIVE",
    "CONSERVATIVE",
]
