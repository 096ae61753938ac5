from pyspark_pipeline_framework_spark.plans.config import (
    ComponentConfig,
    PipelineConfig,
    PipelineValidationError,
)
from pyspark_pipeline_framework_spark.plans.registry import OperatorRegistry, default_registry
from pyspark_pipeline_framework_spark.plans.result import (
    ComponentResult,
    ComponentStatus,
    PipelineResult,
    PipelineStatus,
)
from pyspark_pipeline_framework_spark.plans.runner import PipelineRunner

__all__ = [
    "ComponentConfig",
    "PipelineConfig",
    "PipelineValidationError",
    "OperatorRegistry",
    "default_registry",
    "ComponentResult",
    "ComponentStatus",
    "PipelineResult",
    "PipelineStatus",
    "PipelineRunner",
]
