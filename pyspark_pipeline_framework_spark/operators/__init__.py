"""Relational operator library.

Every operator is a lazy ``DataFrame -> DataFrame`` function (or a
thin config-dataclass wrapper over one) so pipelines compose into a
single Catalyst plan per sink — the Spark-first replacement for the
reference's SQL-string passthrough (SURVEY.md §2.5, §4).
"""

from pyspark_pipeline_framework_spark.operators.joins import (
    asof_join,
    join,
    range_join,
)
from pyspark_pipeline_framework_spark.operators.windows import (
    event_session_window,
    event_time_window,
    top_k_per_group,
)

__all__ = [
    "asof_join",
    "join",
    "range_join",
    "event_session_window",
    "event_time_window",
    "top_k_per_group",
]
