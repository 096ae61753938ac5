"""pyspark_pipeline_framework_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the capability surface of
``dwsmith1983/pyspark-pipeline-framework`` (reference studied at
/root/reference, see SURVEY.md): a declarative pipeline vocabulary
(sources / transforms / sinks / quality checks / resilience /
observability / streaming) in which every relational operator is a lazy
``DataFrame -> DataFrame`` function composed into a single Catalyst plan,
plus LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Nothing here is a port of the reference's class hierarchy; the reference
defines WHAT is computed (SURVEY.md §2), Spark defines HOW.
"""

from pyspark_pipeline_framework_spark._version import __version__
from pyspark_pipeline_framework_spark.session import SparkConfig, build_session

__all__ = ["SparkConfig", "build_session", "__version__"]
