from pyspark_pipeline_framework_spark.io.readers import (
    STAR_TABLES,
    Catalog,
    load_star,
    read_source,
    table,
)
from pyspark_pipeline_framework_spark.io.writers import write_sink

__all__ = ["STAR_TABLES", "Catalog", "load_star", "read_source", "table", "write_sink"]
