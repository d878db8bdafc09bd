from mapreduce_framework_api_spark.sources.readers import TABLES, parallelized, table

__all__ = ["table", "TABLES", "parallelized"]
