from mapreduce_framework_api_spark.sources.readers import TABLES, table

__all__ = ["table", "TABLES"]
