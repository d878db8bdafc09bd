from mapreduce_framework_api_spark.compat.mapreduce import MapReduceJob, mr_create

__all__ = ["MapReduceJob", "mr_create"]
