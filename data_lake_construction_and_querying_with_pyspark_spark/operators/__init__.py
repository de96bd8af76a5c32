from data_lake_construction_and_querying_with_pyspark_spark.operators.validation import validate
from data_lake_construction_and_querying_with_pyspark_spark.operators.cleaning import clean

__all__ = ["validate", "clean"]
