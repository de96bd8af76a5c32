from data_lake_construction_and_querying_with_pyspark_spark.functions.vectorized import (
    centroids_by_label,
    cosine_to_query_pandas,
    quality_score_pandas,
)

__all__ = ["quality_score_pandas", "cosine_to_query_pandas", "centroids_by_label"]
