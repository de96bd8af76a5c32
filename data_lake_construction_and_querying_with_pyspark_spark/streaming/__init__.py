from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
    hourly_rollup_stream,
    sessionize_stream,
    sliding_counts_stream,
    stream_events,
)

__all__ = [
    "stream_events",
    "hourly_rollup_stream",
    "sessionize_stream",
    "sliding_counts_stream",
]
