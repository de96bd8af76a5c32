"""Streaming lake-sink tests: foreachBatch ingestion and custom
stateful operators, driven as real streaming queries (availableNow).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_us_dir(spark, tmp_path_factory):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    d = str(tmp_path_factory.mktemp("events_sink_src"))
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    return d


def test_foreach_batch_ingests_lake(spark, events_us_dir, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        foreach_batch_dedup_append,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        stream_events,
    )

    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_dedup_append(
        stream_events(spark, events_us_dir, max_files_per_trigger=1),
        lake_path=lake,
        checkpoint_path=ckpt,
        dedup_cols=["event_id"],
        register_as="ingested_events",
    )
    q.awaitTermination()
    src_n = spark.read.parquet(events_us_dir).count()
    lake_df = spark.read.parquet(lake)
    assert lake_df.count() == src_n
    assert "_ingest_batch_id" in lake_df.columns
    # the registered view is queryable by the normal SQL surface
    # (global_temp: foreachBatch runs in a cloned session)
    assert (
        spark.sql("SELECT COUNT(DISTINCT event_id) FROM global_temp.ingested_events").first()[0]
        == src_n
    )

    # restart on the same checkpoint: no new input → no duplicate appends
    q2 = foreach_batch_dedup_append(
        stream_events(spark, events_us_dir, max_files_per_trigger=1),
        lake_path=lake,
        checkpoint_path=ckpt,
        dedup_cols=["event_id"],
    )
    q2.awaitTermination()
    assert spark.read.parquet(lake).count() == src_n


def test_stateful_running_counts(spark, events_us_dir):
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        stateful_running_counts,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        stream_events,
    )

    out = stateful_running_counts(stream_events(spark, events_us_dir, max_files_per_trigger=1))
    q = (
        out.writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = spark.table("running_counts")
    # final lifetime count per user == batch count (single batch file)
    final = res.groupBy("user_id").agg(F.max("lifetime_events").alias("lifetime"))
    expected = (
        spark.read.parquet(events_us_dir).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    joined = final.join(expected, "user_id")
    assert joined.filter(F.col("lifetime") != F.col("n")).count() == 0
    assert final.count() == expected.count()
