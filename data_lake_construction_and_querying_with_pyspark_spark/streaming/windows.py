"""Structured Streaming operators (SURVEY.md §7 Phase 3e).

The reference's only notion of time is the daily Airflow trigger
(``airflow_dag_code/data_lake_query_pyspark.py:16``); this module adds
true event-time processing: watermarked tumbling/sliding windows and
session windows over the events stream. Each aggregation reuses the
SAME expressions as its batch twin in ``operators/timeseries.py`` —
run both on the same data and the results agree, which is exactly how
tests/test_streaming.py checks them (file source + availableNow
trigger → deterministic finite stream).

Scale notes: watermark bounds state (late rows beyond 1 hour are
dropped, state for closed windows is evicted); session windows use
Spark's native session_window state merging. State store partitioning
follows ``spark.sql.shuffle.partitions`` — size it to executor count
on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lake_construction_and_querying_with_pyspark_spark.registry import register

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based events stream (parquet dir with µs timestamps —
    convert the driver's ns fixture once via sources.read_events +
    write before streaming it)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of operators/timeseries.events_hourly_rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of events_sliding_windows (1h window, 30m slide)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Native session windows (30-min inactivity gap) per user — the
    streaming counterpart of the batch gaps-and-islands sessionization.
    Spark merges overlapping session state across triggers."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


@register(
    "streaming_hourly_rollup",
    doc="Structured Streaming hourly rollup drained via availableNow (rows-only).",
)
def streaming_hourly_rollup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable streaming entry (rows-only): materialize the
    events table with µs timestamps, run the watermarked hourly rollup
    as a real Structured Streaming query (file source → availableNow →
    memory sink), return the drained result. Emits every window the
    final watermark closed; the batch twin (`events_hourly_rollup`) is
    the oracle-checked path."""
    import tempfile

    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    staging = tempfile.mkdtemp(prefix="stream_events_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(staging)
    return run_to_completion(
        hourly_rollup_stream(stream_events(spark, staging)),
        query_name="streaming_hourly_rollup_result",
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str = "stream_test", output_mode: str = "append"
) -> DataFrame:
    """Drain a finite file stream (availableNow) into an in-memory table
    and return it as a DataFrame — the one shared test/verification
    drain. ``output_mode`` defaults to append (valid for every query
    shape, emits exactly the watermark-closed results); pass
    ``"complete"`` explicitly for an aggregation where the full result
    table is wanted each trigger."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def dedup_stream_within_watermark(
    events: DataFrame, id_cols: tuple[str, ...] = ("event_id",), watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's dedup state only
    until the watermark passes it, so state size tracks the watermark
    horizon — not the whole stream's key cardinality, which is what
    plain streaming ``dropDuplicates`` would hold forever (fatal for a
    continuously-ingesting lake). The streaming face of the dedup
    ladder's first rung (``operators/dedup.py``)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(id_cols))


def enrich_stream_static(events: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static join: every micro-batch joins against the (batch)
    dimension — stateless on the stream side, broadcast per batch.
    The standard streaming enrichment pattern (events × user dim)."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on, how)


def click_purchase_join_stream(
    events: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked stream-stream interval join — the streaming twin of
    ``operators.events_analytics.events_click_purchase_pairs``: every
    purchase within ``horizon`` of a same-user click. Both sides carry
    watermarks and the join condition bounds purchase_ts to a finite
    interval after click_ts, so Spark can evict click state once the
    purchase-side watermark passes click_ts + horizon — bounded state,
    the property that keeps a stream-stream join alive on an unbounded
    stream. Inner-join matches emit as soon as both sides arrive (no
    watermark holdback on emission)."""
    from pyspark.sql import functions as F

    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
