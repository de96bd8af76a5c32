"""Time-series / event-stream operators (batch side).

The reference has no notion of event time (its only clock is the daily
Airflow schedule — ``airflow_dag_code/data_lake_query_pyspark.py:16``);
these operators extend the engine with the tumbling/sliding windowed
aggregations a lake of event streams needs. The same ``F.window``
expressions run unchanged under Structured Streaming (see
``streaming/``) — batch here doubles as the correctness oracle for the
streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation per event type. In
    streaming mode the identical expression runs with a watermark; the
    window struct's start field is projected out for a flat schema."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "events_sliding_windows",
    oracle="""
    WITH buckets AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, event_id FROM events
    ), windows AS (
        SELECT b AS window_start, event_id FROM buckets
        UNION ALL
        SELECT b - INTERVAL '30 minutes' AS window_start, event_id FROM buckets
    )
    SELECT window_start, COUNT(event_id) AS n_events
    FROM windows GROUP BY window_start
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide) event counts — each
    event lands in exactly two windows; oracle derives the same
    assignment from 30-minute buckets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "events_user_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via the gaps-and-islands
    window pattern — one shuffle on user_id, no Python in the loop.
    The streaming twin is ``F.session_window`` (streaming/ module)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # Microsecond-exact gap via interval comparison — the same shape as
    # the oracle's `ts - LAG(ts) > INTERVAL '30 minutes'`. Works for both
    # TIMESTAMP and TIMESTAMP_NTZ `ts` (the nanos parquet column lands as
    # NTZ on current Spark, where unix_micros would not resolve), and
    # avoids the cast-to-long path that truncates to seconds.
    is_new = (
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select("user_id", "ts", "event_id", is_new.alias("is_new")).select(
        "user_id", "ts", F.sum("is_new").over(wsum).cast("bigint").alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


_CUSUM_TARGET = 50.0
_CUSUM_THRESHOLD = 500.0


@register(
    "events_cusum_drift",
    oracle=f"""
    WITH dev AS (
        SELECT event_type, ts, event_id,
               CAST(SUM(CAST(value - {_CUSUM_TARGET} AS DECIMAL(18,4))) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(28,4)) AS prefix
        FROM events
    ),
    s AS (
        SELECT event_type, ts, event_id,
               CASE WHEN minp < 0 THEN prefix - minp ELSE prefix END AS cusum
        FROM (SELECT event_type, ts, event_id, prefix,
                     MIN(prefix) OVER (
                         PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minp
              FROM dev)
    )
    SELECT event_type, ts, event_id, CAST(cusum AS DOUBLE) AS cusum
    FROM s WHERE cusum > {_CUSUM_THRESHOLD}
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CUSUM drift detection per event type: emit every event
    where the one-sided cumulative deviation of ``value`` above the
    target level exceeds the threshold. Uses the reset-free CUSUM
    closed form — ``S_i = prefix_i − min(0, min_{j≤i} prefix_j)`` —
    which turns the sequential recursion into two window passes, so
    the whole detector is expressible declaratively (the resetting
    variant needs true sequential state: that is
    ``streaming/stateful.py::cusum_drift_alerts``).

    Determinism: deviations quantize to DECIMAL(18,4) before the
    windowed prefix sum, so the running sums are exact and engine
    segment-tree vs incremental window accumulation cannot diverge;
    the threshold compares decimals, and only the reported score casts
    to double.

    Scale shape: the inclusive (sum, min) scans are two-phase
    segmented — the corpus_quality `_segmented_prefix` trick extended
    from exclusive sums to the inclusive sum + running-min pair a
    CUSUM needs. Events window within (event_type, day) — a prefix of
    the (ts, event_id) sort, so segment-major ≡ per-type global order
    — while the bounded per-(type, day) frame (Σdev, min-of-in-segment
    -prefix) cumulates into broadcast exclusive offsets (off, and the
    running min of off + segmin). Then prefix = off + in-segment
    prefix, and minp = least(min over earlier segments, off +
    in-segment running min) — exact decimal identities, so the global
    -window DuckDB oracle is the proof. A window partitioned by
    event_type alone (a handful of values) would scan each type's
    entire history in ONE task at 100 TB; segments bound a task at one
    (type, day).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    dev = (F.col("value") - F.lit(_CUSUM_TARGET)).cast("decimal(18,4)")
    # Decimal-safety notes (both measured as 1e-13 drift before fixing):
    # keep the prefix at DECIMAL(28,4) so the subtraction can widen one
    # digit (at 38 DuckDB falls back to DOUBLE), and express the
    # min(0, ·) clamp as CASE — DuckDB 1.0's LEAST promotes decimal
    # arguments to DOUBLE (Spark's least keeps decimal and skips the
    # NULL the first segment's empty-frame min produces).
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        dev.alias("dev"),
        F.date_trunc("day", F.col("ts")).alias("_seg"),
    )
    w_in = (
        Window.partitionBy("event_type", "_seg")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg1 = base.withColumn("p_in", F.sum("dev").over(w_in).cast("decimal(28,4)"))
    seg2 = seg1.withColumn("m_in", F.min("p_in").over(w_in))
    aggs = seg1.groupBy("event_type", "_seg").agg(
        F.sum("dev").alias("segsum"), F.min("p_in").alias("segmin")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = aggs.withColumn(
        "_off", F.coalesce(F.sum("segsum").over(w_off), F.lit(0)).cast("decimal(28,4)")
    ).withColumn("_gmin_before", F.min(F.col("_off") + F.col("segmin")).over(w_off))
    joined = seg2.join(
        F.broadcast(offs.select("event_type", "_seg", "_off", "_gmin_before")),
        ["event_type", "_seg"],
    )
    prefix = (F.col("_off") + F.col("p_in")).cast("decimal(28,4)")
    minp = F.least(F.col("_gmin_before"), F.col("_off") + F.col("m_in"))
    cusum = F.when(minp < 0, prefix - minp).otherwise(prefix)
    return (
        joined.select("event_type", "ts", "event_id", cusum.alias("cusum"))
        .filter(F.col("cusum") > _CUSUM_THRESHOLD)
        .select("event_type", "ts", "event_id", F.col("cusum").cast("double").alias("cusum"))
    )


@register(
    "events_gap_fill_resample",
    oracle="""
    WITH hourly AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT event_type, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
        FROM hourly GROUP BY 1
    ), grid AS (
        SELECT event_type, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS bucket_start
        FROM spans
    )
    SELECT g.event_type, g.bucket_start,
           COALESCE(h.n_events, 0) AS n_events,
           LAST_VALUE(h.total_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN hourly h
      ON g.event_type = h.event_type AND g.bucket_start = h.bucket_start
    """,
)
def events_gap_fill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with gap filling: hourly buckets per
    event type, missing hours materialized (count 0) via a
    sequence+explode time grid, and the value column forward-filled
    with last-observation-carried-forward (``F.last`` ignorenulls over
    an unbounded-preceding frame). The standard densify step before
    charting/feature-extraction over irregular event streams.

    Scale note: the LOCF window partitions by event_type, so one series'
    whole history sorts in one task; for multi-year spans at 100 TB,
    pre-fill per (event_type, month) segments then stitch boundaries —
    the grid/join/coalesce stages are already fully parallel."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select("event_type", F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )
    spans = hourly.groupBy("event_type").agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket_start"),
    )
    locf = Window.partitionBy("event_type").orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return grid.join(hourly, ["event_type", "bucket_start"], "left").select(
        "event_type",
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("total_value", ignorenulls=True).over(locf).alias("filled_value"),
    )
