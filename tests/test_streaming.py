"""Streaming ↔ batch equivalence: a drained finite stream must produce
exactly the batch results for every window the final watermark closed;
only still-open tail windows (within the 1 h watermark of max event
time) may be withheld.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_us_dir(spark, tmp_path_factory):
    """The driver fixture has ns timestamps; materialize a µs-timestamp
    copy once for the file stream source."""
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def max_ts(spark, events_us_dir):
    return spark.read.parquet(events_us_dir).agg(F.max("ts")).first()[0]


def _drain(stream_df, name):
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        run_to_completion,
    )

    return run_to_completion(stream_df, query_name=name)


def test_hourly_rollup_stream_matches_batch(spark, events_us_dir, max_ts):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.timeseries import (
        events_hourly_rollup,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        hourly_rollup_stream,
        stream_events,
    )

    streamed = _drain(
        hourly_rollup_stream(stream_events(spark, events_us_dir, max_files_per_trigger=1)),
        "hourly_stream",
    )
    batch = events_hourly_rollup(spark, SF_SMOKE)
    # Nothing streamed that batch doesn't have:
    assert streamed.exceptAll(batch).count() == 0
    # Batch rows missing from the stream are exactly the windows the
    # final watermark (max_ts - 1h) hadn't closed (window_end > wm):
    missing = batch.exceptAll(streamed)
    wm = F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
    not_tail = missing.filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= wm)
    assert not_tail.count() == 0
    assert streamed.count() > 0


def test_session_stream_matches_batch_closed_sessions(spark, events_us_dir, max_ts):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.timeseries import (
        events_user_sessions,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        sessionize_stream,
        stream_events,
    )

    sessions = _drain(
        sessionize_stream(stream_events(spark, events_us_dir)), "session_stream"
    )
    assert sessions.count() > 0
    assert sessions.filter(F.col("session_end") < F.col("session_start")).count() == 0

    # Spark's session_window end = last_event + gap; the batch twin
    # reports session_end = last event ts. Align and compare the
    # watermark-closed subset exactly.
    wm = F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
    streamed_closed = sessions.select(
        "user_id",
        F.col("session_start"),
        (F.col("session_end") - F.expr("INTERVAL 30 MINUTES")).alias("last_event"),
        "n_events",
    ).filter(F.col("session_end") <= wm)
    batch = events_user_sessions(spark, SF_SMOKE).select(
        "user_id",
        F.col("session_start"),
        F.col("session_end").alias("last_event"),
        "n_events",
    )
    assert streamed_closed.count() > 0
    assert streamed_closed.exceptAll(batch).count() == 0


def test_streaming_dedup_within_watermark(spark, events_us_dir, tmp_path):
    """A stream fed duplicated events must emit each event exactly once
    (duplicates arrive inside the watermark window and are dropped with
    bounded state)."""
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        dedup_stream_within_watermark,
        stream_events,
    )

    dup_dir = str(tmp_path / "dup_events")
    base_dir = str(tmp_path / "base_events")
    # Materialize the sample once: limit() without an ordering is
    # non-deterministic per execution, so unioning the same lazy plan
    # twice could duplicate DIFFERENT row sets.
    spark.read.parquet(events_us_dir).limit(1000).write.parquet(base_dir)
    base = spark.read.parquet(base_dir)
    base.unionAll(base).write.mode("overwrite").parquet(dup_dir)

    deduped = _drain(
        dedup_stream_within_watermark(stream_events(spark, dup_dir)), "dedup_stream"
    )
    assert deduped.count() == 1000
    assert deduped.select("event_id").distinct().count() == 1000


def test_stream_static_enrichment_matches_batch_join(spark, events_us_dir):
    """Stream-static join result must equal the batch join row-for-row
    (stateless enrichment; the static side broadcasts per micro-batch)."""
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        enrich_stream_static,
        stream_events,
    )

    dim = spark.createDataFrame(
        [(t,) for t in ["click", "view", "purchase"]], "event_type string"
    ).withColumn("boost", F.length("event_type"))
    streamed = _drain(
        enrich_stream_static(
            stream_events(spark, events_us_dir, max_files_per_trigger=1), dim, "event_type"
        ).select("event_id", "event_type", "boost"),
        "enriched_stream",
    )
    batch = (
        spark.read.parquet(events_us_dir)
        .join(dim, "event_type")
        .select("event_id", "event_type", "boost")
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_stream_join_matches_batch(spark, events_us_dir):
    """The watermarked stream-stream interval join, drained in one
    availableNow micro-batch, must emit exactly the batch twin's
    attribution pairs (inner joins emit on match — no tail windows to
    exclude)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.events_analytics import (
        events_click_purchase_pairs,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        click_purchase_join_stream,
        stream_events,
    )

    streamed = _drain(
        click_purchase_join_stream(stream_events(spark, events_us_dir)),
        "click_purchase_stream",
    )
    batch = events_click_purchase_pairs(spark, SF_SMOKE)
    assert streamed.count() > 0
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_cusum_alerts_match_reference_replay(spark, tmp_path_factory):
    """transformWithStateInPandas CUSUM drift detector: a single-file
    availableNow drain must emit exactly the alerts a pure-python
    replay of the CUSUM recursion produces over the same rows in
    (ts, event_id) order — state carried per event_type, reset on each
    threshold crossing. Skips where the TWS protobuf protocol has no
    working google.protobuf (this container)."""
    from pyspark.sql import types as T

    from data_lake_construction_and_querying_with_pyspark_spark.streaming.stateful import (
        transform_with_state_available,
    )

    if not transform_with_state_available():
        from data_lake_construction_and_querying_with_pyspark_spark.streaming.stateful import (
            transform_with_state_unavailable_reason,
        )

        pytest.skip(
            "transformWithState state server cannot start — "
            f"{transform_with_state_unavailable_reason()}"
        )

    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.stateful import (
        CUSUM_TARGET,
        CUSUM_THRESHOLD,
        cusum_drift_alerts,
        cusum_reference,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        run_to_completion,
    )

    d = str(tmp_path_factory.mktemp("events_cusum"))
    ev = load_table(spark, SF_SMOKE, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(d)  # one file → one batch

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(d)
    got = run_to_completion(cusum_drift_alerts(stream), query_name="cusum_alerts").collect()

    rows = [
        (r["event_type"], r["ts"], r["value"])
        for r in ev.select("event_type", "ts", "value", "event_id")
        .orderBy("ts", "event_id")
        .collect()
    ]
    want = cusum_reference(rows, CUSUM_TARGET, CUSUM_THRESHOLD)

    got_t = sorted((r["event_type"], r["alert_ts"], round(r["cusum"], 9), r["n_since_reset"]) for r in got)
    want_t = sorted((e, ts, round(s, 9), n) for e, ts, s, n in want)
    assert len(got_t) > 0  # the fixture actually drifts past the threshold
    assert got_t == want_t


def test_cusum_processor_direct_drive_with_stub_state():
    """Drive CusumProcessor.init/handleInputRows directly with a stub
    state handle — no JVM state server, so this runs even where
    protobuf blocks transformWithState. Exercises: state round-trip
    (carry-over between calls), key[0] extraction, alert emission at
    the crossing row, and the post-alert (s, n) reset."""
    import pandas as pd

    from data_lake_construction_and_querying_with_pyspark_spark.streaming.stateful import (
        cusum_reference,
        make_cusum_processor,
    )

    class StubValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class StubHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, StubValueState())

    proc = make_cusum_processor(target=50.0, threshold=100.0)
    handle = StubHandle()
    proc.init(handle)

    def drive(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_id", "value"])
        out = list(proc.handleInputRows(("click",), iter([pdf]), None))
        return [tuple(r) for df in out for r in df.itertuples(index=False)]

    # batch 1: +60 drift twice → crosses 100 on the second row, resets
    got1 = drive([(1, 1, 110.0), (2, 2, 110.0)])
    assert got1 == [("click", 2, 120.0, 2)]
    assert handle.states["cusum"].get() == (0.0, 0)  # reset persisted

    # batch 2: state carries across calls — 70 then 40 more crosses again
    got2 = drive([(3, 3, 120.0)])
    assert got2 == []
    assert handle.states["cusum"].get() == (70.0, 1)
    got3 = drive([(4, 4, 90.0)])
    assert got3 == [("click", 4, 110.0, 2)]

    # unsorted batch input is processed in (ts, event_id) order,
    # matching the pure-python reference replay on the sorted rows
    proc2 = make_cusum_processor(target=50.0, threshold=100.0)
    h2 = StubHandle()
    proc2.init(h2)
    rows = [(5, 9, 120.0), (3, 1, 10.0), (4, 2, 140.0)]
    pdf = pd.DataFrame(rows, columns=["ts", "event_id", "value"])
    out = list(proc2.handleInputRows(("view",), iter([pdf]), None))
    got = [tuple(r) for df in out for r in df.itertuples(index=False)]
    want = cusum_reference(
        [("view", ts, v) for ts, _, v in sorted(rows)], 50.0, 100.0
    )
    assert got == [(e, ts, s, n) for e, ts, s, n in want]
