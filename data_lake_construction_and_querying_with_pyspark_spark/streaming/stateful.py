"""Arbitrary stateful streaming via transformWithStateInPandas
(Spark 4's successor to applyInPandasWithState: typed state variables,
timers, TTL — the API new stateful operators should target).

``cusum_drift_alerts`` implements a per-key CUSUM drift detector — the
classic change-detection semantics no watermarked window can express:
state is the running one-sided cumulative deviation
``S ← max(0, S + (x − target))``; when S crosses the threshold the
operator emits an alert row and resets. Sequential, order-dependent,
unbounded-horizon state — exactly the shape that needs the arbitrary-
state escape hatch.

Determinism: rows are processed in (ts, event_id) order within each
micro-batch (the processor sorts its batch input), so a single-batch
drain (availableNow over one file) is fully deterministic and the
batch-twin equivalence test in tests/test_streaming.py can replay it
row-for-row in pandas. Across micro-batches the state carries over and
ordering follows batch arrival — the standard streaming contract.

Scale: state is two numbers per key, partitioned by the state-store
shuffle on the grouping key; emission is alerts-only (sparse), so
downstream sees events that matter, not the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def transform_with_state_available() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol; a container without a working ``google.protobuf``
    crashes the TWS driver worker at startup (observed:
    ``ImportError: cannot import name 'descriptor'``). Probe before
    using; tests skip when unavailable — with the EXACT import failure
    in the skip reason (``transform_with_state_unavailable_reason``),
    so the round the environment gains a working protobuf the JVM-
    backed equivalence test lights up by itself and until then the
    recorded reason names precisely what is missing. The
    applyInPandasWithState operator in ``sinks.py`` covers custom
    state without protobuf."""
    return transform_with_state_unavailable_reason() is None


def transform_with_state_unavailable_reason() -> str | None:
    """None when TWS can run; otherwise the exact import failure."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return None
    except ImportError as e:
        return f"{type(e).__name__}: {e}"


CUSUM_TARGET = 50.0  # reference level for the value stream
CUSUM_THRESHOLD = 500.0  # alert when cumulative positive drift exceeds this

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("alert_ts", T.TimestampNTZType()),
        T.StructField("cusum", T.DoubleType()),
        T.StructField("n_since_reset", T.LongType()),
    ]
)


def make_cusum_processor(
    target: float = CUSUM_TARGET, threshold: float = CUSUM_THRESHOLD
):
    """Build the CUSUM ``StatefulProcessor`` instance. Exposed as a
    factory (rather than a class nested in ``cusum_drift_alerts``) so a
    unit test can drive ``init``/``handleInputRows`` directly against a
    stub state handle — exercising the state round-trip, ``key[0]``
    extraction, alert emission, and post-alert reset without the JVM
    state server this container's missing protobuf can't start."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class CusumProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "cusum", T.StructType(
                    [T.StructField("s", T.DoubleType()), T.StructField("n", T.LongType())]
                )
            )

        def handleInputRows(self, key, rows, timerValues):
            s, n = (self._state.get() or (0.0, 0)) if self._state.exists() else (0.0, 0)
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
            alerts: list[tuple] = []
            for ts, val in zip(batch["ts"], batch["value"]):
                s = max(0.0, s + (float(val) - target))
                n += 1
                if s > threshold:
                    alerts.append((key[0], ts, s, n))
                    s, n = 0.0, 0
            self._state.update((s, n))
            if alerts:
                yield pd.DataFrame(
                    alerts, columns=["event_type", "alert_ts", "cusum", "n_since_reset"]
                )

        def close(self) -> None:
            pass

    return CusumProcessor()


def cusum_drift_alerts(
    events: DataFrame,
    target: float = CUSUM_TARGET,
    threshold: float = CUSUM_THRESHOLD,
) -> DataFrame:
    """Per-event-type CUSUM alerts over the ``value`` column.

    Emits one row per threshold crossing: the event's timestamp, the
    cumulative sum at crossing, and how many events accumulated since
    the last reset. State (S, n) lives in a typed ValueState.
    """
    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=make_cusum_processor(target, threshold),
        outputStructType=ALERT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def cusum_reference(rows: list[tuple], target: float, threshold: float) -> list[tuple]:
    """Pure-python replay of the CUSUM semantics for equivalence tests:
    rows = [(event_type, ts, value)] in any order; returns alert tuples
    (event_type, alert_ts, cusum, n_since_reset) with rows processed in
    (ts, event_id-free) sorted order per key — callers pre-sort."""
    out: list[tuple] = []
    state: dict[str, tuple[float, int]] = {}
    for etype, ts, val in rows:
        s, n = state.get(etype, (0.0, 0))
        s = max(0.0, s + (float(val) - target))
        n += 1
        if s > threshold:
            out.append((etype, ts, s, n))
            s, n = 0.0, 0
        state[etype] = (s, n)
    return out
