"""Daily schedule semantics (SURVEY.md §2.6 O4).

The reference's only time-based behavior is an Airflow DAG with
``schedule_interval="@Daily"`` and the task chain ``execution_start >>
execute_lambda_function >> execution_finish`` (reference
``airflow_dag_code/data_lake_query_pyspark.py:13-19,52``). The DAG adds
no query semantics — it fires ``run_job``'s equivalent once per day —
so this module reproduces exactly the scheduling CONTRACT as engine
code, leaving the actual clock/daemon to whatever orchestrator hosts
the engine (cron, Airflow, a while-loop):

* :class:`ScheduleSpec` — ``@daily`` / ``@hourly`` / ``@weekly``
  interval descriptor with Airflow's fire-at-interval-END semantics
  (the run stamped ``2024-01-01`` executes at ``2024-01-02 00:00``).
* :func:`due_runs` — the catch-up list of interval starts whose runs
  are due between a last-run watermark and "now" (Airflow backfill
  semantics for a paused-then-resumed daily DAG).
* :func:`run_on_schedule` — executes ``run_job`` once per due interval,
  logging the reference DAG's start/finish chain around each.

Pure driver-side control flow — no Spark job runs unless a run is due.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import SparkSession

from data_lake_construction_and_querying_with_pyspark_spark.config import JobConfig
from data_lake_construction_and_querying_with_pyspark_spark.pipeline import JobResult, run_job

logger = logging.getLogger(__name__)

_INTERVALS = {
    "@hourly": timedelta(hours=1),
    "@daily": timedelta(days=1),
    "@weekly": timedelta(weeks=1),
}


@dataclass
class ScheduleSpec:
    """Reference DAG contract: name + interval (case-insensitive
    ``@Daily`` accepted verbatim from the reference)."""

    dag_id: str = "data_lake_construction_query_pyspark"
    interval: str = "@daily"

    def __post_init__(self) -> None:
        norm = self.interval.lower()
        if norm not in _INTERVALS:
            raise ValueError(
                f"Unsupported schedule interval: {self.interval!r}; "
                f"expected one of {sorted(_INTERVALS)}"
            )
        self.interval = norm

    @property
    def step(self) -> timedelta:
        return _INTERVALS[self.interval]

    def align(self, ts: datetime) -> datetime:
        """Floor ``ts`` to the interval grid (midnight for @daily,
        top-of-hour for @hourly, Monday 00:00 for @weekly)."""
        floored = ts.replace(minute=0, second=0, microsecond=0)
        if self.interval == "@hourly":
            return floored
        floored = floored.replace(hour=0)
        if self.interval == "@weekly":
            floored -= timedelta(days=floored.weekday())
        return floored

    def next_run_after(self, ts: datetime) -> datetime:
        """First execution time strictly after ``ts``: the end of the
        interval containing ``ts`` (Airflow fires when the data
        interval CLOSES)."""
        return self.align(ts) + self.step


def due_runs(spec: ScheduleSpec, last_run: datetime | None, now: datetime) -> list[datetime]:
    """Interval-start stamps whose runs are due at ``now``, strictly
    after ``last_run``'s stamp — the catch-up (backfill) list. A run
    stamped T executes at T + step, so the newest eligible stamp is
    ``align(now) - step``."""
    newest = spec.align(now) - spec.step
    start = spec.align(last_run) + spec.step if last_run is not None else newest
    out = []
    t = start
    while t <= newest:
        out.append(t)
        t += spec.step
    return out


@dataclass
class ScheduledRun:
    stamp: datetime
    result: JobResult


@dataclass
class Scheduler:
    """Driver-side trigger: tick() runs the pipeline once per due
    interval, mirroring the reference's start → execute → finish task
    chain in logs. Idempotent across ticks via the ``last_run``
    watermark (persist it wherever job state lives)."""

    spec: ScheduleSpec = field(default_factory=ScheduleSpec)
    last_run: datetime | None = None

    def tick(self, spark: SparkSession, config: JobConfig, now: datetime) -> list[ScheduledRun]:
        runs = []
        for stamp in due_runs(self.spec, self.last_run, now):
            logger.info("%s execution_start run=%s", self.spec.dag_id, stamp.isoformat())
            result = run_job(spark, config)
            logger.info("%s execution_finish run=%s", self.spec.dag_id, stamp.isoformat())
            runs.append(ScheduledRun(stamp=stamp, result=result))
            self.last_run = stamp
        return runs


def run_on_schedule(
    spark: SparkSession,
    config: JobConfig,
    last_run: datetime | None,
    now: datetime,
    spec: ScheduleSpec | None = None,
) -> list[ScheduledRun]:
    """One-shot functional face of :class:`Scheduler.tick`."""
    return Scheduler(spec=spec or ScheduleSpec(), last_run=last_run).tick(spark, config, now)
