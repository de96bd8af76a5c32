"""O4 (daily schedule) semantics: interval math without Spark, plus one
Spark-backed tick over the people fixture proving the trigger chain
runs the real pipeline once per due interval.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from data_lake_construction_and_querying_with_pyspark_spark.schedule import (
    ScheduleSpec,
    Scheduler,
    due_runs,
)


def test_daily_next_run_is_interval_end():
    spec = ScheduleSpec(interval="@Daily")  # reference casing accepted
    assert spec.next_run_after(datetime(2024, 1, 1, 13, 37)) == datetime(2024, 1, 2)


def test_weekly_aligns_to_monday():
    spec = ScheduleSpec(interval="@weekly")
    assert spec.align(datetime(2024, 1, 4, 9)) == datetime(2024, 1, 1)  # Thu -> Mon


def test_unsupported_interval_rejected():
    with pytest.raises(ValueError, match="Unsupported schedule interval"):
        ScheduleSpec(interval="*/5 * * * *")


def test_due_runs_catchup_and_idempotence():
    spec = ScheduleSpec()
    # paused since Jan 1, resumed Jan 5 09:00 -> runs stamped Jan 2..4
    # are due (Jan 4's interval closed at Jan 5 00:00; Jan 5's has not).
    due = due_runs(spec, datetime(2024, 1, 1), datetime(2024, 1, 5, 9))
    assert due == [datetime(2024, 1, d) for d in (2, 3, 4)]
    # cold start: only the newest closed interval, no unbounded backfill
    assert due_runs(spec, None, datetime(2024, 1, 5, 9)) == [datetime(2024, 1, 4)]
    # nothing new since the last stamp -> no runs
    assert due_runs(spec, datetime(2024, 1, 4), datetime(2024, 1, 5, 9)) == []


def test_tick_runs_pipeline_once_per_due_interval(spark, people_dir):
    from data_lake_construction_and_querying_with_pyspark_spark import JobConfig

    cfg = JobConfig(
        file_type="csv",
        table_name="data_lake_query",
        ps_query="SELECT * FROM data_lake_query",
        input_path=f"{people_dir}/people.csv",
        output_path=f"{people_dir}/scheduled_out",
    )
    sched = Scheduler(last_run=datetime(2024, 1, 2))
    runs = sched.tick(spark, cfg, now=datetime(2024, 1, 5, 9))
    assert [r.stamp for r in runs] == [datetime(2024, 1, d) for d in (3, 4)]
    assert all(r.result.validation.total_rows > 0 for r in runs)
    assert sched.last_run == datetime(2024, 1, 4)
    # next tick same instant: watermark advanced, nothing due
    assert sched.tick(spark, cfg, now=datetime(2024, 1, 5, 9)) == []
