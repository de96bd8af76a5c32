"""E2E pipeline tests — the reference-faithful construct-and-query path
(SURVEY.md §5 rebuild strategy), with every §2.8 quirk pinned.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark import JobConfig, run_job
from tests.conftest import SF_SMOKE

FLAGSHIP = (
    "SELECT * FROM data_lake_query WHERE `Date of birth` "
    "BETWEEN '2000-01-01' AND '2024-12-31'"
)


def _cfg(people_dir, tmp_path, file_type="csv", **kw):
    src = f"{people_dir}/people.csv" if file_type == "csv" else f"{people_dir}/people.parquet"
    return JobConfig(
        file_type=file_type,
        table_name="data_lake_query",
        ps_query=FLAGSHIP,
        input_path=src,
        output_path=str(tmp_path / "out"),
        **kw,
    )


def test_csv_path_all_string_schema(spark, people_dir, tmp_path):
    """S1: CSV scan with header and no inference — every column string."""
    res = run_job(spark, _cfg(people_dir, tmp_path))
    src_types = dict(res.result_df.dtypes)
    assert set(src_types.values()) == {"string"}


def test_validation_metrics(spark, people_dir, tmp_path):
    """A1-A4 as asserted invariants: fixture plants 20 exact dups and
    nulls in Phone/Email."""
    res = run_job(spark, _cfg(people_dir, tmp_path))
    v = res.validation
    assert v.total_rows == 1020
    assert v.duplicate_rows == 20
    assert v.column_count == 9
    assert v.null_counts["Phone"] > 0
    assert v.null_counts["Email"] > 0
    assert v.null_counts["Index"] == 0


def test_clean_order_impute_before_drop(spark, people_dir, tmp_path):
    """§2.8.2: Phone nulls become 'Unknown' (survive), Email nulls drop
    the row."""
    res = run_job(spark, _cfg(people_dir, tmp_path))
    cleaned = spark.table("data_lake_query")
    assert cleaned.filter(F.col("Phone") == "Unknown").count() > 0
    assert cleaned.filter(F.col("Email").isNull()).count() == 0
    # dedup: no duplicate full rows remain
    assert cleaned.count() == cleaned.distinct().count()


def test_view_before_transform_quirk(spark, people_dir, tmp_path):
    """§2.8.1: the SQL query sees the cleaned view WITHOUT the age
    column; the transformed frame carries it."""
    res = run_job(spark, _cfg(people_dir, tmp_path))
    assert "age" not in res.result_df.columns
    assert "age" in res.transformed_df.columns
    assert res.transformed_df.filter(F.col("age") <= 30).count() == 0


def test_reference_unfaithful_mode(spark, people_dir, tmp_path):
    """reference_faithful=False runs the evident intent: query sees age."""
    res = run_job(spark, _cfg(people_dir, tmp_path, reference_faithful=False))
    assert "age" in res.result_df.columns


def test_string_between_is_lexicographic(spark, people_dir, tmp_path):
    """§2.8.4: BETWEEN on the string date column, no silent cast."""
    res = run_job(spark, _cfg(people_dir, tmp_path))
    dobs = [r["Date of birth"] for r in res.result_df.select("Date of birth").collect()]
    assert dobs and all("2000-01-01" <= d <= "2024-12-31" for d in dobs)


def test_format_flip_csv_to_parquet(spark, people_dir, tmp_path):
    """§2.8.6: CSV input → snappy parquet output."""
    res = run_job(spark, _cfg(people_dir, tmp_path))
    assert res.output_format == "parquet"
    back = spark.read.parquet(res.output_path)
    assert back.count() == res.result_df.count()


def test_format_flip_parquet_to_csv(spark, people_dir, tmp_path):
    """§2.8.6 reverse: parquet input → headered CSV output; parquet path
    keeps the typed Index column until the all-string CSV sink."""
    res = run_job(spark, _cfg(people_dir, tmp_path, file_type="parquet"))
    assert res.output_format == "csv"
    assert dict(res.result_df.dtypes)["Index"] == "bigint"
    back = spark.read.option("header", True).csv(res.output_path)
    assert back.count() == res.result_df.count()


def test_case_insensitive_resolution(spark, people_dir, tmp_path):
    """§2.8.3: `Date of Birth` resolves against header `Date of birth`."""
    res = run_job(spark, _cfg(people_dir, tmp_path))
    # derive_age referenced "Date of Birth" (capital B) and succeeded:
    assert "age" in res.transformed_df.columns


def test_unsupported_format_errors(spark, people_dir, tmp_path):
    cfg = _cfg(people_dir, tmp_path)
    cfg.file_type = "avro"
    with pytest.raises(ValueError, match="Unsupported file type"):
        run_job(spark, cfg)


def test_partitioned_output(spark, people_dir, tmp_path):
    """Engine extension: date-partitioned lake output (docx §8 rec)."""
    import os

    cfg = _cfg(people_dir, tmp_path, partition_by=["Sex"])
    res = run_job(spark, cfg)
    parts = [p for p in os.listdir(res.output_path) if p.startswith("Sex=")]
    assert sorted(parts) == ["Sex=Female", "Sex=Male"]


def test_observed_metrics_ride_the_write_action(spark, tmp_path):
    """attach_observed_metrics must deliver exact rows/null counts
    (matching the standalone validate() pass) as a side effect of the
    sink write — no separate validation job."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.validation import (
        attach_observed_metrics,
        validate,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    ev = load_table(spark, SF_SMOKE, "events").limit(500)
    ev = ev.withColumn(
        "event_type", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("event_type"))
    )
    observed, obs = attach_observed_metrics(ev)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))

    report = validate(ev)
    got = obs.get
    assert got["total_rows"] == report.total_rows
    for c in ev.columns:
        assert got[f"nulls__{c}"] == report.null_counts[c], c
    # sketch sanity: within 5% of the exact distinct count
    assert abs(got["approx_distinct_rows"] - report.distinct_rows) <= 0.05 * report.distinct_rows
