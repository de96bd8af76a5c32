"""JobConfig loading — the reference's config contract (FIXTURES.md §2):
a reference user's data_lake_config.json must load unchanged.
"""

from __future__ import annotations

import json

import pytest

from data_lake_construction_and_querying_with_pyspark_spark import JobConfig


REFERENCE_CONFIG = {
    "file_type": "parquet",
    "table_name": "data_lake_query",
    "ps_query": (
        "SELECT * FROM data_lake_query WHERE `Date of birth` "
        "BETWEEN '2000-01-01' AND '2024-12-31'"
    ),
}


def test_reference_config_loads_unchanged(tmp_path):
    p = tmp_path / "data_lake_config.json"
    p.write_text(json.dumps(REFERENCE_CONFIG))
    cfg = JobConfig.from_json(p)
    assert cfg.file_type == "parquet"
    assert cfg.table_name == "data_lake_query"
    assert "Date of birth" in cfg.ps_query
    cfg.validate()


def test_format_flip_resolution():
    csv = JobConfig(file_type="csv", table_name="t", ps_query="SELECT 1")
    pq = JobConfig(file_type="parquet", table_name="t", ps_query="SELECT 1")
    assert csv.resolved_output_format() == "parquet"
    assert pq.resolved_output_format() == "csv"
    explicit = JobConfig(
        file_type="csv", table_name="t", ps_query="SELECT 1", output_format="orc"
    )
    assert explicit.resolved_output_format() == "orc"


def test_unsupported_format_rejected():
    cfg = JobConfig(file_type="xml", table_name="t", ps_query="SELECT 1")
    with pytest.raises(ValueError, match="Unsupported file type"):
        cfg.validate()


def test_default_fill_values_match_reference():
    cfg = JobConfig(file_type="csv", table_name="t", ps_query="SELECT 1")
    assert cfg.fill_values == {"Phone": "Unknown"}
    assert cfg.reference_faithful is True


def test_local_master_string_encodes_task_retries(monkeypatch):
    """Local mode ignores spark.task.maxFailures — retries live in the
    MASTER STRING (local[N,R]); SPARK_GRAFT_TASK_RETRIES opts rung runs
    into retry-resilience while tests keep fail-fast local[N]."""
    from data_lake_construction_and_querying_with_pyspark_spark.session import (
        local_master_string,
    )

    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    monkeypatch.delenv("SPARK_GRAFT_TASK_RETRIES", raising=False)
    assert local_master_string() == "local[8]"
    monkeypatch.setenv("SPARK_GRAFT_TASK_RETRIES", "4")
    assert local_master_string() == "local[8,4]"
    monkeypatch.setenv("SPARK_GRAFT_TASK_RETRIES", "")
    assert local_master_string() == "local[8]"
