from __future__ import annotations

from pathlib import Path


def test_delete_output_path(tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.maintenance import (
        delete_output_path,
    )

    out = tmp_path / "result.parquet"
    out.mkdir()
    (out / "part-0000.parquet").write_bytes(b"x")
    assert delete_output_path(str(out)) is True
    assert not out.exists()
    assert delete_output_path(str(out)) is False  # idempotent


def test_clean_staging_prefix(tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.maintenance import (
        clean_staging_prefix,
    )

    staging = tmp_path / "Unsaved" / "a" / "b"
    staging.mkdir(parents=True)
    (staging / "f1").write_text("1")
    (tmp_path / "Unsaved" / "f2").write_text("2")
    (tmp_path / "keep.txt").write_text("keep")
    assert clean_staging_prefix(str(tmp_path)) == 2
    assert not (tmp_path / "Unsaved").exists()
    assert (tmp_path / "keep.txt").exists()
    assert clean_staging_prefix(str(tmp_path)) == 0


def test_hadoop_delete(spark, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.maintenance import hadoop_delete

    out = str(tmp_path / "hd")
    spark.range(10).write.parquet(out)
    assert hadoop_delete(spark, out) is True
    assert not Path(out).exists()
    assert hadoop_delete(spark, out) is False


def test_compaction_reduces_file_count(spark, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.maintenance import (
        compact_lake_path,
    )

    out = str(tmp_path / "many_files")
    # 64 tiny files
    spark.range(100000).repartition(64).write.parquet(out)
    before = len([f for f in Path(out).rglob("*.parquet")])
    assert before == 64
    after = compact_lake_path(spark, out, target_file_mb=128)
    assert after < before
    back = spark.read.parquet(out)
    assert back.count() == 100000
    assert back.agg({"id": "sum"}).first()[0] == 100000 * 99999 // 2


def test_preview_renders_grid(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.maintenance import preview

    s = preview(spark.range(3).toDF("n"), n=2)
    assert "n" in s and "only showing top 2 rows" in s
