"""Incremental fingerprint-index dedup + schema evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_incremental_dedup_across_batches(spark, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        dedup_incremental,
        init_fingerprint_index,
    )

    idx = str(tmp_path / "fp_index")
    init_fingerprint_index(spark, idx)

    b1 = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lazy dog sleeps"), (3, "THE  QUICK brown FOX")],
        ["doc_id", "text"],
    )
    fresh1 = dedup_incremental(spark, b1, idx)
    # doc 3 is a canonical duplicate of doc 1 → in-batch dedup keeps doc 1
    assert sorted(r.doc_id for r in fresh1.collect()) == [1, 2]

    b2 = spark.createDataFrame(
        [(4, "lazy dog sleeps"), (5, "a brand new document")], ["doc_id", "text"]
    )
    fresh2 = dedup_incremental(spark, b2, idx)
    # doc 4 duplicates batch-1 content → only doc 5 is new
    assert [r.doc_id for r in fresh2.collect()] == [5]

    index = spark.read.parquet(idx)
    assert index.count() == 3  # three distinct contents total
    assert index.select("fingerprint").distinct().count() == 3

    # replaying batch 2 adds nothing
    fresh3 = dedup_incremental(spark, b2, idx)
    assert fresh3.count() == 0
    assert spark.read.parquet(idx).count() == 3


def test_incremental_agrees_with_batch_dedup(spark, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        content_fingerprint,
        dedup_incremental,
        init_fingerprint_index,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    half1 = docs.filter(F.col("doc_id") < 250)
    half2 = docs.filter(F.col("doc_id") >= 250)

    idx = str(tmp_path / "fp_index2")
    init_fingerprint_index(spark, idx)
    n_new = dedup_incremental(spark, half1, idx).count() + dedup_incremental(
        spark, half2, idx
    ).count()

    batch_distinct = docs.select(content_fingerprint()).distinct().count()
    assert n_new == batch_distinct


def test_schema_evolution_merge(spark, tmp_path):
    """Append-only lakes grow columns; mergeSchema reads old+new files
    as one evolved schema with nulls for missing columns."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "v1"]).write.parquet(p + "/batch=1")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v1", "v2"]).write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"id", "v1", "v2", "batch"}
    rows = {r.id: (r.v1, r.v2) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_neardup_incremental_equals_batch_minhash(spark, tmp_path):
    """Splitting the corpus into two appended batches and unioning the
    incremental near-dup results must reproduce the batch MinHash
    operator's pairs exactly (same hashes, same banding, same exact
    verification)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        dedup_minhash_near_dup,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        init_neardup_index,
        neardup_incremental,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)

    idx = str(tmp_path / "neardup_idx")
    init_neardup_index(spark, idx)
    p1 = neardup_incremental(spark, half1, idx)
    p2 = neardup_incremental(spark, half2, idx)
    incremental = {(r.doc_a, r.doc_b, r.jaccard) for r in p1.collect()} | {
        (r.doc_a, r.doc_b, r.jaccard) for r in p2.collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_near_dup(spark, SF_SMOKE).collect()
    }
    assert incremental == batch and len(batch) > 0


def test_neardup_incremental_replay_is_noop(spark, tmp_path):
    """Re-ingesting an already-indexed batch must produce no pairs and
    leave the index byte-identical (the anti-join replay guard)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        init_neardup_index,
        neardup_incremental,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    idx = str(tmp_path / "replay_idx")
    init_neardup_index(spark, idx)
    first = neardup_incremental(spark, docs, idx)
    n_pairs = first.count()
    n_bands = spark.read.parquet(f"{idx}/bands.parquet").count()
    n_shingles = spark.read.parquet(f"{idx}/shingles.parquet").count()

    replay = neardup_incremental(spark, docs, idx)
    assert replay.count() == 0
    assert spark.read.parquet(f"{idx}/bands.parquet").count() == n_bands
    assert spark.read.parquet(f"{idx}/shingles.parquet").count() == n_shingles
    assert n_pairs >= 0 and n_bands > 0
