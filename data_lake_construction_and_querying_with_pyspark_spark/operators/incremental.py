"""Incremental (append-only lake) operators: dedup new batches against
the accumulated corpus without rescanning it.

The pattern every continuously-ingesting training-data lake needs:
maintain a fingerprint INDEX (16-byte digest + keeper id — thousands of
times smaller than the corpus), anti-join each incoming batch against
it, append only the new fingerprints. Cost per batch is
O(batch + index), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def content_fingerprint(text_col: str = "text") -> F.Column:
    """Canonical md5 fingerprint (lowercase, whitespace-collapsed) —
    identical to the batch dedup_fingerprint_documents digest, so the
    incremental index and a full-corpus dedup agree exactly."""
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")))


def init_fingerprint_index(spark: SparkSession, index_path: str, corpus: DataFrame | None = None) -> None:
    """Create (or seed) the index. Empty index = empty parquet with the
    right schema."""
    if corpus is not None:
        seed = corpus.groupBy(content_fingerprint().alias("fingerprint")).agg(
            F.min("doc_id").alias("keep_doc_id")
        )
    else:
        seed = spark.createDataFrame([], "fingerprint string, keep_doc_id long")
    seed.write.mode("overwrite").parquet(index_path)


def dedup_incremental(
    spark: SparkSession, batch: DataFrame, index_path: str
) -> DataFrame:
    """Return the batch rows whose content is NEW to the lake, and
    append their fingerprints to the index.

    Three steps, each bounded by batch/index size:
    1. in-batch keep-first dedup on the fingerprint,
    2. LEFT ANTI join against the index (broadcast when the index is
       small; at 100 TB bucket the index by fingerprint so the join is
       shuffle-free),
    3. append the new fingerprints.
    """
    fp = content_fingerprint()
    in_batch = (
        batch.withColumn("fingerprint", fp)
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("fingerprint").orderBy("doc_id")),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    index = spark.read.parquet(index_path)
    fresh = in_batch.join(index, "fingerprint", "left_anti")
    # Materialize before mutating the index it was derived from.
    fresh = fresh.localCheckpoint()
    fresh.select("fingerprint", F.col("doc_id").alias("keep_doc_id")).write.mode(
        "append"
    ).parquet(index_path)
    return fresh
