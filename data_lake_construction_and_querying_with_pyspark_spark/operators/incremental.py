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


# --- incremental NEAR-dup (MinHash band index) ---------------------------------


def init_neardup_index(spark: SparkSession, index_dir: str) -> None:
    """Create an empty near-dup index: a band index (candidate lookup)
    plus a shingle inventory (exact-Jaccard verification)."""
    spark.createDataFrame([], "band int, band_key string, doc_id long").write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/bands.parquet")
    spark.createDataFrame([], "doc_id long, s string").write.mode("overwrite").parquet(
        f"{index_dir}/shingles.parquet"
    )


def neardup_incremental(spark: SparkSession, batch: DataFrame, index_dir: str) -> DataFrame:
    """Near-dup pairs of an incoming batch against the accumulated
    corpus (and within the batch), using the SAME 16-hash / 4-band
    MinHash construction as the batch operator
    (``dedup.dedup_minhash_near_dup``) — the union of incremental
    results over any batch split equals the batch result exactly
    (``tests/test_incremental.py`` proves it).

    Per-batch cost: shingle+sign the batch, probe the band index
    (equi-join on (band, band_key) — only colliding buckets are
    touched), verify candidates via the shingle inventory, append the
    batch's bands and shingles. Nothing rescans the corpus text. At
    100 TB the inventory stores 8-byte shingle hashes instead of
    strings and both index tables live bucketed by their join key so
    every probe is shuffle-free; semantics are unchanged.
    """
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        _BAND_ROWS,
        _N_HASHES,
        _shingles,
        _toks,
    )

    par = spark.sparkContext.defaultParallelism
    inv_new = (
        batch.repartition(par, "doc_id")
        .select("doc_id", _toks().alias("toks"))
        .select("doc_id", _shingles(F.col("toks")).alias("shingles"))
        .select("doc_id", F.explode_outer("shingles").alias("s"))
        .filter(F.col("s").isNotNull())
        .localCheckpoint()
    )
    sig = inv_new.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}")
            for i in range(_N_HASHES)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"h{b * _BAND_ROWS + j}") for j in range(_BAND_ROWS)]
                ).alias("band_key"),
            )
            for b in range(_N_HASHES // _BAND_ROWS)
        ]
    )
    bands_new = (
        sig.select("doc_id", F.explode(band_structs).alias("bk"))
        .select(F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"), "doc_id")
        .localCheckpoint()
    )

    bands_old = spark.read.parquet(f"{index_dir}/bands.parquet")
    inv_old = spark.read.parquet(f"{index_dir}/shingles.parquet")
    bands_all = bands_old.unionByName(bands_new)
    inv_all = inv_old.unionByName(inv_new)

    cand = (
        bands_new.toDF("band", "band_key", "new_id")
        .join(bands_all, ["band", "band_key"])
        .filter(F.col("new_id") != F.col("doc_id"))
        .select(
            F.least("new_id", "doc_id").alias("doc_a"),
            F.greatest("new_id", "doc_id").alias("doc_b"),
        )
        .distinct()
    )
    inter = (
        cand.join(inv_all.toDF("doc_a", "s"), "doc_a")
        .join(inv_all.toDF("doc_b", "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = inv_all.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    union = F.col("n_a") + F.col("n_b") - F.col("inter")
    pairs = (
        inter.join(F.broadcast(sizes.toDF("doc_a", "n_a")), "doc_a")
        .join(F.broadcast(sizes.toDF("doc_b", "n_b")), "doc_b")
        .filter(5 * F.col("inter") >= 4 * union)
        .select("doc_a", "doc_b", (F.col("inter").cast("double") / union).alias("jaccard"))
        .localCheckpoint()  # materialize before the index mutation below
    )
    bands_new.write.mode("append").parquet(f"{index_dir}/bands.parquet")
    inv_new.write.mode("append").parquet(f"{index_dir}/shingles.parquet")
    return pairs
