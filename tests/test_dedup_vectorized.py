"""The vectorized band-pool twin vs the fold-scored registered operator.

Same contract as tests/test_semantic_vectorized.py: the twin
(operators/dedup_vectorized.py) swaps interpreted fold cosines for
per-bucket GEMMs, so these tests pin pair-set equality / planted
recovery against ``embedding_cosine_pairs_scaled`` rather than value
hashes, plus the bucket parity and zero-norm semantics the kernels
promise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.operators import dedup as dd
from data_lake_construction_and_querying_with_pyspark_spark.operators import (
    dedup_vectorized as ddv,
)
from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
    as_double_vec,
    lsh_multi_buckets_flat,
    with_norm,
)

SF = "/root/testdata/sf0.001"


def _planted_corpus(spark):
    """The registered entry's own corpus construction: sf0.001
    embeddings + a clone of every 50th vector nudged +0.01/coordinate
    (cosine ≈ 0.9998 — the planted ground truth at τ=0.9)."""
    base = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("embedding")
    )
    clones = base.filter(F.col("vec_id") % dd._CLONE_MOD == 0).select(
        (F.col("vec_id") + F.lit(dd._CLONE_OFF)).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    return base.unionByName(clones)


def test_buckets_match_fold_form(spark):
    """Same hyperplanes, same bit layout: the GEMM bucketizer and
    ``lsh_multi_buckets_flat`` must produce the identical (vec_id, tbl,
    bucket) set (a divergence needs a projection within ulps of zero —
    absent on this fixed corpus)."""
    e = with_norm(spark.read.parquet(f"{SF}/embeddings.parquet"))
    fold = {
        (r["vec_id"], r["tbl"], r["bucket"])
        for r in lsh_multi_buckets_flat(e, n_tables=4, n_planes=8).collect()
    }
    vec = {
        (r["vec_id"], r["tbl"], r["bucket"])
        for r in ddv.lsh_buckets_vectorized(spark, e, n_tables=4, n_planes=8)
        .select("vec_id", "tbl", "bucket")
        .collect()
    }
    assert fold == vec


def test_pairs_match_fold_operator_on_planted_corpus(spark):
    """End to end at the registered production geometry (8×16, τ=0.9):
    identical pair set, cosines within 1e-12 (GEMM vs fold summation
    order), and exactly the planted clone pairs recovered."""
    aug = _planted_corpus(spark).persist()
    fold = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dd.embedding_cosine_pairs_scaled(
            spark, aug, tau=dd._SCALED_TAU,
            n_tables=dd._SCALED_TABLES, n_planes=dd._SCALED_PLANES,
        ).collect()
    }
    vec = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in ddv.embedding_cosine_pairs_vectorized(
            spark, aug, tau=dd._SCALED_TAU,
            n_tables=dd._SCALED_TABLES, n_planes=dd._SCALED_PLANES,
        ).collect()
    }
    assert set(fold) == set(vec)
    assert all(abs(fold[p] - vec[p]) < 1e-12 for p in fold)
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    planted = {
        (i, i + dd._CLONE_OFF) for i in range(0, n, dd._CLONE_MOD)
    }
    assert set(vec) == planted
    aug.unpersist()
    spark.catalog.clearCache()


def test_canonical_corpus_matches_fold_deliverable(spark):
    """End-to-end composition on the planted corpus: the vectorized
    canonical corpus must keep exactly the base vectors (every clone
    clusters with its lower-id original and drops) — the same sharp
    invariant the oracle-checked entry hash-pins."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup_vectorized import (
        canonical_corpus_embeddings_vectorized,
    )

    aug = _planted_corpus(spark).persist()
    survivors = {
        r["vec_id"]
        for r in canonical_corpus_embeddings_vectorized(
            spark, aug, tau=dd._SCALED_TAU,
            n_tables=dd._SCALED_TABLES, n_planes=dd._SCALED_PLANES,
        ).collect()
    }
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert survivors == set(range(n))
    aug.unpersist()
    spark.catalog.clearCache()


def test_zero_norm_vector_pairs_with_nothing(spark):
    """A zero vector shares bucket 0 of every table with other
    non-positive-projection vectors but must never emit a pair (its
    cosine is defined as 0 < τ), and identical nonzero vectors must."""
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 2.0, 3.0, 4.0]),
        (3, [1.0, 2.0, 3.0, 4.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        (r["vec_a"], r["vec_b"])
        for r in ddv.embedding_cosine_pairs_vectorized(
            spark, emb, tau=0.9, n_tables=2, n_planes=2
        ).collect()
    }
    assert out == {(2, 3)}


def test_blocked_bucket_walk_on_a_hot_bucket(spark):
    """One bucket larger than _PAIR_BLOCK_ROWS exercises the blocked
    Gram walk: 1400 positive multiples of one direction all land in the
    same bucket of every table with pairwise cosine 1 — every (i, j)
    pair must come out exactly once despite crossing block boundaries."""
    n = 1400
    assert n > ddv._PAIR_BLOCK_ROWS
    d = F.col("id")
    vec = F.array(*[(d + 1).cast("double") * F.lit(float(j + 1)) for j in range(4)])
    emb = spark.range(n).select(d.alias("vec_id"), vec.alias("embedding"))
    out = ddv.embedding_cosine_pairs_vectorized(
        spark, emb, tau=0.999, n_tables=2, n_planes=4
    )
    assert out.count() == n * (n - 1) // 2
    assert out.filter(F.col("vec_a") >= F.col("vec_b")).count() == 0
    spark.catalog.clearCache()


def test_table_subset_band_rows_union_to_single_pass(spark):
    """The scratch-bounding contract: plane seeds are keyed by
    ABSOLUTE table index, so band rows from tables=[0,2] ∪ tables=[1,3]
    must equal the single 4-table pass row-for-row."""
    e = with_norm(spark.read.parquet(f"{SF}/embeddings.parquet"))

    def rows(tables):
        return {
            (r["vec_id"], r["tbl"], r["bucket"])
            for r in ddv.lsh_buckets_vectorized(
                spark, e, n_tables=4, n_planes=8, tables=tables
            ).select("vec_id", "tbl", "bucket").collect()
        }

    assert rows([0, 2]) | rows([1, 3]) == rows(None)


def test_canonical_corpus_table_batched_equals_single_pass(spark, tmp_path):
    """table_batches trades peak shuffle scratch for waves — the
    survivor SET must not move (bucket membership and every cosine are
    bit-identical per wave; duplicate cross-wave edges are harmless to
    the components stage)."""
    aug = _planted_corpus(spark).persist()
    single = {
        r["vec_id"]
        for r in ddv.canonical_corpus_embeddings_vectorized(
            spark, aug, tau=dd._SCALED_TAU,
            n_tables=dd._SCALED_TABLES, n_planes=dd._SCALED_PLANES,
        ).collect()
    }
    batched = {
        r["vec_id"]
        for r in ddv.canonical_corpus_embeddings_vectorized(
            spark, aug, tau=dd._SCALED_TAU,
            n_tables=dd._SCALED_TABLES, n_planes=dd._SCALED_PLANES,
            table_batches=3, scratch_dir=str(tmp_path),
        ).collect()
    }
    assert single == batched
    aug.unpersist()
