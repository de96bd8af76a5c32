"""Marker-gated fold-vs-twin agreement rung at 200k (VERDICT r7
directive #4): the 10M/20M recovery numbers live in scripts + JSONL;
this pins the SAME end-to-end agreement contract in CI-affordable form
(minutes, not hours) so a future twin refactor can't silently drift.

Gated two ways so the default suite stays fast and honest:

    RUN_RUNG_TESTS=1 python -m pytest tests/test_rung_agreement.py -m rung

Without the env var the tests SKIP visibly (they cost ~5-10 min of
32-core time — the fold semantic pass dominates). Each family runs
BOTH the fold path and its GEMM twin end-to-end on scale_probe's
planted 200k corpus and asserts planted recovery agreement within the
documented band (the twins' ulp/boundary-drift contract,
operators/semantic_vectorized.py module docstring — flag agreement is
bounded, not exact, because twin-trained centroids legitimately drift
cluster boundaries)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_RUNG = 200_000

pytestmark = [
    pytest.mark.rung,
    pytest.mark.skipif(
        not os.environ.get("RUN_RUNG_TESTS"),
        reason="rung-scale agreement (minutes of 32-core time); set RUN_RUNG_TESTS=1",
    ),
]


@pytest.fixture(scope="module")
def rung_emb(spark):
    from scripts.scale_probe import build_embeddings

    emb = build_embeddings(spark, N_RUNG).persist()
    emb.count()
    yield emb
    emb.unpersist()
    spark.catalog.clearCache()


def _planted_near_ids(n: int) -> list[int]:
    # scale_probe geometry: odd member d of pair group k=d//2 with
    # pmod(k,20)==1 is the +0.01-nudged near clone (cosine ≈ 1)
    return [d for d in range(1, n, 2) if ((d // 2) % 20) < 2]


def test_semantic_dedup_fold_vs_twin_recovery(spark, rung_emb):
    from data_lake_construction_and_querying_with_pyspark_spark.operators import semantic as sem
    from data_lake_construction_and_querying_with_pyspark_spark.operators import (
        semantic_vectorized as semv,
    )

    k = sem.derive_k(N_RUNG)
    planted = _planted_near_ids(N_RUNG)

    def flags(df):
        return {r["vec_id"]: r["is_semantic_dup"] for r in df.collect()}

    fold = flags(sem.semantic_dedup_sampled(spark, rung_emb, k=k, tau=0.95))
    spark.catalog.clearCache()
    twin = flags(semv.semantic_dedup_sampled_vectorized(spark, rung_emb, k=k, tau=0.95))
    spark.catalog.clearCache()

    rf = sum(1 for d in planted if fold[d])
    rt = sum(1 for d in planted if twin[d])
    # the measured band: 97.1-97.5% at 1M-20M; allow 95% at this size
    # and require fold/twin recovery within 2 points of each other
    assert rf >= 0.95 * len(planted), f"fold recovery {rf}/{len(planted)}"
    assert rt >= 0.95 * len(planted), f"twin recovery {rt}/{len(planted)}"
    assert abs(rf - rt) <= 0.02 * len(planted), f"fold={rf} twin={rt}"
    agree = sum(1 for i, fl in fold.items() if twin[i] == fl)
    assert agree / N_RUNG >= 0.98, f"flag agreement {agree}/{N_RUNG}"


def test_band_pool_pairs_fold_vs_twin_planted_clones(spark, rung_emb):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        _CLONE_MOD,
        _CLONE_OFF,
        _SCALED_PLANES,
        _SCALED_TABLES,
        _SCALED_TAU,
        embedding_cosine_pairs_scaled,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup_vectorized import (
        embedding_cosine_pairs_vectorized,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        as_double_vec,
    )

    base = rung_emb.select("vec_id", as_double_vec(F.col("embedding")).alias("embedding"))
    clones = base.filter(F.col("vec_id") % _CLONE_MOD == 0).select(
        (F.col("vec_id") + F.lit(_CLONE_OFF * 100)).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    aug = base.unionByName(clones).persist()
    aug.count()

    def pair_set(df):
        return {(r["vec_a"], r["vec_b"]) for r in df.select("vec_a", "vec_b").collect()}

    fold = pair_set(
        embedding_cosine_pairs_scaled(
            spark, aug, tau=_SCALED_TAU, n_tables=_SCALED_TABLES, n_planes=_SCALED_PLANES
        )
    )
    twin = pair_set(
        embedding_cosine_pairs_vectorized(
            spark, aug, tau=_SCALED_TAU, n_tables=_SCALED_TABLES, n_planes=_SCALED_PLANES
        )
    )
    aug.unpersist()

    planted_clone_pairs = {
        (v, v + _CLONE_OFF * 100) for v in range(0, N_RUNG, _CLONE_MOD)
    }
    # clone cosine ≈ 0.9998 — far from tau, so no ulp flip is possible:
    # both paths must recover every planted clone pair
    assert planted_clone_pairs <= fold, f"fold missed {len(planted_clone_pairs - fold)}"
    assert planted_clone_pairs <= twin, f"twin missed {len(planted_clone_pairs - twin)}"
    # non-planted extras (scale_probe's own cosine≈1 share-pairs) may
    # only differ by tau-borderline ulp flips — bound the symmetric diff
    assert len(fold ^ twin) <= max(10, len(fold) // 1000), (
        f"pair sets diverged by {len(fold ^ twin)} of {len(fold)}"
    )


def test_ivf_miner_fold_vs_twin_planted_positives(spark, rung_emb):
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        hard_negative_triplets_ivf,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity_vectorized import (
        hard_negative_triplets_ivf_vectorized,
    )

    # planted positive pairs are (2k, 2k+1) for pmod(k, 20) < 2; the
    # miner emits them with anchor = vec_a = the even member, so there
    # are N_RUNG // 20 recoverable (anchor, pos) planted rows — the
    # rung script's planted_pairs accounting
    planted_anchors = {d for d in range(0, N_RUNG, 2) if ((d // 2) % 20) < 2}
    n_planted = len(planted_anchors)

    def recovered(df):
        # planted positive: anchor's partner is its XOR-1 pair mate
        rows = df.select("anchor_id", "pos_id", "neg_cosine").collect()
        hits = len(
            {
                r["anchor_id"]
                for r in rows
                if r["anchor_id"] in planted_anchors and r["pos_id"] == (r["anchor_id"] ^ 1)
            }
        )
        assert all(r["neg_cosine"] <= 0.9 for r in rows), "super-threshold negative"
        return hits, len(rows)

    fold_hits, fold_rows = recovered(
        hard_negative_triplets_ivf(spark, rung_emb, tau=0.9, broadcast_buckets=False)
    )
    spark.catalog.clearCache()
    twin_hits, twin_rows = recovered(
        hard_negative_triplets_ivf_vectorized(spark, rung_emb, tau=0.9)
    )
    spark.catalog.clearCache()

    assert fold_hits >= 0.95 * n_planted, f"fold {fold_hits}/{n_planted}"
    assert twin_hits >= 0.95 * n_planted, f"twin {twin_hits}/{n_planted}"
    assert abs(fold_hits - twin_hits) <= 0.02 * n_planted, (
        f"fold={fold_hits} twin={twin_hits} rows fold={fold_rows} twin={twin_rows}"
    )


def test_sharded_index_twin_is_exact_at_rung_scale(spark, rung_emb):
    """VERDICT r8 directive #2's agreement gate: the wave-sharded
    centroid index (index_shards>1) must reproduce the one-piece
    twin's full flag map at the 200k rung. The contract is stronger
    than the fold-vs-twin band — sharding changes NO arithmetic
    (tests/test_vectorized_kernels.py pins the kernels; this pins the
    Spark path end-to-end at scale, waves + scratch staging + rejoin
    included), so equality is exact."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators import semantic as sem
    from data_lake_construction_and_querying_with_pyspark_spark.operators import (
        semantic_vectorized as semv,
    )

    k = sem.derive_k(N_RUNG)

    def flags(df):
        return {r["vec_id"]: r["is_semantic_dup"] for r in df.collect()}

    whole = flags(semv.semantic_dedup_sampled_vectorized(spark, rung_emb, k=k, tau=0.95))
    spark.catalog.clearCache()
    sharded = flags(
        semv.semantic_dedup_sampled_vectorized(
            spark, rung_emb, k=k, tau=0.95, index_shards=4
        )
    )
    spark.catalog.clearCache()
    assert sharded == whole
