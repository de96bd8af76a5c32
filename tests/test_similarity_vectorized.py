"""The vectorized IVF triplet miner vs the fold miner.

Same contract as the other vectorized-twin test files: positives must
match the fold miner exactly (shared pair semantics, planted ground
truth), negatives are contract- and agreement-tested (the twin-trained
quantizer's cell boundaries legitimately drift a little, so per-anchor
negatives can differ where cells did).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
    _CLONE_MOD,
    _CLONE_OFF,
    _SCALED_PLANES,
    _SCALED_TABLES,
    _SCALED_TAU,
)
from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
    as_double_vec,
    hard_negative_triplets_ivf,
)
from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity_vectorized import (
    hard_negative_triplets_ivf_vectorized,
    hardest_negatives_per_cell,
)

SF = "/root/testdata/sf0.001"


def _planted_corpus(spark):
    base = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("embedding")
    )
    clones = base.filter(F.col("vec_id") % _CLONE_MOD == 0).select(
        (F.col("vec_id") + F.lit(_CLONE_OFF)).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    return base.unionByName(clones)


def test_vectorized_ivf_miner_contract_and_agreement(spark):
    """Planted corpus at the production geometry: every triplet honors
    pos_cosine > tau ≥ neg_cosine with three distinct ids and the
    planted (anchor, clone) positives; the positive SET equals the
    fold miner's exactly; negatives agree with the fold miner on ≥90%
    of shared anchors (cell-boundary drift from twin-trained
    centroids accounts for the rest)."""
    corpus = _planted_corpus(spark).persist()
    kw = dict(tau=_SCALED_TAU, n_tables=_SCALED_TABLES, n_planes=_SCALED_PLANES)
    vec = hard_negative_triplets_ivf_vectorized(spark, corpus, **kw).collect()
    fold = hard_negative_triplets_ivf(spark, corpus, **kw).collect()
    assert vec, "vectorized IVF miner must emit triplets on the planted corpus"
    for r in vec:
        assert r.pos_cosine > _SCALED_TAU >= r.neg_cosine
        assert len({r.anchor_id, r.pos_id, r.neg_id}) == 3
        assert r.anchor_id % _CLONE_MOD == 0
        assert r.pos_id == r.anchor_id + _CLONE_OFF
    assert {(r.anchor_id, r.pos_id) for r in vec} == {
        (r.anchor_id, r.pos_id) for r in fold
    }
    fold_neg = {r.anchor_id: r.neg_id for r in fold}
    vec_neg = {r.anchor_id: r.neg_id for r in vec}
    shared = set(fold_neg) & set(vec_neg)
    assert shared
    agree = sum(1 for a in shared if fold_neg[a] == vec_neg[a])
    assert agree / len(shared) >= 0.90, f"neg agreement {agree}/{len(shared)}"
    corpus.unpersist()
    spark.catalog.clearCache()


def test_hardest_negative_kernel_tiebreak_and_exclusions(spark):
    """Crafted cell pinning the kernel rules: self and super-threshold
    mates excluded, zero-norm vectors neither anchor nor candidate,
    cosine ties resolve to the LOWEST nbr_id (the fold's max_by
    struct(cosine, -nbr_id) ordering)."""
    rows = [
        # one cell: anchor 10; mates 11/12 are equal-cosine ties below
        # tau; 13 is a super-threshold near-dup; 14 is the zero vector
        (10, [1.0, 0.0], 0),
        (11, [1.0, 1.0], 0),   # cos = 1/√2 ≈ 0.7071
        (12, [1.0, 1.0], 0),   # identical direction → identical cosine
        (13, [1.0, 0.001], 0),  # cos ≈ 0.9999995 > tau
        (14, [0.0, 0.0], 0),
    ]
    assigned = spark.createDataFrame(rows, "vec_id long, v array<double>, cell int")
    out = {
        r["anchor_id"]: (r["neg_id"], r["neg_cosine"])
        for r in hardest_negatives_per_cell(assigned, tau=0.9).collect()
    }
    assert 14 not in out, "zero-norm anchor must emit nothing"
    assert out[10][0] == 11, "tie must resolve to the lowest nbr_id"
    assert abs(out[10][1] - 2 ** -0.5) < 1e-12
    # 11's mates: 12 is excluded (cos 1 > tau); 13 at ≈0.70781 beats 10
    # at ≈0.70711 — the hardest SUB-threshold mate wins, not the nearest id
    assert out[11][0] == 13 and out[12][0] == 13
    # 13's mates: 10 is super-threshold (cos ≈ 0.9999995 > tau, excluded)
    # → hardest eligible are the 11/12 tie at ≈0.70781 → lowest id 11
    assert out[13][0] == 11


def test_knn_graph_edges_match_fold(spark):
    """Planted corpus, production geometry, k=3: the GEMM graph twin
    must emit the identical (vec_id, nbr_id, edge_rank) edge list as
    ``knn_graph_edges`` with cosines within 1e-12 — the per-bucket
    local top-k prune is lossless for the global (cosine DESC, nbr_id)
    order, and this pins it."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        knn_graph_edges,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity_vectorized import (
        knn_graph_edges_vectorized,
    )

    corpus = _planted_corpus(spark).persist()
    kw = dict(k=3, n_tables=_SCALED_TABLES, n_planes=_SCALED_PLANES)
    fold = {
        (r.vec_id, r.nbr_id, r.edge_rank): r.cosine
        for r in knn_graph_edges(spark, corpus, **kw).collect()
    }
    vec = {
        (r.vec_id, r.nbr_id, r.edge_rank): r.cosine
        for r in knn_graph_edges_vectorized(spark, corpus, **kw).collect()
    }
    assert set(fold) == set(vec) and fold
    assert all(abs(fold[e] - vec[e]) < 1e-12 for e in fold)
    corpus.unpersist()
    spark.catalog.clearCache()


def test_single_member_cells_emit_nothing(spark):
    rows = [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)]
    assigned = spark.createDataFrame(rows, "vec_id long, v array<double>, cell int")
    assert hardest_negatives_per_cell(assigned, tau=0.9).count() == 0


def test_ivf_miner_table_batched_is_value_identical(spark, tmp_path):
    """The scratch-bounding waves must not move a single triplet: per-
    wave pair maxes are bit-identical per (pair, table) and max over
    waves equals the single-pass max, so batched output rows ==
    single-pass output rows VALUE for value (same quantizer: the
    negatives stage is untouched by the knob)."""
    kw = dict(
        tau=_SCALED_TAU, n_tables=_SCALED_TABLES, n_planes=_SCALED_PLANES
    )
    corpus = _planted_corpus(spark).persist()
    single = {
        tuple(r) for r in hard_negative_triplets_ivf_vectorized(
            spark, corpus, **kw
        ).collect()
    }
    batched = {
        tuple(r) for r in hard_negative_triplets_ivf_vectorized(
            spark, corpus, table_batches=3, scratch_dir=str(tmp_path), **kw
        ).collect()
    }
    assert single == batched
    corpus.unpersist()


def test_knn_graph_table_batched_is_value_identical(spark, tmp_path):
    """The wave knob stages per-bucket LOCAL top-k rows; the union of
    per-bucket locals over a partition of the table set is the
    single-pass local set, so max-dedup + window yield edge-for-edge
    identical output (ranks and cosines included)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity_vectorized import (
        knn_graph_edges_vectorized,
    )

    corpus = _planted_corpus(spark).persist()
    kw = dict(k=3, n_tables=_SCALED_TABLES, n_planes=_SCALED_PLANES)
    single = {
        tuple(r) for r in knn_graph_edges_vectorized(spark, corpus, **kw).collect()
    }
    batched = {
        tuple(r) for r in knn_graph_edges_vectorized(
            spark, corpus, table_batches=3, scratch_dir=str(tmp_path), **kw
        ).collect()
    }
    assert single == batched
    corpus.unpersist()


def test_knn_graph_planes_sizing_rule():
    """The geometry rule after the r10 40M A/B (VERDICT r9 directive
    #4, measured and REFUTED at its proposed 20M anchor): 16 planes
    through the highest measured scale (40M, where +1 bit read 1.33×
    slower same-session), then +1 hyperplane bit per corpus doubling
    as the ≥80M hypothesis — rationale on knn_graph_planes."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity_vectorized import (
        knn_graph_planes,
    )

    assert knn_graph_planes(1_000_000) == 16
    assert knn_graph_planes(20_000_000) == 16
    assert knn_graph_planes(40_000_000) == 16  # measured: 17 is slower here
    assert knn_graph_planes(80_000_000) == 17
    assert knn_graph_planes(160_000_000) == 18
    assert knn_graph_planes(1_280_000_000) == 21
    # non-power-of-two corpora round UP (smaller buckets, never larger)
    assert knn_graph_planes(50_000_000) == 17
