"""The vectorized SemDeDup twins vs the oracle-checked fold path.

The twins (operators/semantic_vectorized.py) swap the sequential-fold
dot product for numpy GEMMs, which changes float summation order in
final ulps — so these tests pin AGREEMENT and planted-pair RECOVERY
against the fold implementation rather than hashes (the module
docstring's contract), plus the tie-break and zero-norm semantics the
kernels promise to preserve.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.operators import semantic as sem
from data_lake_construction_and_querying_with_pyspark_spark.operators import (
    semantic_vectorized as semv,
)
from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import as_double_vec

SF = "/root/testdata/sf0.001"


def _base(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return emb.select("vec_id", as_double_vec(F.col("embedding")).alias("v"))


def test_assignment_agreement_with_fold(spark):
    """Same corpus, same (driver-literal) centroids: the vectorized
    shortlist assignment agrees with the fold path on ≥99% of vectors
    (disagreements can only come from exact-distance ties resolving
    differently under reordered float sums — rare on continuous
    embeddings)."""
    base = _base(spark).persist()
    n = base.count()
    k = sem.derive_k(n)
    m = sem.coarse_m(k)
    cents = sem._seed_centroids(spark, base, k)
    fold = {
        r["vec_id"]: r["cell"]
        for r in sem.shortlist_assign(base, cents, m).select("vec_id", "cell").collect()
    }
    vec = {
        r["vec_id"]: r["cell"]
        for r in semv.shortlist_assign_vectorized(spark, base, cents, m)
        .select("vec_id", "cell")
        .collect()
    }
    assert set(fold) == set(vec) and len(fold) == n
    agree = sum(1 for i, c in fold.items() if vec[i] == c)
    assert agree / n >= 0.99, f"assignment agreement {agree}/{n}"
    base.unpersist()


def test_pair_stage_matches_fold_given_same_assignment(spark):
    """Feeding BOTH pair stages the identical assignment isolates the
    cosine arithmetic: flags must coincide exactly on the fixture
    corpus (an ulp flip needs a true cosine within ~1e-15 of tau —
    deterministic for a fixed corpus, and absent here)."""
    base = _base(spark).persist()
    n = base.count()
    k = sem.derive_k(n)
    cents = sem._seed_centroids(spark, base, k)
    assigned = sem.shortlist_assign(base, cents, sem.coarse_m(k)).persist()
    fold = {
        (r["vec_id"]): (r["cell_id"], r["is_semantic_dup"])
        for r in sem.mark_within_cell_dups(assigned, sem.TAU).collect()
    }
    vec = {
        (r["vec_id"]): (r["cell_id"], r["is_semantic_dup"])
        for r in semv.mark_within_cell_dups_vectorized(assigned, sem.TAU).collect()
    }
    assert fold == vec
    assigned.unpersist()
    base.unpersist()


def test_end_to_end_recovery_matches_fold_on_planted_corpus(spark):
    """scale_probe geometry at n=2000 (the rungs' own planted ground
    truth): near-pair members (pmod(k,20)==1) have cosine ≈ 1. The
    vectorized end-to-end dedup must recover ≥95% of planted pairs and
    agree with the fold path on ≥98% of all per-vector flags. Not ±0:
    training iterations assign with the twin too, so centroid means —
    and with them cluster BOUNDARIES — genuinely drift a little, and a
    planted pair straddling a drifted boundary splits across cells
    (measured here: fold 100/100, vectorized 98/100 — the same class
    as the fold path's own 97.4-97.5% at the 1M/2M rungs, where it is
    the shortlist approximation doing the splitting)."""
    from scripts.scale_probe import build_embeddings

    n = 2000
    emb = build_embeddings(spark, n).persist()
    k = sem.derive_k(n)

    def flags(df):
        return {r["vec_id"]: r["is_semantic_dup"] for r in df.collect()}

    fold = flags(sem.semantic_dedup_sampled(spark, emb, k=k, tau=0.95))
    spark.catalog.clearCache()
    vec = flags(semv.semantic_dedup_sampled_vectorized(spark, emb, k=k, tau=0.95))
    planted = [d for d in range(1, n, 2) if ((d // 2) % 20) < 2]

    def recovered(fl):
        return sum(1 for d in planted if fl[d])

    rf, rv = recovered(fold), recovered(vec)
    assert rv >= 0.95 * len(planted), (
        f"planted recovery fold={rf} vectorized={rv} of {len(planted)}"
    )
    agree = sum(1 for i, fl in fold.items() if vec[i] == fl)
    assert agree / n >= 0.98, f"flag agreement {agree}/{n}"
    emb.unpersist()
    spark.catalog.clearCache()


def test_zero_vector_is_never_a_dup(spark):
    """Zero-norm semantics pinned: the fold path's cosine is NULL for a
    zero vector (never ≥ tau); the kernel substitutes cos := 0. A zero
    vector must come back unflagged even next to identical cell-mates,
    and identical nonzero vectors must flag all but the lowest id."""
    rows = [(0, [0.0] * 4), (1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0, 3.0, 4.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["is_semantic_dup"]
        for r in semv.semantic_dedup_sampled_vectorized(
            spark, emb, k=1, iters=1, tau=0.9
        ).collect()
    }
    assert out == {0: False, 1: False, 2: True}


def test_blocked_pair_scan_on_a_hot_cell(spark):
    """A single cell larger than _PAIR_BLOCK_ROWS exercises the row-
    blocked Gram walk: 1500 positive multiples of one direction all
    land in one cluster with pairwise cosine 1, so every vector but the
    lowest id must be flagged — across block boundaries."""
    n = 1500
    assert n > semv._PAIR_BLOCK_ROWS
    d = F.col("id")
    vec = F.array(*[(d + 1).cast("double") * F.lit(float(j + 1)) for j in range(4)])
    emb = spark.range(n).select(d.alias("vec_id"), vec.alias("embedding"))
    out = semv.semantic_dedup_sampled_vectorized(spark, emb, k=1, iters=1, tau=0.999)
    flagged = {r["vec_id"] for r in out.filter("is_semantic_dup").collect()}
    assert flagged == set(range(1, n))
    spark.catalog.clearCache()


def test_sharded_index_assignment_is_bit_identical_to_whole(spark):
    """index_shards routes the assignment through anchor-range wave
    broadcasts + a cross-wave min(struct(d2, cell)) reduce; the
    contract (shortlist_assign_vectorized docstring) is BIT-identity
    with the one-piece index at fixed batch geometry — every per-
    (rows, anchor) GEMM is the same either way. Exact dict equality,
    not an agreement band."""
    base = _base(spark).persist()
    n = base.count()
    k = sem.derive_k(n)
    m = sem.coarse_m(k)
    cents = sem._seed_centroids(spark, base, k)
    whole = {
        r["vec_id"]: r["cell"]
        for r in semv.shortlist_assign_vectorized(spark, base, cents, m)
        .select("vec_id", "cell")
        .collect()
    }
    sharded = {
        r["vec_id"]: r["cell"]
        for r in semv.shortlist_assign_vectorized(
            spark, base, cents, m, index_shards=3
        )
        .select("vec_id", "cell")
        .collect()
    }
    assert sharded == whole and len(whole) == n
    base.unpersist()


def test_sharded_end_to_end_matches_whole_flags(spark):
    """semantic_dedup_sampled_vectorized(index_shards=4) reproduces the
    unsharded twin's full (vec_id -> is_semantic_dup) flag map exactly:
    sharded assignments are bit-identical per iteration, so trained
    centroids, final cells, and the pair stage all coincide."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    k = sem.derive_k(emb.count())
    whole = {
        r["vec_id"]: r["is_semantic_dup"]
        for r in semv.semantic_dedup_sampled_vectorized(spark, emb, k=k).collect()
    }
    sharded = {
        r["vec_id"]: r["is_semantic_dup"]
        for r in semv.semantic_dedup_sampled_vectorized(
            spark, emb, k=k, index_shards=4
        ).collect()
    }
    assert sharded == whole
