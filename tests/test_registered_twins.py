"""The rows-only registered GEMM twins vs their hash-oracled fold
entries (r8).

The twin LIBRARY functions are already equality/recall-tested
(tests/test_{semantic,dedup,similarity}_vectorized.py, and at 200k by
the marker-gated tests/test_rung_agreement.py). What those suites do
NOT pin is the registered WRAPPERS: each twin query entry promises the
same planted-clone corpus, hyperplane seed, and band geometry as its
fold counterpart, and a drive-by edit to a wrapper's parameters would
break that silently — the twins carry no oracle (the BLAS ulp caveat),
so the driver can't catch it. These tests compare the registered
entries pairwise at the smoke fixture, keyed on the ulp-robust columns
(ids, ranks, flags — never raw cosines)."""

from __future__ import annotations

import pytest

from data_lake_construction_and_querying_with_pyspark_spark.registry import all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def test_knn_graph_twin_entry_matches_fold_edge_set(spark):
    """Per-bucket local top-k is lossless for the (cosine DESC, nbr_id)
    order, so the twin entry's (vec_id, nbr_id, edge_rank) SET must
    equal the fold entry's exactly — same corpus, seed, and geometry."""
    fold = {
        (r.vec_id, r.nbr_id, r.edge_rank)
        for r in QUERIES["knn_graph_topk"](spark, SF_SMOKE).collect()
    }
    twin = {
        (r.vec_id, r.nbr_id, r.edge_rank)
        for r in QUERIES["knn_graph_topk_vectorized"](spark, SF_SMOKE).collect()
    }
    assert fold == twin


def test_band_pool_twin_entry_matches_fold_pair_set(spark):
    """At the planted-clone corpus + τ=0.9 both entries must emit
    exactly the planted pairs — pair identity is ulp-robust here
    because nothing else on this corpus comes near the threshold."""
    fold = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["dedup_embedding_cosine_pairs"](spark, SF_SMOKE).collect()
    }
    twin = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["dedup_embedding_cosine_pairs_vectorized"](
            spark, SF_SMOKE
        ).collect()
    }
    assert fold == twin
    assert fold, "planted clones must produce at least one pair"


def test_semantic_twin_entry_matches_fold_flags(spark):
    """Same k policy and corpus ⇒ the twin's (vec_id, is_semantic_dup)
    must agree with the fold entry's except at documented ulp ties —
    none of which exist at the smoke fixture (pinned exact here; the
    200k rung gate owns the at-scale tolerance band)."""
    fold = {
        (r.vec_id, r.is_semantic_dup)
        for r in QUERIES["semantic_dedup_sampled"](spark, SF_SMOKE).collect()
    }
    twin = {
        (r.vec_id, r.is_semantic_dup)
        for r in QUERIES["semantic_dedup_sampled_vectorized"](
            spark, SF_SMOKE
        ).collect()
    }
    assert fold == twin


def test_ivf_miner_twin_entry_triples_every_planted_clone(spark):
    """The IVF twin entry has no registered fold counterpart (the fold
    registered miner uses the band pool), so pin its contract directly:
    every planted (anchor, clone) positive appears exactly once, each
    with a sub-threshold negative from the anchor's cell."""
    rows = QUERIES["hard_negative_mining_ivf_vectorized"](spark, SF_SMOKE).collect()
    anchors = sorted(r.anchor_id for r in rows)
    assert anchors == sorted(set(anchors)), "one triplet per anchor"
    for r in rows:
        assert r.pos_id == r.anchor_id + 1_000_000  # the planted clone
        assert r.pos_cosine > 0.9 >= r.neg_cosine
    assert anchors, "planted clones must produce at least one triplet"
