"""Spark-free brute-force property tests for the vectorized-twin
numpy kernels (the tests the twin modules' docstrings promise).

The twins' scale wrappers are agreement-tested against the fold path
through Spark (tests/test_semantic_vectorized.py and siblings); these
tests instead pin the KERNELS' exact tie-break and exclusion semantics
against plain-Python brute-force references, hundreds of examples per
run, no session.

Exactness trick: hypothesis draws vectors with entries in {-1, +1} at
d=4 (norm exactly 2.0, normalized entries ±0.5, cosines exact
multiples of 0.25) or small-integer coordinates for the unnormalized
shortlist d² arithmetic. Every product and sum is exactly
representable in float64, so BLAS summation order — the twins'
documented ulp caveat — cannot blur a comparison, and EXACT ties are
common instead of measure-zero: the tie-break rules are what these
tests actually exercise."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_lake_construction_and_querying_with_pyspark_spark.operators import (
    dedup_vectorized as dv,
)
from data_lake_construction_and_querying_with_pyspark_spark.operators import (
    semantic_vectorized as sv,
)
from data_lake_construction_and_querying_with_pyspark_spark.operators import (
    similarity_vectorized as simv,
)

D = 4  # ±1 entries at d=4: norms exactly 2.0, cosines in {-1,-.75,...,1}

sign_vec = st.lists(st.sampled_from([-1.0, 1.0]), min_size=D, max_size=D)
# each row is either a ±1 vector or the zero vector (the zero-norm case)
row = st.one_of(sign_vec, st.just([0.0] * D))
corpus = st.lists(row, min_size=2, max_size=24)
tau_exact = st.sampled_from([-1.0, -0.75, -0.5, -0.25, 0.0, 0.25, 0.5, 0.75, 1.0, 0.3])


def _ids(n: int) -> np.ndarray:
    # ascending, with gaps so id != positional index
    return np.arange(n, dtype=np.int64) * 3 + 5


def _normalize(V: np.ndarray) -> np.ndarray:
    nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
    N = V / np.where(nrm == 0.0, 1.0, nrm)[:, None]
    N[nrm == 0.0] = 0.0
    return N


# ---------------------------------------------------------------- pairs


def _brute_pairs(ids, N, tau):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            c = float(np.dot(N[i], N[j]))
            if c > tau:
                out.add((int(ids[i]), int(ids[j]), c))
    return out


@settings(max_examples=200, deadline=None)
@given(corpus, tau_exact)
def test_pairs_above_tau_kernel_matches_brute_force(rows, tau):
    V = np.array(rows, dtype=np.float64)
    ids = _ids(len(rows))
    N = _normalize(V)
    a, b, c = dv.pairs_above_tau_kernel(ids, N, tau)
    got = {(int(x), int(y), float(z)) for x, y, z in zip(a, b, c)}
    assert got == _brute_pairs(ids, N, tau)
    # contract: lower id first, strictly above tau
    assert all(x < y and z > tau for x, y, z in got)


# --------------------------------------------------------------- top-k


def _brute_topk(ids, N, k):
    zero = np.einsum("ij,ij->i", N, N) == 0.0
    out = set()
    for i in range(len(ids)):
        if zero[i]:
            continue  # zero-norm anchors emit nothing
        mates = [
            (-float(np.dot(N[i], N[j])), int(ids[j]))
            for j in range(len(ids))
            if j != i and not zero[j]
        ]
        for negc, jid in sorted(mates)[:k]:
            out.add((int(ids[i]), jid, -negc))
    return out


@settings(max_examples=200, deadline=None)
@given(corpus, st.integers(min_value=1, max_value=5))
def test_local_topk_kernel_matches_brute_force(rows, k):
    V = np.array(rows, dtype=np.float64)
    ids = _ids(len(rows))
    N = _normalize(V)
    s, d, c = simv.local_topk_kernel(ids, N, k)
    got = {(int(x), int(y), float(z)) for x, y, z in zip(s, d, c)}
    assert got == _brute_topk(ids, N, k)


def test_local_topk_zero_norm_rows_are_neither_anchors_nor_mates():
    """The r7 advice finding, pinned: a zero-norm vector must not
    outrank a genuinely negative-cosine neighbor (its Gram cosine of
    0.0 used to), and must emit no edges of its own."""
    ids = np.array([1, 2, 3], dtype=np.int64)
    V = np.array([[1.0] * D, [-1.0] * D, [0.0] * D])
    s, d, c = simv.local_topk_kernel(ids, _normalize(V), k=1)
    got = set(zip(s.tolist(), d.tolist(), c.tolist()))
    # 1 and 2 pick each other (cosine -1) — never the zero vector; 3 is silent
    assert got == {(1, 2, -1.0), (2, 1, -1.0)}


# --------------------------------------------------------- hardest mate


def _brute_hardest(ids, V, tau):
    N = _normalize(V)
    zero = np.einsum("ij,ij->i", V, V) == 0.0
    out = set()
    for i in range(len(ids)):
        if zero[i]:
            continue
        best = None  # (cosine, -id) max == cosine DESC then lowest id
        for j in range(len(ids)):
            if j == i or zero[j]:
                continue
            c = float(np.dot(N[i], N[j]))
            if c > tau:
                continue  # super-threshold mates are positives
            key = (c, -int(ids[j]))
            if best is None or key > best:
                best = key
        if best is not None:
            out.add((int(ids[i]), -best[1], best[0]))
    return out


@settings(max_examples=200, deadline=None)
@given(corpus, tau_exact)
def test_hardest_mate_kernel_matches_brute_force(rows, tau):
    V = np.array(rows, dtype=np.float64)
    ids = _ids(len(rows))
    a, nid, c = simv.hardest_mate_kernel(ids, V, tau)
    got = {(int(x), int(y), float(z)) for x, y, z in zip(a, nid, c)}
    assert got == _brute_hardest(ids, V, tau)


# ---------------------------------------------------- shortlist assign

coord = st.integers(min_value=-2, max_value=2)
int_vec = st.lists(coord, min_size=3, max_size=3)


def _d2(u, v):
    # the kernels' exact expression shape: u·u − 2 u·v + v·v
    return float(np.dot(u, u)) - 2.0 * float(np.dot(u, v)) + float(np.dot(v, v))


def _brute_shortlist(V, cells, C, m, nprobe):
    """The fold shortlist semantics straight from the docstrings:
    anchors = centroids of the m lowest cells; every centroid bucketed
    under its nearest anchor (first-occurrence / lowest-acell argmin,
    anchors self-owned); each vector probes its nprobe nearest anchors
    (ties toward lower acell) and takes the (d2, cell) argmin over the
    probed buckets."""
    order = np.argsort(cells, kind="stable")
    cells, C = cells[order], C[order]
    m = min(m, len(cells))
    A = C[:m]
    owner = []
    for j in range(len(cells)):
        owner.append(min(range(m), key=lambda a: (_d2(C[j], A[a]), a)))
    for a in range(m):
        owner[a] = a
    out = []
    for v in V:
        probes = sorted(range(m), key=lambda a: (_d2(v, A[a]), a))[: min(nprobe, m)]
        cand = [j for j in range(len(cells)) if owner[j] in probes]
        best = min(cand, key=lambda j: (_d2(v, C[j]), cells[j]))
        out.append(int(cells[best]))
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(int_vec, min_size=1, max_size=12),  # queries
    st.lists(int_vec, min_size=1, max_size=16),  # centroids
    st.integers(min_value=1, max_value=6),  # m
    st.integers(min_value=1, max_value=4),  # nprobe
    st.randoms(use_true_random=False),
)
def test_shortlist_assign_kernel_matches_brute_force(qs, cs, m, nprobe, rnd):
    V = np.array(qs, dtype=np.float64)
    C = np.array(cs, dtype=np.float64)
    # distinct, shuffled, gappy cell ids — the index must sort them
    cell_list = [i * 2 + 1 for i in range(len(cs))]
    rnd.shuffle(cell_list)
    cells = np.array(cell_list, dtype=np.int64)
    st_idx = sv.centroid_index_kernel(cells, C, m)
    got = sv.shortlist_assign_kernel(V, st_idx, min(nprobe, len(st_idx["a2"])))
    assert got.tolist() == _brute_shortlist(V, cells, C, m, nprobe)


def test_shortlist_duplicate_anchor_centroids_assign_identically():
    """The documented duplicate-anchor divergence is benign: with two
    identical anchor vectors the twin keeps each in its own bucket,
    but the winning (d2, cell) assignment equals brute force."""
    C = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 2.0, 0.0], [-1.0, -1.0, 0.0]])
    cells = np.array([10, 11, 12, 13], dtype=np.int64)
    V = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-2.0, -2.0, 1.0]])
    st_idx = sv.centroid_index_kernel(cells, C, m=2)
    got = sv.shortlist_assign_kernel(V, st_idx, nprobe=2)
    assert got.tolist() == _brute_shortlist(V, cells, C, m=2, nprobe=2)


# ------------------------------------------------------ block boundaries
# The hypothesis corpora (n ≤ 24) never cross the production 1024-row
# blocks, so the block-walk seams are exercised separately: shrink the
# block constants to 3 and 5 and require bit-identical output on a
# corpus that spans many blocks (exact ±1 arithmetic ⇒ blocking may
# not change anything, not even ulps).


def _sign_corpus(n: int, seed: int = 9) -> np.ndarray:
    rng = np.random.RandomState(seed)
    V = rng.choice([-1.0, 1.0], size=(n, D))
    V[rng.choice(n, size=n // 10, replace=False)] = 0.0  # sprinkle zero-norm rows
    return V


@pytest.mark.parametrize("block", [3, 5])
def test_pair_and_mate_kernels_block_size_invariant(monkeypatch, block):
    V = _sign_corpus(64)
    ids = _ids(len(V))
    N = _normalize(V)
    base_pairs = dv.pairs_above_tau_kernel(ids, N, 0.3)
    base_topk = simv.local_topk_kernel(ids, N, 3)
    base_mate = simv.hardest_mate_kernel(ids, V, 0.5)
    monkeypatch.setattr(dv, "_PAIR_BLOCK_ROWS", block)
    monkeypatch.setattr(simv, "_NEG_BLOCK_ROWS", block)
    for base, small in (
        (base_pairs, dv.pairs_above_tau_kernel(ids, N, 0.3)),
        (base_topk, simv.local_topk_kernel(ids, N, 3)),
        (base_mate, simv.hardest_mate_kernel(ids, V, 0.5)),
    ):
        for b_col, s_col in zip(base, small):
            assert b_col.tolist() == s_col.tolist()


@pytest.mark.parametrize("block", [3, 5])
def test_owner_scan_block_size_invariant(monkeypatch, block):
    rng = np.random.RandomState(3)
    C = rng.randint(-2, 3, size=(40, 3)).astype(np.float64)
    cells = np.arange(40, dtype=np.int64)[::-1].copy()  # reversed: must sort
    base = sv.centroid_index_kernel(cells, C, m=6)
    monkeypatch.setattr(sv, "_OWNER_BLOCK_ROWS", block)
    small = sv.centroid_index_kernel(cells, C, m=6)
    for key in base:
        assert base[key].tolist() == small[key].tolist(), key


# -------------------------------------------------- sharded index waves
# The wave-sharded assignment (semantic_vectorized._shortlist_assign_
# sharded) claims BIT-IDENTITY with the one-piece kernel: every
# per-(rows, anchor) GEMM is the same either way, and the cross-wave
# min(struct(d2, cell)) reduce is the kernel's exact tie-break. These
# tests pin that claim Spark-free: run the partial kernel over every
# shard of the anchor range, reduce lexicographically, and require
# exact equality with shortlist_assign_kernel — plus the bounds
# helper's partition invariants.


def _reduce_shards(V, st_idx, nprobe, shards):
    bounds = sv.anchor_shard_bounds(st_idx["offs"], shards)
    offs = st_idx["offs"]
    B = V.shape[0]
    best_d2 = np.full(B, np.inf)
    best_cell = np.full(B, np.iinfo(np.int64).max, dtype=np.int64)
    for alo, ahi in bounds:
        blo, bhi = int(offs[alo]), int(offs[ahi])
        sub = {
            "A": st_idx["A"],
            "a2": st_idx["a2"],
            "alo": alo,
            "ahi": ahi,
            "Cb": np.ascontiguousarray(st_idx["Cb"][blo:bhi]),
            "cellsb": st_idx["cellsb"][blo:bhi],
            "c2b": st_idx["c2b"][blo:bhi],
            "offs": offs[alo : ahi + 1] - blo,
        }
        hit, d2, cell = sv.shortlist_assign_partial_kernel(V, sub, nprobe)
        better = hit & (
            (d2 < best_d2) | ((d2 == best_d2) & (cell < best_cell))
        )
        best_d2[better] = d2[better]
        best_cell[better] = cell[better]
    return bounds, best_cell


@settings(max_examples=150, deadline=None)
@given(
    st.lists(int_vec, min_size=1, max_size=12),  # queries
    st.lists(int_vec, min_size=1, max_size=16),  # centroids
    st.integers(min_value=1, max_value=6),  # m
    st.integers(min_value=1, max_value=4),  # nprobe
    st.integers(min_value=1, max_value=7),  # requested shards
    st.randoms(use_true_random=False),
)
def test_sharded_partial_kernels_reduce_to_whole(qs, cs, m, nprobe, shards, rnd):
    V = np.array(qs, dtype=np.float64)
    C = np.array(cs, dtype=np.float64)
    cell_list = [i * 2 + 1 for i in range(len(cs))]
    rnd.shuffle(cell_list)
    cells = np.array(cell_list, dtype=np.int64)
    st_idx = sv.centroid_index_kernel(cells, C, m)
    nprobe_eff = min(nprobe, len(st_idx["a2"]))
    whole = sv.shortlist_assign_kernel(V, st_idx, nprobe_eff)
    bounds, sharded = _reduce_shards(V, st_idx, nprobe_eff, shards)
    assert sharded.tolist() == whole.tolist()
    # partition invariants: contiguous, non-empty, covers [0, m)
    m_eff = len(st_idx["a2"])
    assert bounds[0][0] == 0 and bounds[-1][1] == m_eff
    for (alo, ahi), (nlo, _) in zip(bounds, bounds[1:]):
        assert ahi == nlo
    assert all(alo < ahi for alo, ahi in bounds)
    assert len(bounds) <= max(1, min(shards, m_eff))


def test_anchor_shard_bounds_balances_by_block_rows():
    # skewed buckets: anchor 0 owns 90 rows, the rest own 1 each —
    # cutting by anchor count would put ~all rows in shard 0
    offs = np.array([0, 90, 91, 92, 93, 94, 95, 96, 97, 98, 99, 100])
    bounds = sv.anchor_shard_bounds(offs, 2)
    assert bounds[0] == (0, 1)  # the hot anchor rides alone
    assert bounds[-1][1] == len(offs) - 1
