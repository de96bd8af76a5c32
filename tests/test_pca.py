"""PCA power-iteration invariants the oracle equality can't express
(identical-wrong-pair argument), plus the fast-Gram ≈ exact-Gram
equivalence that justifies shipping the mapInPandas path as the
production Gram."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import (
        load_table,
    )

    return load_table(spark, SF_SMOKE, "embeddings")


def test_gram_fast_matches_exact(spark, emb):
    """Per-partition numpy Gram (production path) agrees with the
    exact-decimal explode-join Gram to float-sum reassociation noise."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.pca import (
        _DIM,
        gram_matrix_exact,
        gram_matrix_fast,
    )

    exact = np.zeros((_DIM, _DIM))
    for r in gram_matrix_exact(emb).collect():
        exact[r["i"] - 1, r["j"] - 1] = r["gv"]
    fast = np.array(gram_matrix_fast(emb))
    assert np.allclose(fast, exact, rtol=1e-9, atol=1e-9)
    # Gram is symmetric PSD: symmetry exactly (decimal sums of the
    # same products), PSD via numpy eigvalsh
    assert np.array_equal(exact, exact.T)
    assert np.linalg.eigvalsh(exact).min() > -1e-6


def test_power_iteration_shape_and_normalization(spark, queries):
    rows = queries["pca_top_component"](spark, SF_SMOKE).collect()
    assert len(rows) == 64
    loadings = [r.loading for r in rows]
    lams = {r.eigenvalue_maxabs for r in rows}
    assert len(lams) == 1 and lams.pop() > 0
    assert max(abs(x) for x in loadings) == 1.0  # max-abs normalization


def test_power_iteration_raises_rayleigh_quotient(spark, emb, queries):
    """Each power step is monotone in the Rayleigh quotient for a
    symmetric PSD matrix — the output direction must explain at least
    as much variance as the all-ones start (strictly more on any
    non-degenerate corpus)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.pca import (
        gram_matrix_fast,
    )

    g = np.array(gram_matrix_fast(emb))
    out = sorted(
        queries["pca_top_component"](spark, SF_SMOKE).collect(),
        key=lambda r: r.dim_idx,
    )
    v = np.array([r.loading for r in out])
    v0 = np.ones(64)

    def rayleigh(x):
        return float(x @ g @ x / (x @ x))

    assert rayleigh(v) >= rayleigh(v0) * (1 - 1e-12)


@pytest.fixture(scope="module")
def queries():
    from data_lake_construction_and_querying_with_pyspark_spark.registry import all_queries

    return all_queries()
