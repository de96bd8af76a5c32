"""Distributed PCA by power iteration over the embedding Gram matrix —
the embedding-analysis stage (whitening / dominant-direction removal /
anisotropy diagnosis) that SemDeDup-style pipelines run before
clustering, and the classic way to sanity-check an embedding column
("is 90% of the variance one rogue direction?").

No reference counterpart (the reference's query layer stops at SQL
pass-through, reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:113``);
public algorithm (power iteration / von Mises, and Halko et al. 2011
for the randomized relatives).

Two computations, one contract:

* **Gram matrix** ``G[i,j] = Σ_vec v_i·v_j`` (d×d = 64×64 = 4 096
  cells). The oracle-checkable path explodes each vector once and
  self-joins on ``vec_id`` — n·d² product rows, each quantized to a
  FIXED-POINT GRID (``FLOOR(product · 1e15)``, an exact integer)
  BEFORE the SUM so partial-aggregation order cannot move a cell.
  Why floor-to-integer instead of the repo's usual
  ``CAST(x AS DECIMAL(p,s))``: a 53-bit double PRODUCT has a long
  decimal tail, and the engines' double→decimal conversions round it
  differently (Java BigDecimal expands the exact binary value;
  DuckDB multiplies by 10^s in floating point — measured: 2 161 of
  4 096 Gram cells off by 1 ulp under the decimal cast). The double
  multiply and FLOOR are correctly-rounded/exact in BOTH engines, and
  integer→decimal conversion is unambiguous, so the quantized sums
  are bit-identical. Quantization is the documented determinism cost
  (1e-15 per product — the ``outlier_orders_zscore`` rounded-grid
  contract), and assumes O(1)-normalized embedding coordinates
  (|x_i·x_j|·1e15 must fit a BIGINT). The production path at 100 TB
  is :func:`gram_matrix_fast`: per-partition numpy ``Xᵀ·X`` via
  ``mapInPandas`` — one pass, d² floats per partition, no exploded
  shuffle — equivalence-tested against the exact path.

* **Power iteration** (``_PCA_ITERS`` = 3 fixed steps from the
  all-ones start): u ← G·v, v ← u / max|u|. The 64-row matvec runs
  distributed with the same fixed-point sums (grid 1e9 — G entries
  grow with n, so the product ``G_ij·v_j·1e9`` stays under 2⁵³ up to
  ~10⁸-row corpora); the 64 values
  materialize to the driver between steps (the Lloyd's-centroid /
  BPE-argmax driver-bounded shape) and re-enter the next plan as
  double literals. Normalizing by max|u| instead of ‖u‖₂ avoids the
  one libm call (sqrt) that has no cross-engine ulp guarantee —
  max and IEEE division are exact/correctly-rounded in both engines,
  so the DuckDB oracle replays every iteration bit-for-bit as chained
  CTEs.

Scale shape (100 TB): the corpus is touched ONCE (Gram); every
iteration is a d×d job, corpus-independent — the same collapse as BPE
(corpus → vocabulary) with d² in place of |V|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
    as_double_vec,
)
from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

_PCA_ITERS = 3
_DIM = 64


def gram_matrix_exact(emb: DataFrame) -> DataFrame:
    """(i, j, gv): fixed-point-exact Gram matrix of the ``embedding``
    column, 1-based dims — the oracle-checkable path (n·d² product
    rows, FLOOR(product·1e15) integer grid before SUM — see module
    docstring for why not a decimal cast — map-side partials)."""
    xs = emb.select(
        "vec_id",
        F.posexplode(as_double_vec(F.col("embedding"))).alias("p", "x"),
    ).select("vec_id", (F.col("p") + 1).alias("i"), "x")
    a, b = xs.alias("a"), xs.alias("b")
    q = F.floor((F.col("a.x") * F.col("b.x")) * F.lit(1e15))
    return (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            (F.sum(q.cast("decimal(38,0)")).cast("double") / F.lit(1e15)).alias("gv")
        )
    )


def gram_matrix_fast(emb: DataFrame) -> "list[list[float]]":
    """Production Gram path: per-partition numpy ``Xᵀ·X`` over Arrow
    batches (``mapInPandas``), partials summed driver-side — one corpus
    pass, zero exploded rows, d² doubles per partition crossing to the
    driver. Float-sum order differs from the exact path by design;
    ``tests/test_pca.py`` pins agreement to ~1e-9 relative."""
    import numpy as np
    import pandas as pd

    def partial(batches):
        acc = np.zeros((_DIM, _DIM))
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype="float64")
            if len(x):
                acc += x.T @ x
        yield pd.DataFrame({"g": [acc.ravel().tolist()]})

    parts = emb.select("embedding").mapInPandas(partial, "g array<double>").collect()
    import numpy as np  # noqa: F811

    total = np.zeros((_DIM, _DIM))
    for r in parts:
        total += np.array(r["g"]).reshape(_DIM, _DIM)
    return total.tolist()


def pca_power_iteration(
    spark: SparkSession, emb: DataFrame, iters: int = _PCA_ITERS
) -> DataFrame:
    """Dominant principal direction of the embedding column by
    ``iters`` fixed power-iteration steps over the exact-decimal Gram
    matrix. Returns 64 rows ``(dim_idx, loading, eigenvalue_maxabs)``
    — the max-|u|-normalized component and the final max|u| (the
    eigenvalue estimate under that normalization).

    Every matvec sum runs on the fixed-point grid (module docstring);
    the 64-value vector materializes
    to the driver between steps and re-enters as double literals;
    normalization is one IEEE division per coordinate in Python (==
    DuckDB's double division) — the full chain replays bit-for-bit in
    the oracle."""
    g = gram_matrix_exact(emb).persist()
    v = [1.0] * _DIM
    lam = 1.0
    for _ in range(iters):
        vlit = F.array(*[F.lit(float(x)) for x in v])
        t = F.floor((F.col("gv") * F.element_at(vlit, F.col("j"))) * F.lit(1e9))
        u_rows = (
            g.select("i", t.cast("decimal(38,0)").alias("t"))
            .groupBy("i")
            .agg((F.sum("t").cast("double") / F.lit(1e9)).alias("uv"))
            .collect()
        )
        u = [0.0] * _DIM
        for r in u_rows:
            u[r["i"] - 1] = r["uv"]
        lam = max(abs(x) for x in u)
        v = [x / lam for x in u]
    g.unpersist()
    return spark.createDataFrame(
        [(i + 1, v[i], lam) for i in range(_DIM)],
        "dim_idx int, loading double, eigenvalue_maxabs double",
    )


def _oracle_pca(iters: int = _PCA_ITERS, dim: int = _DIM) -> str:
    """Chained-CTE replay: exact-decimal Gram, then per-iteration
    matvec (decimal-cut) → max|u| → IEEE-divide normalization."""
    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        steps.append(
            f"""u{t} AS MATERIALIZED (
        SELECT g.i AS j,
               CAST(SUM(CAST(FLOOR((g.gv * {prev}.vv) * 1e9) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1e9 AS uv
        FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY g.i
    ),
    m{t} AS (SELECT MAX(ABS(uv)) AS mx FROM u{t}),
    v{t} AS MATERIALIZED (SELECT j, uv / mx AS vv FROM u{t}, m{t})"""
        )
        prev = f"v{t}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH xs AS MATERIALIZED (
        SELECT vec_id,
               generate_subscripts(embedding::DOUBLE[], 1) AS i,
               unnest(embedding::DOUBLE[]) AS x
        FROM embeddings
    ),
    g AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(CAST(FLOOR((a.x * b.x) * 1e15) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1e15 AS gv
        FROM xs a JOIN xs b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    ),
    v0 AS (SELECT i AS j, 1.0e0 AS vv FROM range(1, {dim + 1}) r(i)),
    {chain}
    SELECT CAST(v{iters}.j AS INT) AS dim_idx,
           v{iters}.vv AS loading,
           m{iters}.mx AS eigenvalue_maxabs
    FROM v{iters}, m{iters}
    """


@register("pca_top_component", oracle=_oracle_pca())
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embeddings table (3 power
    iterations, max-abs normalization — see module docstring for the
    determinism contract). 64 rows (dim_idx, loading,
    eigenvalue_maxabs); the DuckDB oracle replays Gram + every
    iteration as chained CTEs, hash-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return pca_power_iteration(spark, emb)
