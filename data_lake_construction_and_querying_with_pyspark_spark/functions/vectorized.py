"""Vectorized Python functions — the sanctioned slow path.

Policy: hot paths stay JVM-side (every oracle-checked query does); when
Python is genuinely needed (custom scoring models, numpy math), it
enters ONLY as Arrow-batched ``pandas_udf`` / ``applyInPandas`` —
10-100× over row-at-a-time ``F.udf``, which this engine deliberately
never uses. These functions exist to pin that pattern with tests: each
has a JVM twin and the tests assert equivalence, so the Python surface
can never drift from the built-in semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def quality_score_pandas(text: pd.Series) -> pd.Series:
    """Vectorized quality ratio: distinct-token / token count (type-
    token ratio). JVM twin: size(array_distinct(tokens))/size(tokens)
    in operators/text.py — tests assert bit-equality."""
    toks = text.str.split(" ").map(lambda ts: [t for t in ts if t])
    n = toks.map(len)
    d = toks.map(lambda ts: len(set(ts)))
    return d / n


def cosine_to_query_pandas(query_vec: list[float]):
    """Factory: pandas_udf computing cosine similarity of each row's
    embedding to a fixed query vector with numpy (batch matrix math).
    JVM twin: the zip_with/aggregate fold in operators/similarity.py."""
    import numpy as np

    q = np.asarray(query_vec, dtype="float64")
    qn = float(np.sqrt((q * q).sum()))

    @pandas_udf(T.DoubleType())
    def _cos(embedding: pd.Series) -> pd.Series:
        m = np.stack(embedding.map(lambda v: np.asarray(v, dtype="float64")))
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return _cos


def centroids_by_label(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid via applyInPandas (grouped-map, Arrow
    batches): the pattern for per-group numpy/model work that doesn't
    decompose into built-in aggregates. Returns (label, centroid,
    n_vectors)."""
    import numpy as np

    dim = len(embeddings.select("embedding").first()[0])
    schema = T.StructType(
        [
            T.StructField("label", T.IntegerType()),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
            T.StructField("n_vectors", T.LongType()),
        ]
    )

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype="float64")))
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "centroid": [m.mean(axis=0).tolist()],
                "n_vectors": [len(pdf)],
            }
        )

    _ = dim  # dim validated eagerly so schema errors surface at build time
    return embeddings.select("label", "embedding").groupBy("label").applyInPandas(
        centroid, schema=schema
    )
