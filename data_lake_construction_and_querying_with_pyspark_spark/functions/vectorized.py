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


def make_chunk_udtf():
    """Python UDTF (Spark 4 table function) twin of
    ``operators/text.py::text_chunk_windows``: one input row (doc_id,
    text) → N chunk rows, window 50 / stride 40. The UDTF is the
    escape hatch for row-expanding Python logic a tokenizer library
    would need (real BPE, sentence splitting); the JVM sequence+slice
    version is the scale path, and tests pin them row-identical.

    Returned lazily (class definition, not instance) so importing this
    module never requires an active session.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, start_idx int, chunk_text string, n_chunk_tokens int")
    class ChunkUDTF:
        def eval(self, doc_id, text):
            toks = [t for t in (text or "").split(" ") if t]
            n = len(toks)
            for s in range(0, n, 40):
                w = toks[s : s + 50]
                yield doc_id, s + 1, " ".join(w), len(w)

    return ChunkUDTF


@pandas_udf(T.DoubleType())
def weighted_mean_pandas(value: pd.Series, weight: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDAF (Series → scalar): quantity-
    weighted mean. The custom-UDAF escape hatch — Arrow ships each
    group's columns as one batch, numpy reduces it. JVM twin:
    sum(value*weight)/sum(weight); tests assert agreement to 1e-9
    (float summation order differs, so bit-equality isn't the
    contract here, unlike the oracle-checked decimal paths)."""
    w = weight.astype("float64")
    total = w.sum()
    if total == 0.0:  # all-zero/all-null weights: JVM twin yields NULL, not NaN
        return None
    return float((value.astype("float64") * w).sum() / total)


def token_stats_arrow(docs: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of the token-stats projection — the fifth
    and lowest-level Python batch API (raw ``pyarrow.RecordBatch`` in
    and out, no pandas materialization): for per-batch logic that wants
    zero-copy Arrow compute or to feed an Arrow-native library
    (tokenizers, DataFusion, polars) directly. Computes (doc_id,
    n_tokens) per document with pyarrow compute kernels only. JVM twin:
    ``size(filter(split(coalesce(text, ''), ' '), t -> t != ''))``;
    tests pin them row-identical. NULL text is coalesced to '' BEFORE
    the Python boundary (n_tokens=0) — without it the twins diverge on
    null input: pyarrow drops null list rows (→ 0) while the bare JVM
    ``size`` of a null array returns -1."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_stats(batches):
        for batch in batches:
            toks = pc.split_pattern(batch.column("text"), " ")
            # drop the empty strings a leading/trailing/double space makes:
            # count total elements minus empties, per list row
            flat = pc.list_flatten(toks)
            nonempty = pc.not_equal(flat, "")
            parents = pc.list_parent_indices(toks)
            counts = pa.Table.from_arrays(
                [parents.filter(nonempty)], names=["parent"]
            ).group_by("parent").aggregate([("parent", "count")])
            by_parent = dict(
                zip(
                    counts.column("parent").to_pylist(),
                    counts.column("parent_count").to_pylist(),
                )
            )
            n = pa.array(
                [by_parent.get(i, 0) for i in range(batch.num_rows)], type=pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), n], names=["doc_id", "n_tokens"]
            )

    return docs.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    ).mapInArrow(batch_stats, schema="doc_id bigint, n_tokens int")
