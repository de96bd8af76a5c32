"""Pandas-UDF surface: every vectorized Python function must agree with
its JVM twin (the Python path may never drift from built-in semantics).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    return load_table(spark, SF_SMOKE, "documents")


def _emb(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    return load_table(spark, SF_SMOKE, "embeddings")


def test_quality_score_matches_jvm_twin(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.functions import (
        quality_score_pandas,
    )

    docs = _docs(spark)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    jvm = (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("s")
    both = docs.select(
        "doc_id", jvm, quality_score_pandas(F.col("text")).alias("p")
    )
    mismatch = both.filter(F.col("s") != F.col("p")).count()
    assert mismatch == 0


def test_cosine_udf_matches_jvm_fold(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.functions import (
        cosine_to_query_pandas,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        dot,
        with_norm,
    )

    e = _emb(spark)
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    udf_cos = cosine_to_query_pandas(qvec)
    py = {r.vec_id: r.c for r in e.select("vec_id", udf_cos(F.col("embedding")).alias("c")).collect()}

    en = with_norm(e)
    qn = math.sqrt(sum(x * x for x in qvec))
    qcol = F.array(*[F.lit(x) for x in qvec])
    jvm = {
        r.vec_id: r.c
        for r in en.select(
            "vec_id", (dot(F.col("v"), qcol) / (F.col("norm") * F.lit(qn))).alias("c")
        ).collect()
    }
    for vid, c in jvm.items():
        # numpy BLAS dot and the sequential fold may differ in last ulps
        assert abs(py[vid] - c) < 1e-12


def test_centroids_by_label(spark):
    import numpy as np

    from data_lake_construction_and_querying_with_pyspark_spark.functions import (
        centroids_by_label,
    )

    e = _emb(spark)
    cents = {r.label: (r.centroid, r.n_vectors) for r in centroids_by_label(e).collect()}
    # independent check for one label via pandas
    pdf = e.filter(F.col("label") == 0).toPandas()
    expect = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype="float64"))).mean(axis=0)
    got, n = cents[0]
    assert n == len(pdf)
    assert np.allclose(got, expect)
    # every label present, centroid dim matches
    assert len(cents) == e.select("label").distinct().count()
    assert all(len(c) == 64 for c, _ in cents.values())


def test_chunk_udtf_matches_jvm_chunker(spark):
    """The Python UDTF chunker and the JVM sequence+slice chunker must
    emit identical rows (SQL lateral-join usage)."""
    from data_lake_construction_and_querying_with_pyspark_spark.functions.vectorized import (
        make_chunk_udtf,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.text import (
        text_chunk_windows,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    spark.udtf.register("chunk_udtf", make_chunk_udtf())
    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView("documents")
    via_udtf = spark.sql(
        "SELECT c.* FROM documents d, LATERAL chunk_udtf(d.doc_id, d.text) c"
    )
    jvm = text_chunk_windows(spark, SF_SMOKE)
    assert sorted(map(tuple, via_udtf.collect())) == sorted(map(tuple, jvm.collect()))


def test_weighted_mean_udaf_matches_jvm(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.functions.vectorized import (
        weighted_mean_pandas,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    via_udaf = {
        r.l_returnflag: r.wavg
        for r in li.groupBy("l_returnflag")
        .agg(weighted_mean_pandas("l_discount", "l_quantity").alias("wavg"))
        .collect()
    }
    jvm = {
        r.l_returnflag: r.wavg
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("l_discount") * F.col("l_quantity")) / F.sum("l_quantity")
            ).alias("wavg")
        )
        .collect()
    }
    assert via_udaf.keys() == jvm.keys()
    for k in jvm:
        assert abs(via_udaf[k] - jvm[k]) < 1e-9, (k, via_udaf[k], jvm[k])


def test_weighted_mean_udaf_null_on_zero_weight(spark):
    """All-zero weights must yield NULL (matching the JVM twin), not
    NaN/inf."""
    from data_lake_construction_and_querying_with_pyspark_spark.functions.vectorized import (
        weighted_mean_pandas,
    )

    df = spark.createDataFrame([("a", 1.0, 0.0), ("a", 2.0, 0.0), ("b", 3.0, 2.0)], "g string, v double, w double")
    got = {r.g: r.wavg for r in df.groupBy("g").agg(weighted_mean_pandas("v", "w").alias("wavg")).collect()}
    assert got["a"] is None
    assert abs(got["b"] - 3.0) < 1e-12


def test_map_in_arrow_token_stats_matches_jvm(spark):
    """mapInArrow token counts must be row-identical to the JVM
    size(filter(split)) expression over the documents fixture."""
    from data_lake_construction_and_querying_with_pyspark_spark.functions.vectorized import (
        token_stats_arrow,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").unionByName(
        # null text must agree too (both twins coalesce to '' → 0 tokens)
        spark.createDataFrame([(990001, None)], "doc_id bigint, text string")
    )
    got = {r.doc_id: r.n_tokens for r in token_stats_arrow(docs).collect()}
    toks = F.filter(F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda t: t != "")
    want = {
        r.doc_id: r.n
        for r in docs.select("doc_id", F.size(toks).alias("n")).collect()
    }
    assert got == want
    assert got[990001] == 0
