"""Streaming lake-sink tests: foreachBatch ingestion and custom
stateful operators, driven as real streaming queries (availableNow).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_us_dir(spark, tmp_path_factory):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    d = str(tmp_path_factory.mktemp("events_sink_src"))
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    return d


def test_foreach_batch_ingests_lake(spark, events_us_dir, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        foreach_batch_dedup_append,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        stream_events,
    )

    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_dedup_append(
        stream_events(spark, events_us_dir, max_files_per_trigger=1),
        lake_path=lake,
        checkpoint_path=ckpt,
        dedup_cols=["event_id"],
        register_as="ingested_events",
    )
    q.awaitTermination()
    src_n = spark.read.parquet(events_us_dir).count()
    lake_df = spark.read.parquet(lake)
    assert lake_df.count() == src_n
    assert "_ingest_batch_id" in lake_df.columns
    # the registered view is queryable by the normal SQL surface
    # (global_temp: foreachBatch runs in a cloned session)
    assert (
        spark.sql("SELECT COUNT(DISTINCT event_id) FROM global_temp.ingested_events").first()[0]
        == src_n
    )

    # restart on the same checkpoint: no new input → no duplicate appends
    q2 = foreach_batch_dedup_append(
        stream_events(spark, events_us_dir, max_files_per_trigger=1),
        lake_path=lake,
        checkpoint_path=ckpt,
        dedup_cols=["event_id"],
    )
    q2.awaitTermination()
    assert spark.read.parquet(lake).count() == src_n


def test_stateful_running_counts(spark, events_us_dir):
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        stateful_running_counts,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        stream_events,
    )

    out = stateful_running_counts(stream_events(spark, events_us_dir, max_files_per_trigger=1))
    q = (
        out.writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = spark.table("running_counts")
    # final lifetime count per user == batch count (single batch file)
    final = res.groupBy("user_id").agg(F.max("lifetime_events").alias("lifetime"))
    expected = (
        spark.read.parquet(events_us_dir).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    joined = final.join(expected, "user_id")
    assert joined.filter(F.col("lifetime") != F.col("n")).count() == 0
    assert final.count() == expected.count()


def test_streaming_neardup_index_equals_batch(spark, tmp_path):
    """The stream-maintained near-dup index must equal batch: draining
    the corpus through streaming_neardup_index in 4 micro-batches
    (maxFilesPerTrigger=1) yields exactly the pair set of the batch
    MinHash operator over the whole corpus, and a checkpoint-driven
    restart appends nothing (replay safety)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        dedup_minhash_near_dup,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        init_neardup_index,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        streaming_neardup_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs_src")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    idx = str(tmp_path / "nd_idx")
    ckpt = str(tmp_path / "nd_ckpt")
    pairs_path = str(tmp_path / "nd_pairs")
    init_neardup_index(spark, idx)

    def doc_stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = streaming_neardup_index(doc_stream(), idx, ckpt, pairs_path)
    q.awaitTermination()

    streamed = {
        (r.doc_a, r.doc_b, r.jaccard) for r in spark.read.parquet(pairs_path).collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_minhash_near_dup(spark, SF_SMOKE).collect()
    }
    assert streamed == batch and len(batch) > 0
    # multiple micro-batches EMITTED pairs — if every pair were
    # intra-batch the cross-batch index-probe path (the sink's whole
    # point) would be exercised zero times and this test would prove
    # nothing about it
    n_batches = (
        spark.read.parquet(pairs_path).select("_ingest_batch_id").distinct().count()
    )
    assert n_batches >= 2, n_batches
    n_bands = spark.read.parquet(f"{idx}/bands.parquet").count()

    # restart on the same checkpoint: no new files → index and pairs unchanged
    q2 = streaming_neardup_index(doc_stream(), idx, ckpt, pairs_path)
    q2.awaitTermination()
    assert spark.read.parquet(f"{idx}/bands.parquet").count() == n_bands
    assert {
        (r.doc_a, r.doc_b, r.jaccard) for r in spark.read.parquet(pairs_path).collect()
    } == batch


def test_streaming_neardup_index_refuses_legacy_flat_pairs_layout(spark, tmp_path):
    """Pre-r3 checkpoints wrote pairs FLAT (batch id as a data column);
    the partitioned sink must refuse such a root at startup rather than
    mix loose files with _ingest_batch_id=N/ dirs (ADVICE r3). Since r5
    the guard resolves through the Hadoop FileSystem API (ADVICE r4:
    os.path silently no-ops on hdfs://, s3a:// roots), so it needs the
    session — but still no stream needs to start to hit it."""
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        _require_partitioned_pairs_layout,
    )

    legacy = tmp_path / "legacy_pairs"
    legacy.mkdir()
    (legacy / "part-00000-abc.snappy.parquet").write_bytes(b"PAR1")
    (legacy / "_SUCCESS").write_bytes(b"")
    with pytest.raises(ValueError, match="legacy flat layout"):
        _require_partitioned_pairs_layout(spark, str(legacy))

    # absent path and partitioned layout both pass
    _require_partitioned_pairs_layout(spark, str(tmp_path / "nonexistent"))
    part = tmp_path / "part_pairs"
    (part / "_ingest_batch_id=0").mkdir(parents=True)
    (part / "_SUCCESS").write_bytes(b"")
    _require_partitioned_pairs_layout(spark, str(part))
    # the scheme-qualified form of the same root resolves identically
    # through the Hadoop FS (the case os.path could not see)
    _require_partitioned_pairs_layout(spark, f"file://{part}")
    with pytest.raises(ValueError, match="legacy flat layout"):
        _require_partitioned_pairs_layout(spark, f"file://{legacy}")


def test_streaming_embedding_index_equals_batch(spark, tmp_path):
    """The stream-maintained sign-LSH embedding index must equal batch:
    draining the planted-clone corpus through streaming_embedding_index
    in 4 micro-batches yields exactly the pair set of the batch scaled-
    geometry operator over the whole corpus, and a checkpoint restart
    appends nothing (replay safety)."""
    from pyspark.sql import functions as F

    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        _CLONE_MOD,
        _CLONE_OFF,
        _SCALED_TAU,
        embedding_cosine_pairs_scaled,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        init_embedding_index,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        as_double_vec,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        streaming_embedding_index,
    )

    # the registered batch query's corpus: fixture vectors + planted clones
    base = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("embedding")
    )
    clones = base.filter(F.col("vec_id") % _CLONE_MOD == 0).select(
        (F.col("vec_id") + F.lit(_CLONE_OFF)).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    corpus = base.unionByName(clones)
    src = str(tmp_path / "emb_src")
    corpus.repartition(4).write.mode("overwrite").parquet(src)

    idx = str(tmp_path / "emb_idx")
    ckpt = str(tmp_path / "emb_ckpt")
    pairs_path = str(tmp_path / "emb_pairs")
    init_embedding_index(spark, idx)

    def emb_stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = streaming_embedding_index(emb_stream(), idx, ckpt, pairs_path, tau=_SCALED_TAU)
    q.awaitTermination()

    streamed = {
        (r.vec_a, r.vec_b, r.cosine) for r in spark.read.parquet(pairs_path).collect()
    }
    batch = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_cosine_pairs_scaled(spark, corpus, tau=_SCALED_TAU).collect()
    }
    spark.catalog.clearCache()
    assert streamed == batch and len(batch) > 0
    # the cross-batch probe path must actually fire: pairs from ≥2 batches
    n_batches = (
        spark.read.parquet(pairs_path).select("_ingest_batch_id").distinct().count()
    )
    assert n_batches >= 2, n_batches
    n_buckets = spark.read.parquet(f"{idx}/buckets.parquet").count()

    # restart on the same checkpoint: no new files → index and pairs unchanged
    q2 = streaming_embedding_index(emb_stream(), idx, ckpt, pairs_path, tau=_SCALED_TAU)
    q2.awaitTermination()
    assert spark.read.parquet(f"{idx}/buckets.parquet").count() == n_buckets
    assert {
        (r.vec_a, r.vec_b, r.cosine) for r in spark.read.parquet(pairs_path).collect()
    } == batch


def test_streaming_knn_graph_index_equals_batch(spark, tmp_path):
    """The stream-maintained kNN graph must equal batch (r4 stretch
    directive #9, streaming face): draining the probe corpus through
    streaming_knn_graph_index in 4 micro-batches leaves the edge store
    equal — rank columns included — to similarity.knn_graph_edges over
    the whole corpus, and a checkpoint restart changes nothing."""
    from scripts.scale_probe import build_embeddings
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        init_knn_graph_index,
        knn_graph_read_edges,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        knn_graph_edges,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.sinks import (
        streaming_knn_graph_index,
    )

    corpus = build_embeddings(spark, 400).localCheckpoint()
    src = str(tmp_path / "g_src")
    corpus.repartition(4).write.mode("overwrite").parquet(src)

    idx = str(tmp_path / "g_idx")
    ckpt = str(tmp_path / "g_ckpt")
    init_knn_graph_index(spark, idx)

    def g_stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = streaming_knn_graph_index(g_stream(), idx, ckpt)
    q.awaitTermination()

    streamed = {tuple(r) for r in knn_graph_read_edges(spark, idx).collect()}
    batch = {tuple(r) for r in knn_graph_edges(spark, corpus).collect()}
    spark.catalog.clearCache()
    assert streamed == batch and len(batch) > 0

    # restart on the same checkpoint: no new files → graph unchanged
    q2 = streaming_knn_graph_index(g_stream(), idx, ckpt)
    q2.awaitTermination()
    assert {tuple(r) for r in knn_graph_read_edges(spark, idx).collect()} == batch
