"""Per-micro-batch candidate volume for the streaming embedding
near-dup index (VERDICT r7 directive #6 — "record one measured
per-batch candidate-volume number to justify deferring the streaming
GEMM twin"; the deliverable is the number, not the feature).

The question: does the fold-scored exact-cosine verify inside
``operators.incremental.embedding_neardup_incremental`` ever approach
the measured interpreted-fold wall (~8×10⁵ fold-dots/s box-wide, the
10M batch-rung killer), or are per-batch candidate sets small enough
that the fold path's oracle-friendly arithmetic stays free?

Method: drain an n-vector corpus (scale_probe's generator, planted
near-dup pairs) through the index in fixed-size micro-batches — the
same ingest the streaming sink replays — and before each batch's index
mutation, count the batch's VERIFY CANDIDATES exactly as the operator
builds them: distinct cross/intra (tbl,bucket) collisions between the
batch's bucket rows and buckets_old ∪ buckets_batch. Emits one JSON
line per batch plus a summary to stdout and docs/stream_candidates_r8.jsonl.

Usage: python scripts/measure_stream_candidates.py [n_vecs] [batch_rows]
       (defaults: 1_000_000, 100_000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "stream_candidates_r8.jsonl",
)


def emit(rec: dict) -> None:
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from scripts.scale_probe import build_embeddings
    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
        embedding_neardup_incremental,
        init_embedding_index,
    )

    spark = get_spark(app_name="stream_candidates_r8")
    work = tempfile.mkdtemp(prefix="stream_cand_")
    index_dir = f"{work}/index"
    init_embedding_index(spark, index_dir)

    corpus = build_embeddings(spark, n_vecs)
    n_batches = (n_vecs + batch_rows - 1) // batch_rows
    volumes = []
    try:
        for b in range(n_batches):
            batch = corpus.filter(
                (F.col("vec_id") >= b * batch_rows) & (F.col("vec_id") < (b + 1) * batch_rows)
            ).select("vec_id", "embedding")

            # candidate volume, counted the way the operator builds its
            # verify set (incremental.py): distinct unordered collisions
            # of the batch's bucket rows against old ∪ batch buckets
            from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
                lsh_multi_buckets_flat,
                with_norm,
            )
            from data_lake_construction_and_querying_with_pyspark_spark.operators.incremental import (
                EMB_INDEX_PLANES,
                EMB_INDEX_TABLES,
            )

            buckets_old = spark.read.parquet(f"{index_dir}/buckets.parquet")
            b_new = lsh_multi_buckets_flat(
                with_norm(batch), n_tables=EMB_INDEX_TABLES, n_planes=EMB_INDEX_PLANES
            ).select("vec_id", "tbl", "bucket")
            b_all = buckets_old.unionByName(b_new)
            t0 = time.time()
            n_cand = (
                b_new.select("tbl", "bucket", F.col("vec_id").alias("new_id"))
                .join(b_all, ["tbl", "bucket"])
                .filter(F.col("new_id") != F.col("vec_id"))
                .select(
                    F.least("new_id", "vec_id").alias("a"),
                    F.greatest("new_id", "vec_id").alias("b"),
                )
                .distinct()
                .count()
            )
            probe_s = time.time() - t0

            t0 = time.time()
            pairs = embedding_neardup_incremental(spark, batch, index_dir)
            n_pairs = pairs.count()
            ingest_s = time.time() - t0
            volumes.append(n_cand)
            emit(
                {
                    "op": "stream_batch",
                    "batch": b,
                    "batch_rows": batch_rows,
                    "indexed_before": b * batch_rows,
                    "verify_candidates": n_cand,
                    "pairs_found": n_pairs,
                    "candidate_count_seconds": round(probe_s, 2),
                    "ingest_seconds": round(ingest_s, 2),
                }
            )
        emit(
            {
                "op": "summary",
                "n_vecs": n_vecs,
                "batch_rows": batch_rows,
                "max_batch_candidates": max(volumes),
                "mean_batch_candidates": sum(volumes) // len(volumes),
                "fold_wall_dots_per_s": 8e5,
                "max_batch_fold_seconds": round(max(volumes) / 8e5, 1),
            }
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
