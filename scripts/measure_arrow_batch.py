"""Arrow batch-size A/B for the vectorized GEMM kernels (r7).

The twins (operators/*_vectorized.py) do one BLAS GEMM per Arrow batch;
`spark.sql.execution.arrow.maxRecordsPerBatch` (default 10 000) sets
the batch height, so it bounds GEMM size and the number of
Python-worker round trips. Bigger batches amortize better — in theory.
Measure, don't assume (the r7 unrolled-expression lesson): time the
full-corpus shortlist assignment (the 10M rung's dominant twin stage)
over the SAME corpus at several batch sizes. The derived centroid
table is built ONCE and deliberately shared across all arms — the
values_match_baseline check compares each arm's assignments against
the first arm's, which only means anything when every arm scores the
same centroids.

Usage: python scripts/measure_arrow_batch.py [corpus_dir] [n_for_k]
       (defaults: /tmp/scale_probe_2m, 2_000_000)
Emits one JSON line per arm to stdout and docs/arrow_batch_r7.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "arrow_batch_r7.jsonl",
)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_2m"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from pyspark.sql import functions as F

    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.operators.semantic import (
        SEM_NPROBE,
        _seed_centroids,
        coarse_m,
        derive_k,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.semantic_vectorized import (
        shortlist_assign_vectorized,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        as_double_vec,
    )

    spark = get_spark(app_name="arrow_batch_ab")
    emb = spark.read.parquet(f"{corpus}/embeddings.parquet")
    base = emb.select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    ).persist()
    base.count()  # warm the persist so every arm reads the same cache
    k = derive_k(n_docs)
    m = coarse_m(k)
    centroids = _seed_centroids(spark, base, k)

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    baseline_rows = None
    for batch in (10_000, 32_768, 65_536, 131_072):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        assigned = shortlist_assign_vectorized(spark, base, centroids, m, SEM_NPROBE)
        # checksum rides the timed action; also pins value-invariance
        # across batch sizes (batch height must not change assignments)
        agg = assigned.agg(
            F.count(F.lit(1)).alias("n"), F.sum("cell").alias("cellsum")
        ).first()
        dt = time.time() - t0
        rec = {
            "op": "shortlist_assign_vectorized_batch_ab",
            "arrow_batch": batch,
            "n_docs": n_docs,
            "k": k,
            "seconds": round(dt, 2),
            "rows": int(agg["n"]),
            "cellsum": int(agg["cellsum"]),
        }
        if baseline_rows is None:
            baseline_rows = (rec["rows"], rec["cellsum"])
        rec["values_match_baseline"] = (rec["rows"], rec["cellsum"]) == baseline_rows
        line = json.dumps(rec)
        print(line, flush=True)
        with open(RESULTS, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
