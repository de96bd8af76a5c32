"""IVF-PQ scale rung: time ``ivf_pq_topk`` on the deterministic
scale-probe corpus with 50 planted queries and report planted-partner
recovery at ADC rank ≤ 3 (the same protocol as the PQ-ADC rungs in
docs/SCALING.md — fresh process per rung, noop-sink timing, recovery
counted untimed afterwards).

Usage: python scripts/measure_ivfpq_rung.py [n_docs] [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ivfpq_rung_{n}"

    from pyspark.sql import functions as F

    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity import (
        ivf_pq_topk,
    )
    from scripts.scale_probe import build_embeddings

    spark = get_spark(app_name="ivfpq_rung")
    emb_path = f"{out}/embeddings.parquet"
    if not os.path.exists(emb_path):
        build_embeddings(spark, n).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    emb.write.mode("overwrite").format("noop").save()  # warm page cache

    # 50 planted-pair EVEN members as queries; the odd partner
    # (query_id + 1) is identical or +0.01-nudged — cosine ≈ 1, so
    # "partner in ADC top-3" is a sharp recovery signal.
    qids, k = [], 0
    while len(qids) < 50:
        if k % 20 < 2:
            qids.append(2 * k)
        k += 1

    t0 = time.time()
    df = ivf_pq_topk(spark, emb, query_ids=qids)
    df.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0

    hits = (
        df.filter((F.col("rn") <= 3) & (F.col("neighbor_id") == F.col("query_id") + 1))
        .select("query_id")
        .distinct()
        .count()
    )
    print(
        json.dumps(
            {
                "op": "knn_ivf_pq_rung",
                "n_docs": n,
                "seconds": round(dt, 2),
                "queries": len(qids),
                "partner_in_adc_top3": hits,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
