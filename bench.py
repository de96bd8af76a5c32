"""Benchmark harness — runs the headline queries and prints ONE JSON line.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is materialized through the ``noop`` sink so the full plan
executes (a bare .count() would let Spark prune aggregates/columns and
under-report the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family (scan+filter, hash agg, dim join,
# fact-fact join, window, sessionization, SQL CTE, dedup, clustering,
# embedding near-dup, text, similarity, funnel).
HEADLINE = [
    "flagship_between",
    "pricing_summary",
    "join_broadcast_chain",
    "join_fact_fact_revenue",
    "local_supplier_volume_q5",
    "market_share_q8",
    "window_topk_per_customer",
    "events_user_sessions",
    "cte_top_revenue_nations",
    "dedup_exact_documents",
    "dedup_minhash_near_dup",
    # r4 rename (VERDICT r3 directive #3): the primary name now runs the
    # scaled geometry (r3's "dedup_embedding_cosine_pairs_scaled" bench
    # row). The fixed-geometry demo was deregistered in r5 (VERDICT r4
    # directive #4) — its contrast numbers live in docs/SCALING.md.
    "dedup_embedding_cosine_pairs",
    "dedup_cluster_assignment",
    "semantic_dedup_embeddings",
    "funnel_conversion",
    "text_quality_scores",
    "knn_brute_force",
    "bm25_topk_documents",  # added r3: lexical retrieval family
    "dedup_repeated_spans",  # added r4: the heaviest dedup family (positional 5-gram index)
    "pagerank_trade_network",  # added r4: iterative graph analytics
    "knn_graph_topk",  # added r5: kNN-graph family (VERDICT r4 directive #2)
    "bpe_learn_merges",  # added r5: tokenizer-training family (iterative merge learning)
    "rerank_bm25_candidates",  # added r5: two-stage retrieve-then-rerank
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.registry import all_queries

    spark = get_spark(app_name="lake_bench")
    qs = all_queries()

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Warmup (not counted): touch every input table once so timings
    # measure the engine, not first-read page-cache population, and run
    # one aggregate to JIT the codegen paths.
    for t in ["region", "nation", "customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        run(spark.read.parquet(f"{sf_dir}/{t}.parquet"))
    from pyspark.sql import functions as F

    run(spark.read.parquet(f"{sf_dir}/orders.parquet").groupBy("o_orderstatus").agg(F.count(F.lit(1))))

    def settle() -> None:
        """Isolate measurements: drop caches operators persisted
        internally (minhash/ngram inverted indexes, normalized vectors)
        and force the JVM's async cleanup (ContextCleaner shuffle/RDD
        removal) to happen NOW, between queries — measured to otherwise
        land randomly inside later timings (up to 18× noise on
        unrelated queries after the cluster-assignment run)."""
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(0.3)

    # Host-state yardstick (VERDICT r5 #8): a fixed-work probe measured
    # the same way as the queries (settle + best-of-2), so any round's
    # suite total can be read as a RATIO against the same run's
    # calibration instead of cross-day archaeology — r5 spent half its
    # bench adjudication reconstructing whether a 1.5× total was a
    # regression or a slow box (it was the box; per-query swings of ±3×
    # run-to-run on unchanged code). Two fixed components: a pinned
    # single-thread pure-Python xorshift loop (CPU clock/contention)
    # and a constant 8M-row range→hash-agg Spark job (JVM/codegen/
    # shuffle fixed cost) — both independent of SF and of the repo's
    # operators.
    def calibration_once() -> float:
        t0 = time.time()
        x = 88172645463325252
        for _ in range(2_000_000):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        df = (
            spark.range(0, 8_000_000, 1, 32)
            .select((F.col("id") % 9973).alias("k"), F.col("id").alias("v"))
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
        )
        run(df)
        return time.time() - t0

    # All-core twin of the probe (r7): this session measured the
    # single-thread probe IMPROVING 35% while the 32-thread headline
    # suite regressed 45% on unchanged code — a shared-host shape
    # (better single-core burst, worse sustained all-core throughput)
    # the 1-thread loop cannot see. A constant 12.8G-row range→mod-agg
    # across 32 partitions pins the sustained all-core JVM rate; read
    # the suite against THIS probe when the two disagree.
    def calibration_parallel_once() -> float:
        t0 = time.time()
        df = (
            spark.range(0, 12_800_000_000, 1, 32)
            .select(
                F.pmod(  # xor mix: ANSI-safe (multiplication overflows)
                    F.shiftright(F.col("id").bitwiseXOR(F.lit(0x5DEECE66D)), 3)
                    + F.col("id"),
                    F.lit(999983),
                ).alias("h")
            )
            .agg(F.sum("h").alias("s"))
        )
        run(df)
        return time.time() - t0

    calib = float("inf")
    calib_par = float("inf")
    for _ in range(2):
        settle()
        calib = min(calib, calibration_once())
        calib_par = min(calib_par, calibration_parallel_once())

    # Best-of-2 per query: the first execution of each operator family
    # JIT-compiles its codegen paths; the second run measures the
    # engine. Single-run numbers vary ±30% on this box.
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        best = float("inf")
        for _ in range(2):
            settle()
            t0 = time.time()
            run(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        total += timings[name]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "calibration_seconds": round(calib, 3),
                "calibration_parallel_seconds": round(calib_par, 3),
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
