"""Interleaved A/B driver for session-wide parallelism levers (r12).

Runs the FULL 23-query headline suite (bench.py methodology: warmup,
settle between queries, best-of-2 per query, calibration probes) under
ONE config variant per process and prints the same one-line JSON as
bench.py plus the variant name. An outer loop interleaves variants
(A,B,C,A,B,C,...) so adjacent-in-time pairs cancel host drift — the
r11 lesson: a session-wide conf change must be A/B'd over the whole
suite, not the heaviest query (VERDICT r11 What's-wrong #1).

Usage: python scripts/sweep_floor.py <variant-name> k=v [k=v ...]
e.g.   python scripts/sweep_floor.py 256k \
         spark.sql.adaptive.coalescePartitions.minPartitionSize=256KB
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402


def main() -> None:
    variant = sys.argv[1]
    extra = dict(kv.split("=", 1) for kv in sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.registry import all_queries

    spark = get_spark(app_name=f"sweep_{variant}", extra_conf=extra)
    qs = all_queries()

    def run(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    from pyspark.sql import functions as F

    for t in ["region", "nation", "customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        run(spark.read.parquet(f"{sf_dir}/{t}.parquet"))
    run(spark.read.parquet(f"{sf_dir}/orders.parquet").groupBy("o_orderstatus").agg(F.count(F.lit(1))))

    def settle() -> None:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(0.3)

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

    def calibration_parallel_once() -> float:
        t0 = time.time()
        df = (
            spark.range(0, 12_800_000_000, 1, 32)
            .select(
                F.pmod(
                    F.shiftright(F.col("id").bitwiseXOR(F.lit(0x5DEECE66D)), 3)
                    + F.col("id"),
                    F.lit(999983),
                ).alias("h")
            )
            .agg(F.sum("h").alias("s"))
        )
        run(df)
        return time.time() - t0

    settle()
    calib = calibration_once()
    calib_par = calibration_parallel_once()

    timings: dict[str, float] = {}
    build: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qs:
            continue
        best = float("inf")
        bbest = float("inf")
        for _ in range(2):
            settle()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            run(df)
            best = min(best, time.time() - t0)
            bbest = min(bbest, t1 - t0)
        timings[name] = round(best, 3)
        build[name] = round(bbest, 3)
        total += timings[name]

    print(
        json.dumps(
            {
                "variant": variant,
                "value": round(total, 3),
                "calibration_seconds": round(calib, 3),
                "calibration_parallel_seconds": round(calib_par, 3),
                "queries": timings,
                "build_seconds": build,
            }
        )
    )


if __name__ == "__main__":
    main()
