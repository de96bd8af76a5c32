"""Measure the ACTUAL BroadcastExchange dataSize of the shortlist
bucketed-centroid table at rung geometries (VERDICT r4 finding #3: the
~80 MB figure at a 10M-doc rung's k=156 250 was projected, never
measured).

The broadcast payload depends only on the table's geometry — k rows of
(cell bigint, cent array<double>[d], acell bigint) — not on where the
centroids came from, so this probe synthesizes centroid tables at each
rung's k (derive_k: k = n//64) with deterministic hash-derived
coordinates, runs the exact ``shortlist_assign`` broadcast join against
a small vector batch, and reads the ``dataSize`` SQLMetric off the
executed plan's BroadcastExchange node (the real serialized
UnsafeRow relation size, not an estimate).

Usage: python scripts/measure_broadcast.py [k ...]
       (default rung ladder: 1 562 / 15 625 / 156 250 —
        the 100k / 1M / 10M-doc derive_k values)

Prints one JSON line per k. Recorded in docs/SCALING.md.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DIM = 64


def _walk(node):
    """Yield every physical node, descending through AQE query stages
    and reused exchanges (their subtrees hang off .plan()/.child(),
    not .children())."""
    yield node
    name = node.nodeName()
    if "QueryStage" in name:
        try:
            yield from _walk(node.plan())
        except Exception:
            pass
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def broadcast_data_size(df) -> list[int]:
    """Execute df and return the dataSize metric (bytes) of every
    BroadcastExchange in the final adaptive plan."""
    df.write.mode("overwrite").format("noop").save()
    jplan = df._jdf.queryExecution().executedPlan()
    try:
        jplan = jplan.executedPlan()  # AdaptiveSparkPlanExec → final plan
    except Exception:
        pass
    sizes = []
    for node in _walk(jplan):
        if "BroadcastExchange" not in node.nodeName():
            continue
        metrics = node.metrics()
        opt = metrics.get("dataSize")
        if opt.isDefined():
            sizes.append(opt.get().value())
    return sizes


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1_562, 15_625, 156_250]

    from pyspark.sql import functions as F

    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.operators.semantic import (
        coarse_m,
        shortlist_assign,
    )

    spark = get_spark(app_name="measure_broadcast")

    # a small vector batch — the broadcast under measurement is the
    # bucketed-centroid side; the probe side's size is irrelevant
    coord = lambda seed, j: (
        (F.pmod(F.hash(seed, F.lit(j)), 2001) - 1000) / 1000.0
    ).cast("double")
    vecs = spark.range(1000).select(
        F.col("id").alias("vec_id"),
        F.array(*[coord(F.col("id"), j) for j in range(_DIM)]).alias("v"),
    )

    for k in ks:
        centroids = spark.range(k).select(
            F.col("id").alias("cell"),
            F.array(*[coord(F.col("id") + 7_000_000, j + 500) for j in range(_DIM)]).alias(
                "cent"
            ),
        )
        m = coarse_m(k)
        assigned = shortlist_assign(vecs, centroids, m, broadcast_buckets=True)
        sizes = broadcast_data_size(assigned)
        # the bucketed-centroid relation is the LARGEST broadcast in the
        # plan (the other is the m-row anchor array)
        print(
            json.dumps(
                {
                    "k": k,
                    "m": m,
                    "n_docs_equiv": k * 64,
                    "broadcasts_bytes": sorted(int(s) for s in sizes),
                    "bucketed_centroids_mb": round(max(sizes) / 2**20, 1) if sizes else None,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
