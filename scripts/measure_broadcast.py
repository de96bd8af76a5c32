"""Measure the ACTUAL BroadcastExchange data size of the shortlist
bucketed-centroid table at rung geometries (VERDICT r4 finding #3: the
~80 MB figure at a 10M-doc rung's k=156 250 was projected, never
measured).

The broadcast payload depends only on the table's geometry — k rows of
(cell bigint, cent array<double>[64], acell bigint) — not on where the
centroids came from, so this probe synthesizes centroid tables at each
rung's k (derive_k: k = n//64) with deterministic hash-derived
coordinates, runs the exact ``shortlist_assign`` broadcast join
against a small vector batch, and reads the ``data size`` SQLMetric of
every BroadcastExchange from the SQLAppStatusStore for that execution
— the real serialized relation size the driver ships, not an
estimate. (Reading metrics off ``df._jdf.queryExecution()`` does NOT
work: the write action runs its own QueryExecution, so that plan's
accumulators stay at zero.)

Usage: python scripts/measure_broadcast.py [k ...]
       (default rung ladder: 1 562 / 15 625 / 156 250 —
        the 100k / 1M / 10M-doc derive_k values)

Prints one JSON line per k. Recorded in docs/SCALING.md.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DIM = 64

_UNITS = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def _parse_size(s: str) -> float:
    m = re.match(r"([\d.]+)\s*([KMGT]?i?B)", s)
    return float(m.group(1)) * _UNITS[m.group(2)] if m else 0.0


def last_execution_data_sizes(spark) -> list[float]:
    """'data size' metric values (bytes) of the most recent SQL
    execution, via the SQLAppStatusStore (the UI's source of truth)."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    last = execs.apply(execs.size() - 1)
    vals = store.executionMetrics(last.executionId())
    sizes = []
    it = last.metrics().iterator()
    while it.hasNext():
        m = it.next()
        if str(m.name()) == "data size":
            o = vals.get(m.accumulatorId())
            if o.isDefined():
                sizes.append(_parse_size(str(o.get())))
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
        assigned.write.mode("overwrite").format("noop").save()
        sizes = last_execution_data_sizes(spark)
        # the bucketed-centroid relation is the LARGEST broadcast in
        # the plan (the others are the m-row anchor array, deduped)
        print(
            json.dumps(
                {
                    "k": k,
                    "m": m,
                    "n_docs_equiv": k * 64,
                    "distinct_broadcast_bytes": sorted(set(int(s) for s in sizes)),
                    "bucketed_centroids_mb": round(max(sizes) / 2**20, 1) if sizes else None,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
