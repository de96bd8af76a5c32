"""Measure what file-level stats pruning buys ACID DML at scale.

Builds a TransactionalTable from the 1M-doc probe corpus as N_BATCHES
key-range appends (each batch's files carry doc_id min/max stats), then
times an identical 10%-range DELETE two ways on two identical tables:

* pruned   — delete_where(cond, prune={"doc_id": (None, hi)}):
             only the low batches' files are read + rewritten
* unpruned — delete_where(cond): every file is read + rewritten

Prints one JSON line per run with seconds, files rewritten, files
skipped. The point at 100 TB: DML cost must scale with the files that
CAN match, not with table size — this measures exactly that ratio.

Usage: python scripts/measure_acid_skipping.py [corpus_dir] [out_root]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_1m_r5"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/acid_skip_measure"
    n_batches = 10

    from pyspark.sql import functions as F

    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.acid import TransactionalTable

    spark = get_spark(app_name="measure_acid_skipping")
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    n = docs.count()
    lo_cut = n // n_batches  # delete the lowest batch's range (10%)

    def build(root: str) -> TransactionalTable:
        shutil.rmtree(root, ignore_errors=True)
        t = TransactionalTable.create(root)
        step = (n + n_batches - 1) // n_batches
        for b in range(n_batches):
            batch = docs.filter(
                (F.col("doc_id") >= b * step) & (F.col("doc_id") < (b + 1) * step)
            )
            t.append(spark, batch, stats_cols=("doc_id",))
        return t

    for mode in ("pruned", "unpruned"):
        t = build(os.path.join(out_root, mode))
        before = len(t.snapshot().files)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.time()
        t.delete_where(
            spark,
            f"doc_id < {lo_cut}",
            prune={"doc_id": (None, lo_cut - 1)} if mode == "pruned" else None,
        )
        dt = time.time() - t0
        op = [o for o in t.history() if o.get("op") == "delete"][0]
        rows_left = t.read(spark).count()
        print(
            json.dumps(
                {
                    "mode": mode,
                    "n_rows": n,
                    "files_before": before,
                    "files_skipped": op["skipped_files"],
                    "seconds": round(dt, 2),
                    "rows_left": rows_left,
                }
            ),
            flush=True,
        )

    # -- point-delete (takedown-by-id) with blooms -----------------------
    # INTERLEAVED batches (doc_id % n_batches == b): every file's
    # [min, max] straddles every id, so range stats prune NOTHING —
    # only the per-file blooms can skip. Build once with bloom_cols,
    # time the same one-id delete with and without prune_eq.
    def build_interleaved(root: str) -> TransactionalTable:
        shutil.rmtree(root, ignore_errors=True)
        t = TransactionalTable.create(root)
        for b in range(n_batches):
            t.append(
                spark,
                docs.filter(F.col("doc_id") % n_batches == b),
                stats_cols=("doc_id",),
                bloom_cols=("doc_id",),
            )
        return t

    target = n // 2 + 1  # one arbitrary id
    for mode in ("bloom", "unpruned"):
        t = build_interleaved(os.path.join(out_root, f"pt_{mode}"))
        before = len(t.snapshot().files)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.time()
        t.delete_where(
            spark,
            f"doc_id = {target}",
            prune_eq={"doc_id": target} if mode == "bloom" else None,
        )
        dt = time.time() - t0
        op = [o for o in t.history() if o.get("op") == "delete"][0]
        print(
            json.dumps(
                {
                    "mode": f"point_{mode}",
                    "n_rows": n,
                    "files_before": before,
                    "files_skipped": op["skipped_files"],
                    "seconds": round(dt, 2),
                    "rows_left": t.read(spark).count(),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
