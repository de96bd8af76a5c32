"""The 80M kNN-graph geometry A/B (VERDICT r10 directive #2) — the
first test of `knn_graph_planes`' encoded hypothesis (+1 hyperplane
bit at 80M), run under the wall-clock-budget design ROADMAP.md
records ("Round 11, second session"):

* **Arm 1 (8×16 control) runs COMPLETE** — simultaneously the
  fixed-geometry 80M octave row (the 2.34×/doubling ladder needs it)
  and the A/B control, with planted rank-1 recovery measured through
  the real merge.
* **Arm 2 (8×17) runs its first waves only** (default: tables 0 and
  1), paired against arm 1's walls for the same table indices — the
  plane count changes nothing outside the per-wave work (same corpus
  scan, one extra bucket bit in the exchange key; the merge consumes
  ≤ n·tables·k local-top-k rows either way), so paired per-wave walls
  measure exactly the term the hypothesis is about at 1/8 arm cost.

Per-wave walls stream from the operator's `log_wave_wall` breadcrumb
hook (one JSON line per staged wave, flushed as it lands, so a
wall-clock overrun preserves every finished wave). Scratch is owned
by this script and removed per arm (the r10 ENOSPC lesson: two stale
40M scratches starved the third run).

Usage:
    SPARK_DRIVER_MEMORY=80g SPARK_GRAFT_TASK_RETRIES=4 \
        python scripts/measure_knngraph_ab.py [n_docs] [corpus_dir] [arms]
    (defaults: 80_000_000, /tmp/scale_probe_80m, "arm1,arm2";
     KNNGRAPH_AB_WAVES overrides arm 1's wave count [8],
     KNNGRAPH_AB_PROBE_TABLES arm 2's table list ["0,1"]).

Session hygiene (the r11 wedge findings, docs/SCALING.md "Local-mode
rung hygiene addendum"): the un-reused worker pool + idle-kill turn a
wedged Arrow socket into a killed-and-retried task, and
SPARK_GRAFT_TASK_RETRIES=4 makes `get_spark` emit `local[N,4]` so the
retry actually happens (local mode ignores spark.task.maxFailures).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.environ.get("RUNG_RESULTS") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "rung_r11.jsonl",
)


def emit(rec: dict) -> None:
    line = json.dumps(rec)
    print(line, flush=True)
    with open(RESULTS, "a") as f:
        f.write(line + "\n")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe_80m"
    arms = set((sys.argv[3] if len(sys.argv) > 3 else "arm1,arm2").split(","))
    waves = int(os.environ.get("KNNGRAPH_AB_WAVES", "8"))
    probe_tables = [
        int(t)
        for t in os.environ.get("KNNGRAPH_AB_PROBE_TABLES", "0,1").split(",")
    ]

    from scripts.scale_probe import build_embeddings

    from data_lake_construction_and_querying_with_pyspark_spark import get_spark

    spark = get_spark(
        app_name="knngraph_ab_r11",
        extra_conf={
            # Wedge hygiene: a worker asleep on its Arrow socket gets
            # killed at the idle timeout and the task retried (needs
            # the local[N,R] master form via SPARK_GRAFT_TASK_RETRIES)
            # instead of hanging the arm indefinitely.
            "spark.python.worker.reuse": "false",
            "spark.python.worker.idleTimeoutSeconds": "900",
            "spark.python.worker.killOnIdleTimeout": "true",
            "spark.python.worker.faulthandler.enabled": "true",
        },
    )
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from data_lake_construction_and_querying_with_pyspark_spark.operators.similarity_vectorized import (
        knn_graph_edges_vectorized,
    )

    t0 = time.time()
    emb_path = f"{out}/embeddings.parquet"
    if not os.path.exists(emb_path):
        build_embeddings(spark, n_docs).write.mode("overwrite").parquet(emb_path)
    emit({"op": "corpus_build", "n_docs": n_docs, "seconds": round(time.time() - t0, 2)})
    emb = spark.read.parquet(emb_path)

    planted = F.pmod((F.col("vec_id") / 2).cast("long"), 20) < 2
    partner = F.col("vec_id").bitwiseXOR(F.lit(1))

    if "arm1" in arms:
        # The control arm doubles as the fixed-geometry 80M octave:
        # full operator, full merge, full planted rank-1 recovery.
        scratch = f"{out}/_knngraph_ab_arm1"
        obs = Observation("ab_arm1")
        t0 = time.time()
        edges = knn_graph_edges_vectorized(
            spark,
            emb,
            k=3,
            n_planes=16,
            table_batches=waves,
            scratch_dir=scratch,
            log_wave_wall=lambda rec: emit(
                {"op": "knngraph_ab_wave", "arm": "8x16", "n_docs": n_docs, **rec}
            ),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.count(
                F.when(planted & (F.col("edge_rank") == 1) & (F.col("nbr_id") == partner), 1)
            ).alias("hits"),
        )
        edges.write.mode("overwrite").format("noop").save()
        emit(
            {
                "op": "knn_graph_topk_vectorized",
                "arm": "8x16",
                "n_docs": n_docs,
                "seconds": round(time.time() - t0, 2),
                "rows": int(obs.get["n"]),
                "planted_rank1_recovered": int(obs.get["hits"]),
                "planted_members": n_docs // 10,
                "table_batches": waves,
                "n_planes": 16,
            }
        )
        spark.catalog.clearCache()
        shutil.rmtree(scratch, ignore_errors=True)

    if "arm2" in arms:
        # Paired-wave probe: same corpus file, same session, same
        # absolute table indices as arm 1's first waves, one extra
        # plane bit. The waves run eagerly inside the call; the merge
        # over a partial table set is a partial graph, so the returned
        # frame is deliberately never acted on.
        scratch = f"{out}/_knngraph_ab_arm2"
        knn_graph_edges_vectorized(
            spark,
            emb,
            k=3,
            n_planes=17,
            table_batches=len(probe_tables),
            scratch_dir=scratch,
            tables=probe_tables,
            log_wave_wall=lambda rec: emit(
                {"op": "knngraph_ab_wave", "arm": "8x17", "n_docs": n_docs, **rec}
            ),
        )
        spark.catalog.clearCache()
        shutil.rmtree(scratch, ignore_errors=True)

    emit({"op": "ab_done", "n_docs": n_docs})


if __name__ == "__main__":
    main()
