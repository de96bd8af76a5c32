"""ACID log-replay cost at 10k commits — data for the checkpoint policy.

Synthesizes metadata-only commits through the REAL commit primitive
(``TransactionalTable._try_create``), so every cost measured is the log
layer's own: no Spark session, no parquet data. The workload is a
steady-state table: each commit adds one file and (past a 100-commit
warmup) removes the 100-commits-older one, so the live set stays ~100
files and whatever grows with commit COUNT (checkpoint build replay,
checkpoint ops payload, dir listings) is isolated from live-set growth.

Reports one JSON object:
 * commit_block_p50/p99: per-1k-block commit latency (checkpoint builds
   land inside these blocks — this is where an O(version) checkpoint
   build shows up as a growing p99)
 * snapshot_head_s at 1k/2k/5k/10k commits (reader cold-load cost)
 * time_travel_s at v=100 / 5000 / 9999
 * history_s, log_dir_mb, largest_checkpoint_kb

Usage: python scripts/measure_acid_log.py [n_commits] [root_dir] [checkpoint_every]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_construction_and_querying_with_pyspark_spark.acid import (  # noqa: E402
    TransactionalTable,
)


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/acid_log_probe"
    if len(sys.argv) > 3:  # checkpoint-interval A/B for the policy choice
        import data_lake_construction_and_querying_with_pyspark_spark.acid as acid_mod

        acid_mod.CHECKPOINT_EVERY = int(sys.argv[3])
    if os.path.isdir(root):
        shutil.rmtree(root)
    t = TransactionalTable.create(root)

    block: list[float] = []
    blocks: list[dict] = []
    snapshot_head: dict[str, float] = {}
    marks = {1_000, 2_000, 5_000, 10_000}

    for v in range(1, n_commits + 1):
        entry: dict = {
            "add": [{"file": f"data/f{v}.parquet", "rows": 10, "bytes": 1000}],
            "op": {"operation": "append", "n": 1},
        }
        if v > 100:
            entry["remove"] = [{"file": f"data/f{v - 100}.parquet"}]
            entry["op"]["operation"] = "rewrite"
        t0 = time.time()
        assert t._try_create(v, entry)
        block.append(time.time() - t0)
        if v % 1_000 == 0:
            blocks.append(
                {
                    "upto": v,
                    "p50_ms": round(statistics.median(block) * 1e3, 2),
                    "p99_ms": round(
                        statistics.quantiles(block, n=100)[98] * 1e3, 2
                    ),
                    "max_ms": round(max(block) * 1e3, 2),
                }
            )
            block = []
        if v in marks:
            t0 = time.time()
            snap = t.snapshot()
            snapshot_head[str(v)] = round(time.time() - t0, 4)
            assert snap.version == v

    tt = {}
    for v in (100, n_commits // 2, n_commits - 1):
        t0 = time.time()
        snap = t.snapshot(version=v)
        tt[str(v)] = round(time.time() - t0, 4)
        assert snap.version == v

    t0 = time.time()
    h = t.history()
    history_s = round(time.time() - t0, 4)
    assert len(h) == n_commits

    # r7 pointer A/B: head loads via the _last_checkpoint pointer
    # (zero directory listings) vs the forced listing path (pointer
    # removed) — the LIST is the object-store-priced unit the pointer
    # exists to remove. Same table, same head, best-effort warm cache
    # both ways (50 reps).
    from data_lake_construction_and_querying_with_pyspark_spark.acid import _LAST_CP

    def time_head(reps: int = 50) -> float:
        t0 = time.time()
        for _ in range(reps):
            assert t.snapshot().version == n_commits
        return round((time.time() - t0) / reps * 1e3, 3)  # ms

    head_with_pointer_ms = time_head()
    ptr = os.path.join(t.log_path, _LAST_CP)
    ptr_body = open(ptr).read()
    os.unlink(ptr)
    head_listing_ms = time_head()
    with open(ptr, "w") as fh:
        fh.write(ptr_body)

    log_bytes = sum(
        os.path.getsize(os.path.join(t.log_path, f)) for f in os.listdir(t.log_path)
    )
    cp_sizes = [
        os.path.getsize(os.path.join(t.log_path, f))
        for f in os.listdir(t.log_path)
        if f.endswith(".checkpoint.json")
    ]
    print(
        json.dumps(
            {
                "n_commits": n_commits,
                "commit_blocks": blocks,
                "snapshot_head_s": snapshot_head,
                "time_travel_s": tt,
                "history_s": history_s,
                "head_with_pointer_ms": head_with_pointer_ms,
                "head_listing_ms": head_listing_ms,
                "log_dir_mb": round(log_bytes / 1e6, 1),
                "n_checkpoints": len(cp_sizes),
                "largest_checkpoint_kb": round(max(cp_sizes) / 1e3, 1),
            },
            indent=1,
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
