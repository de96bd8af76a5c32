"""Registered ACID-table query: drive the transactional commit log
(:mod:`..acid`) through a full append → append → merge lifecycle and
hand the resulting SNAPSHOT to the driver's DuckDB comparison.

The reference mutates its lake with blind S3 pre-delete + overwrite
(reference ``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:47-53,116`` — two
racing Glue runs corrupt the output, no isolation whatsoever); this
query proves the replacement end to end: every row the reader sees
passed through optimistic-concurrency commits, snapshot isolation, and
a keyed copy-on-write MERGE, and the final state is *exactly* the
closed-form relational expression the oracle computes directly from
``orders`` — if commit replay dropped, duplicated, or tore a single
row, the value hash diverges.

Scale: the data movement is ordinary distributed parquet writes; the
commit itself is one small JSON create per transaction regardless of
table size (see acid.py's module docstring for the object-store
coordinator caveat, straight from the Delta Lake paper §3)."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.acid import TransactionalTable
from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

_SCRATCH_ROOT: str | None = None


def _scratch(name: str, sf_dir: str) -> str:
    """pid+sf-qualified scratch (same contract as formats_roundtrip:
    the returned DataFrame reads lazily, so the path must survive the
    builder and die with the process)."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = os.path.join(
            tempfile.gettempdir(), "spark_graft_acid", str(os.getpid())
        )
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_SCRATCH_ROOT, sf_tag, name)


@register(
    "acid_orders_lifecycle",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % 15 <> 1
    """,
)
def acid_orders_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders, rebuilt through the transaction log:

    * commit 1 — append the ``o_orderkey % 3 == 0`` third
    * commit 2 — append the ``% 3 == 1`` third
    * commit 3 — MERGE: insert the ``% 3 == 2`` third, double
      ``o_totalprice`` on the ``% 3 == 0`` keys (an update), and
      delete the ``% 15 == 1`` keys

    Final snapshot ≡ the oracle's one-pass CASE/filter over ``orders``.
    ``×2`` is binary-exact on doubles, so update rows hash identically
    across engines (registry determinism contract)."""
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    third = lambda r: orders.filter(F.col("o_orderkey") % 3 == r)

    root = _scratch("orders_acid", sf_dir)
    shutil.rmtree(root, ignore_errors=True)  # fresh lifecycle per build
    t = TransactionalTable.create(root)
    t.append(spark, third(0))
    t.append(spark, third(1))

    updates = (
        third(0).withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .unionByName(third(2))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 15 == 1)
        )
        .withColumn("is_del", F.col("o_orderkey") % 15 == 1)
    )
    t.merge_upsert(spark, updates, ["o_orderkey"], delete_col="is_del")
    return t.read(spark).select(*cols)


@register(
    "acid_delete_data_skipping",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey > (SELECT (MAX(o_orderkey) // 2) // 2 FROM orders)
    """,
)
def acid_delete_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE with file-level data skipping (r5): load
    ``orders`` into the transactional table as two key-range batches
    (min/max stats per file recorded in the commit log from the parquet
    footers), then ``DELETE WHERE o_orderkey <= max/4`` with the prune
    interval ``(None, max/4]``.

    The batch above ``max/2`` is PROVABLY untouchable — every one of
    its files carries ``min > max/2 > max/4`` in the log, so the delete
    never opens them: it rewrites only the low batch's files
    (``skipped_files`` in the commit's op record counts the saved
    rewrites; tests/test_acid.py pins the untouched-by-name contract).
    At 100 TB this is what makes DML affordable: cost scales with the
    files that CAN match, decided from log metadata alone — the Delta
    paper's stats-pruning design on this module's JSON log. Final
    snapshot ≡ the oracle's one-pass range filter; both engines derive
    the threshold with floor division from the same MAX."""
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    maxk = orders.agg(F.max("o_orderkey")).first()[0]
    half, quarter = maxk // 2, (maxk // 2) // 2

    root = _scratch("orders_delete", sf_dir)
    shutil.rmtree(root, ignore_errors=True)  # fresh lifecycle per build
    t = TransactionalTable.create(root)
    t.append(spark, orders.filter(F.col("o_orderkey") <= half), stats_cols=("o_orderkey",))
    t.append(spark, orders.filter(F.col("o_orderkey") > half), stats_cols=("o_orderkey",))
    t.delete_where(
        spark,
        f"o_orderkey <= {quarter}",
        prune={"o_orderkey": (None, quarter)},
    )
    return t.read(spark).select(*cols)


@register(
    "acid_change_feed",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           'insert' AS _change_type,
           CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
               AS _commit_version
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           'delete' AS _change_type, CAST(3 AS BIGINT) AS _commit_version
    FROM orders WHERE o_orderkey % 10 = 3
    """,
)
def acid_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The row-level CHANGE FEED itself as an oracle-checked query
    (continuation session): append the even-keyed half of ``orders``
    (commit 1), the odd half (commit 2), then DELETE the
    ``% 10 == 3`` keys (commit 3 — a copy-on-write rewrite), and emit
    ``changes(0)``. The feed must contain every row exactly once as a
    tagged insert carrying the version its PARITY determines, plus one
    tagged delete per ``% 10 == 3`` key at version 3 — and nothing
    else: the delete's rewritten survivors must cancel in the bag
    diff. The oracle states that closed form directly over ``orders``,
    so a dropped, duplicated, or mis-versioned change row diverges the
    value hash. (The streaming `read_changes` source emits this same
    feed incrementally — equality pinned in tests/test_acid_source.py.)"""
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, sf_dir, "orders").select(*cols)

    root = _scratch("orders_cdc", sf_dir)
    shutil.rmtree(root, ignore_errors=True)  # fresh lifecycle per build
    t = TransactionalTable.create(root)
    t.append(spark, orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(spark, orders.filter(F.col("o_orderkey") % 2 == 1))
    t.delete_where(spark, "o_orderkey % 10 = 3")
    return t.changes(spark, 0)
