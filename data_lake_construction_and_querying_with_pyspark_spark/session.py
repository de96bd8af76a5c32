"""SparkSession factory with scale-aware defaults.

The reference pins ``spark.sql.shuffle.partitions=200`` and enables Arrow
(reference ``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:34-38``).
We keep the intent (tuned shuffle parallelism + Arrow) but make it adaptive:
AQE coalesces shuffle partitions at runtime so the static number only sets
an upper bound, and skew-join handling is on so hot keys re-split at the
1000-executor scale this engine targets.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for correctness-at-scale, not just local speed:
#  - AQE on: runtime partition coalescing + skew-join splitting means the
#    same plan works at sf0.001 and at 100 TB.
#  - UTC session timezone: deterministic timestamp semantics (and matches
#    the DuckDB oracle, which is UTC-naive).
#  - Arrow on: every pandas_udf / applyInPandas moves batches, not rows.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Plan every exchange at 512 reducers and let AQE coalesce DOWN to
    # the advisory size at runtime: AQE can merge small partitions but
    # never split an unskewed oversized one, so the static number must
    # be the CEILING for the largest shuffle the session will run, not
    # the thread count. This is what removes the manual reducer knob
    # the 1M-doc scale probe needed (SCALE_PROBE_SHUFFLE=128 — the
    # exploded shingle index spilled at 32 reducers; VERDICT r3
    # finding #3): the same session now lands within noise of the
    # hand-pinned run with no knob, while small-SF queries still
    # coalesce to ~parallelism (docs/SCALING.md "AQE, no manual knob").
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "512",
    # Companion flag: without it, persist()ed plans pin their output
    # partitioning and AQE may not coalesce the 512-bucket shuffles
    # feeding a cache (observed: 512-task stages on sf0.01 after
    # raising initialPartitionNum — pure scheduling overhead).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    # At 100 TB, file-split sizing is the scan-parallelism knob.
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    # The driver's events table carries INT64 TIMESTAMP(NANOS) which
    # Spark's parquet reader rejects; read as long and convert in the
    # events reader (ns values are exact multiples of 1000 here).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Python Data Source filter pushdown (off by default in Spark 4.1):
    # lets the acid_table format's pushFilters() turn df.filter(...)
    # into log-level file skipping (sources/acid_source.py).
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "data_lake_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes ``None`` with a cluster master already set in
    the environment and we leave it alone.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    n_shuffle = shuffle_partitions if shuffle_partitions is not None else int(cpus)
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    if master is None or master.startswith("local"):
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
