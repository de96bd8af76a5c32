"""Lake maintenance utilities (SURVEY.md §2.1 S7/S8).

The reference performs two kinds of object-store housekeeping outside
the query path: an explicit pre-delete of the previous output objects
before writing (``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:47-53,116``
— subsumed by ``mode("overwrite")`` in the engine but kept as an
explicit utility), and a paginated delete of everything under a staging
prefix (``lambda_code/lambda_handler.py:6-15``). Locally these are
filesystem operations; on a cluster the same API routes through the
Hadoop FileSystem so it works against any supported object store.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def delete_output_path(path: str) -> bool:
    """S7 — remove a previous output file/directory if present.
    Returns True when something was deleted."""
    p = Path(path)
    if p.is_dir():
        shutil.rmtree(p)
        return True
    if p.exists():
        p.unlink()
        return True
    return False


def clean_staging_prefix(root: str, prefix: str = "Unsaved/") -> int:
    """S8 — delete every object under ``root/prefix`` (the reference's
    Lambda walks S3 pages; locally a recursive glob). Returns the
    number of files removed; empty directories are pruned."""
    base = Path(root) / prefix
    if not base.exists():
        return 0
    n = sum(1 for f in base.rglob("*") if f.is_file())
    shutil.rmtree(base)
    return n


def hadoop_delete(spark: SparkSession, path: str) -> bool:
    """Cluster-grade delete through the Hadoop FileSystem API — same
    call works for file://, hdfs://, s3a:// URIs."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    return bool(fs.delete(hpath, True)) if fs.exists(hpath) else False


def compact_lake_path(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the lake-maintenance op every streaming
    or incremental writer eventually needs: rewrite a directory into
    ~``target_file_mb`` files. At 100 TB small files dominate scan
    planning time and NameNode/object-listing cost; compaction restores
    ≥128 MiB scan units. Returns the new file count.

    Uses a write-to-staging-then-swap so a failed rewrite never loses
    the original data.
    """
    import shutil
    import uuid
    from pathlib import Path

    df = spark.read.format(fmt).load(path)
    total_bytes = sum(f.stat().st_size for f in Path(path).rglob("*") if f.is_file())
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    staging = f"{path.rstrip('/')}._compact_{uuid.uuid4().hex[:8]}"
    writer = df.repartition(n_files).write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(staging)
    shutil.rmtree(path)
    Path(staging).rename(path)
    return sum(1 for f in Path(path).rglob("*") if f.is_file() and f.suffix == f".{fmt}")


def preview(df: DataFrame, n: int = 20) -> str:
    """S9 — the reference's result-preview sink (``df.show()`` grid to
    the log); returned as a string so callers can log it structured."""
    return df._jdf.showString(n, 20, False)
