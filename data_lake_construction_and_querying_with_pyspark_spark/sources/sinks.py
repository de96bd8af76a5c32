"""Lake sinks — format-dispatched writes (SURVEY.md §2.1 S5-S7).

Reference behavior: snappy Parquet for the CSV path, headered CSV for the
Parquet path, always ``mode("overwrite")`` (reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:118-123``); the
explicit pre-delete at ``:47-53,116`` is subsumed by overwrite mode.

Engine additions for 100 TB: optional ``partition_by`` (docx §8's own
recommendation, never implemented by the reference) so downstream reads
get partition pruning, and optional ``bucket_by`` + ``saveAsTable`` so
repeated joins on the bucket key skip their shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_lake(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.option("compression", compression or "snappy").parquet(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"Unsupported sink format: {fmt!r}")


def write_sorted_lake(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Range-partition + sort-within-partitions write: rows cluster by
    ``sort_cols`` so each output file covers a narrow value range and
    parquet min/max statistics turn range predicates into file/row-group
    skips. The lake-layout half of predicate pushdown: Catalyst pushes
    the filter, this write makes the filter selective per file. (The
    same idea as Z-ordering for the single-column case.)"""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in sort_cols]
    out = df.repartitionByRange(n_files, *cols) if n_files else df.repartitionByRange(*cols)
    out.sortWithinPartitions(*cols).write.mode("overwrite").format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed catalog table.

    Joins/aggregations on ``bucket_cols`` between two tables bucketed the
    same way are shuffle-free — the 100 TB co-location strategy
    (SURVEY.md §7 hard parts).
    """
    writer = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
