"""Validation metrics — single-pass version of the reference's A1-A4.

The reference computes total rows, duplicate count, and per-column null
counts as FIVE separate actions over the source (reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:86-98`` —
SURVEY.md §2.8.5 flags the double-computation). At 100 TB each action is
a full table scan, and ``df.count() - df.distinct().count()`` is two
scans plus an all-columns shuffle.

This module computes the same metrics in ONE aggregation pass:

* total rows, per-column null counts → one global hash-agg (partial
  aggregation map-side, a single scalar row shuffled).
* duplicate count → one ``groupBy(all columns)`` instead of
  ``distinct().count()`` + ``count()``: the same single shuffle that
  distinct needs, but sharing the scan and producing both counts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ValidationReport:
    total_rows: int
    distinct_rows: int
    null_counts: dict[str, int]
    columns: list[str] = field(default_factory=list)

    @property
    def duplicate_rows(self) -> int:
        # Reference semantics: df.count() - df.distinct().count()
        # (scripts/...pyspark.py:90-91).
        return self.total_rows - self.distinct_rows

    @property
    def column_count(self) -> int:
        return len(self.columns)


def null_count_exprs(df: DataFrame) -> list:
    """One ``sum(isnull as int)`` per column — reference A3
    (``scripts/...pyspark.py:93``), aliased to ``null_<col>``."""
    # coalesce: SUM over zero rows is NULL, and an empty input must
    # report 0 nulls, not None (hypothesis-found edge case).
    return [
        F.coalesce(F.sum(F.col(c).isNull().cast("int")), F.lit(0)).alias(f"null_{c}")
        for c in df.columns
    ]


def validation_summary_df(df: DataFrame) -> DataFrame:
    """The one-row validation summary as a DataFrame (lazy, one pass)."""
    return df.agg(F.count(F.lit(1)).alias("total_rows"), *null_count_exprs(df))


def duplicate_stats_df(df: DataFrame) -> DataFrame:
    """Row-multiplicity profile: one shuffle over all columns.

    Returns one row: (total_rows, distinct_rows, duplicate_rows).
    Map-side partial counts make this cheaper than distinct() at scale,
    and it subsumes both A1 and A2.
    """
    per_row = df.groupBy(*df.columns).agg(F.count(F.lit(1)).alias("multiplicity"))
    return per_row.agg(
        F.sum("multiplicity").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_rows"),
        (F.sum("multiplicity") - F.count(F.lit(1))).alias("duplicate_rows"),
    )


def validate(df: DataFrame) -> ValidationReport:
    """Compute the reference's validation metrics in two jobs total
    (vs the reference's five)."""
    nulls_row = validation_summary_df(df).collect()[0]
    dup_row = duplicate_stats_df(df).collect()[0]
    null_counts = {c: nulls_row[f"null_{c}"] for c in df.columns}
    return ValidationReport(
        total_rows=dup_row["total_rows"] or 0,
        distinct_rows=dup_row["distinct_rows"] or 0,
        null_counts=null_counts,
        columns=list(df.columns),
    )


def attach_observed_metrics(df: DataFrame, name: str = "validation"):
    """Piggyback validation metrics on the NEXT action over ``df`` via
    ``df.observe`` — zero extra jobs, zero extra scans. The returned
    ``Observation`` yields metrics after any action (typically the lake
    write) executes: exact row count, exact per-column null counts
    (``nulls__<col>`` keys), and an HLL approximate distinct-row count.

    This is the 100 TB validation path: where ``validate()`` runs its
    own aggregation pass (still one scan), this rides the write's scan
    for free. Exact duplicate counting is the one metric that cannot
    ride along (it needs a shuffle of its own); the sketch stands in,
    and ``duplicate_stats_df`` remains the exact tool.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("total_rows"),
        F.approx_count_distinct(F.struct(*df.columns)).alias("approx_distinct_rows"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"nulls__{c}") for c in df.columns],
    )
    return observed, obs
