"""Cleaning operators — reference C1-C3 with pinned ordering.

Order is load-bearing (SURVEY.md §2.8.2): fillna runs BEFORE dropna, so
nulls in the imputed columns are rescued while a null in any other
column still drops the row (reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:100,103``).

All three are narrow/declarative: fillna is a projection (no shuffle),
dropna a filter (pushed toward the scan by Catalyst), dropDuplicates a
hash-agg over the chosen columns (one shuffle — the only one in the
cleaning pipeline, AQE-coalesced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def impute_nulls(df: DataFrame, fill_values: dict) -> DataFrame:
    """C1 — per-column null imputation (`df.na.fill`). Columns absent
    from ``df`` are ignored, matching Spark fillna semantics."""
    if not fill_values:
        return df
    present = {k: v for k, v in fill_values.items() if k in set(df.columns)}
    return df.na.fill(present) if present else df


def drop_null_rows(df: DataFrame, how: str = "any", subset: list[str] | None = None) -> DataFrame:
    """C2 — drop rows with nulls (reference default: any column)."""
    return df.na.drop(how=how, subset=subset)


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """C3 — exact row dedup; ``subset`` generalizes to keyed dedup.

    dropDuplicates compiles to a hash aggregate on the subset columns:
    map-side partial dedup first, so at 100 TB the shuffle moves only
    unique rows per partition, not the raw table.
    """
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def clean(df: DataFrame, fill_values: dict | None = None) -> DataFrame:
    """The reference cleaning pipeline in reference order:
    impute → drop-any-null → exact dedup."""
    df = impute_nulls(df, fill_values or {})
    df = drop_null_rows(df)
    return dedup_exact(df)
