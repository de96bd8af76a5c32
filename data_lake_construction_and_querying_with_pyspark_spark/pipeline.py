"""The end-to-end lake construct-and-query pipeline (SURVEY.md §3 E2).

Stages, in reference order: scan → validate → clean → register view →
SQL query → format-flipped write → catalog. One in-process call replaces
the reference's Airflow→Lambda→Glue chain (E1 collapses, SURVEY.md §3).

Reference quirk reproduced (SURVEY.md §2.8.1): the temp view snapshots
the CLEANED plan, and the subsequent ``withColumn("age")`` /
``filter(age > 30)`` transforms are never visible to the SQL query.
``JobConfig.reference_faithful=True`` (default) keeps that semantics —
the written result has no ``age`` column; ``False`` runs the evident
intent (query over the transformed frame).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.config import JobConfig
from data_lake_construction_and_querying_with_pyspark_spark.operators.cleaning import clean
from data_lake_construction_and_querying_with_pyspark_spark.operators.validation import (
    ValidationReport,
    validate,
)
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import read_lake
from data_lake_construction_and_querying_with_pyspark_spark.sources.sinks import write_lake

logger = logging.getLogger(__name__)


@dataclass
class JobResult:
    """Structured job summary — replaces the reference's SNS notifications
    (SURVEY.md §2.6 O6)."""

    config: JobConfig
    validation: ValidationReport
    result_df: DataFrame
    transformed_df: DataFrame
    output_path: str
    output_format: str


def derive_age(df: DataFrame, dob_col: str = "Date of Birth") -> DataFrame:
    """P1 — the reference's derived-column projection
    (``scripts/...pyspark.py:108``): string→date parse, datediff/365 age
    heuristic, int downcast. Column resolution is case-insensitive like
    Spark's analyzer default (SURVEY.md §2.8.3)."""
    return df.withColumn(
        "age",
        (
            F.datediff(F.current_date(), F.to_date(F.col(dob_col), "yyyy-MM-dd")) / 365
        ).cast("int"),
    )


def run_job(spark: SparkSession, config: JobConfig) -> JobResult:
    """Execute one construct-and-query job (reference E2, faithfully)."""
    config.validate()

    # Scan (S1-S3): format dispatch; CSV lands all-string.
    df = read_lake(spark, config.input_path, config.file_type)

    # Validate (A1-A4) — single-pass rewrite of the reference's 5 jobs.
    report = validate(df)
    logger.info(
        "validated: rows=%d cols=%d dups=%d nulls=%s",
        report.total_rows,
        report.column_count,
        report.duplicate_rows,
        report.null_counts,
    )

    # Clean (C1-C3) in reference order: impute → dropna → dedup.
    cleaned = clean(df, config.fill_values)

    # Register (C4): the view snapshots the *cleaned* plan.
    cleaned.createOrReplaceTempView(config.table_name)

    # (Dead-by-default) transform — P1/P2. Kept as a real frame the API
    # returns, but invisible to the SQL below unless reference_faithful
    # is False (quirk §2.8.1).
    transformed = cleaned
    if any(c.lower() == "date of birth" for c in cleaned.columns):
        transformed = derive_age(cleaned, "Date of Birth").filter(F.col("age") > 30)
        if not config.reference_faithful:
            transformed.createOrReplaceTempView(config.table_name)

    # Query (Q1): arbitrary Spark SQL over the registered view.
    result_df = spark.sql(config.ps_query)

    # Write (S5/S6): format-flipped by default, partitioned on request.
    out_fmt = config.resolved_output_format()
    if config.output_path:
        write_lake(result_df, config.output_path, out_fmt, partition_by=config.partition_by)

    return JobResult(
        config=config,
        validation=report,
        result_df=result_df,
        transformed_df=transformed,
        output_path=config.output_path,
        output_format=out_fmt,
    )
