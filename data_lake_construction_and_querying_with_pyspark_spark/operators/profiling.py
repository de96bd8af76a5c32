"""Data profiling & skew diagnosis (extension surface, SURVEY.md §2.7).

The reference's validation stops at row counts and per-column null
indicators (reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:62-78``,
SURVEY.md §2.3 A1-A4 — generalized in ``operators/validation.py``).
This module adds the two profiles an operator actually reaches for
before running a 100 TB job:

* a one-pass per-column table profile (nulls / exact distincts /
  numeric range), and
* a join-key skew profile (heavy hitters + frequency share) — the
  input that decides whether a join needs salting or AQE skew
  handling before it runs, not after it OOMs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
_EVENT_NUMERIC = {"event_id", "user_id", "value"}


def _profile_oracle() -> str:
    selects = []
    for c in _EVENT_COLS:
        if c in _EVENT_NUMERIC:
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        selects.append(
            f"SELECT '{c}' AS column_name,"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num"
            f" FROM events"
        )
    return " UNION ALL ".join(selects)


@register("table_profile_events", oracle=_profile_oracle())
def table_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the events table — null count, EXACT
    distinct count, numeric min/max — computed in ONE aggregation over
    one scan (Spark plans the multi-column COUNT DISTINCT with a
    single Expand + two-phase hash aggregate; the table is read once),
    then unpivoted to a 6-row result with an explode of struct
    literals. The oracle computes each column's row independently —
    same answers, 6 scans — which is exactly the redundancy this
    operator exists to avoid at scale. Distincts are exact (the
    contract a profile feeding partitioning decisions needs);
    approx_count_distinct is the cheap alternative when ±2% is fine
    (see ``approx_distinct_users``)."""
    ev = load_table(spark, sf_dir, "events")
    aggs = []
    for c in _EVENT_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("int")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if c in _EVENT_NUMERIC:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
    one = ev.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").cast("bigint").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (
                    F.col(f"{c}__min")
                    if c in _EVENT_NUMERIC
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{c}__max")
                    if c in _EVENT_NUMERIC
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for c in _EVENT_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "join_key_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total, CAST(COUNT(*) AS DOUBLE) AS nkeys
            FROM counts)
    SELECT c.l_partkey, c.n AS key_count,
           CAST(c.n AS DOUBLE) / t.total AS share,
           CAST(c.n AS DOUBLE) / (t.total / t.nkeys) AS skew_ratio
    FROM counts c, tot t
    ORDER BY c.n DESC, c.l_partkey
    LIMIT 20
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest join keys of lineitem.l_partkey with their
    frequency share and skew ratio (count ÷ mean count) — the go/no-go
    input for salting: a key with skew_ratio ≫ shuffle-partition count
    will dominate one reducer no matter how many executors exist.
    One partial-aggregated count shuffle, a 1-row total as a literal
    cross of a scalar aggregate (Spark broadcasts it), and a
    TakeOrderedAndProject for the top-20 (count-desc with key tiebreak
    — never a global sort). Integer counts divide a once-cast double
    total, so shares are bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("key_count"))
    tot = counts.agg(
        F.sum("key_count").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("nkeys"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "key_count",
            (F.col("key_count").cast("double") / F.col("total")).alias("share"),
            (
                F.col("key_count").cast("double") / (F.col("total") / F.col("nkeys"))
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("key_count"), F.asc("l_partkey"))
        .limit(20)
    )
