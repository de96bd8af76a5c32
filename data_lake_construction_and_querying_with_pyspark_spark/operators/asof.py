"""As-of and band (range) joins — operators Spark lacks natively,
composed from existing DataFrame ops per the engine's custom-operator
policy (composition first, Pandas UDF only if semantics demand it).

As-of here is the union-merge formulation, not a per-row range probe:
tag both sides, union on (key, time), and let a single window pass
carry the latest right-side attributes forward into each left row.
One shuffle on the key, no candidate explosion — at 100 TB this is the
difference between a sort within partitions and an O(events × orders)
range join. DuckDB's native ASOF JOIN is the oracle.

The band join turns the non-equi predicate ``qty BETWEEN size-2 AND
size+2`` into an equi-join by exploding each part row into its 5
integer buckets — a bounded fan-out that Catalyst shuffles on the
bucket key, instead of the BroadcastNestedLoopJoin a raw theta join
would plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: each left row gains the ``value_cols`` of the
    latest right row with right_time <= left_time on the same key
    (NULLs when no prior right row exists).

    Right side must be unique per (key, time) — pre-aggregate if not;
    ties at equal timestamps resolve right-before-left so a right row
    at exactly left_time is visible.
    """
    lt = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        "*",
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    out_cols = [c for c, _ in left.dtypes] + [
        F.col(f"_f_{c}").alias(f"last_{c}") for c in value_cols
    ]
    return filled.filter(F.col("_is_left") == 1).select(*out_cols)


@register(
    "asof_latest_order_per_event",
    oracle="""
    WITH od AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_o_orderkey, o.o_orderdate AS last_o_orderdate
    FROM events e ASOF LEFT JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event annotated with the user's most recent order at event
    time. Orders are deduped to one row per (custkey, orderdate) —
    max orderkey — so the as-of pick is deterministic on date ties."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    return asof_join(
        ev,
        od,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_orderdate"],
    )


@register(
    "range_join_quantity_band",
    oracle="""
    SELECT p_partkey, COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS band_revenue
    FROM part JOIN lineitem
      ON l_quantity BETWEEN p_size - 2 AND p_size + 2
    GROUP BY p_partkey
    """,
)
def range_join_quantity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join (|l_quantity − p_size| ≤ 2) with the fact side
    PRE-AGGREGATED by the band key before the expansion join.

    The naive bucket-expanded join materializes |parts-in-band| ×
    |lineitems-per-bucket| rows — measured ~1.2 BILLION intermediate
    rows at sf0.1 (50 distinct quantities, wide bands) before the
    group-by collapses them. Because the final aggregates are
    decomposable (sum/count over the band), aggregating lineitem per
    integer quantity FIRST shrinks the join's right side to ≤50 rows;
    the join output is then |parts| × 5 regardless of fact-table size.
    This quantity pre-aggregation assumes integral band keys — for
    fractional quantities aggregate at the band's granularity."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    li_agg = F.broadcast(
        li.groupBy(F.floor("l_quantity").cast("int").alias("qbucket")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    buckets = p.select(
        "p_partkey",
        F.explode(F.sequence(F.col("p_size") - 2, F.col("p_size") + 2)).alias("qbucket"),
    )
    return (
        buckets.join(li_agg, "qbucket")
        .groupBy("p_partkey")
        .agg(
            F.sum("n").alias("n_lineitems"),
            F.sum("rev").cast("double").alias("band_revenue"),
        )
    )
