"""Statistical aggregates (extension surface, SURVEY.md §2.7).

The engine-native ``corr``/``covar_samp``/``stddev`` aggregates are
float-order-dependent — Spark partitions and DuckDB morsels reduce in
different orders, so their low bits differ and a typed value-hash
comparison fails even when both are "right". These operators instead
compute second-moment statistics THE DISTRIBUTED WAY: exact partial
sums (decimal for money, doubles only where integer-valued inputs keep
them exact) combined into the final statistic with a fixed double
expression. That makes them deterministic under ANY partitioning —
AQE re-plans, task retries, cluster resizes — which is the same
property the money-sum contract pins (registry.py docstring), extended
to ratios of moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table


@register(
    "corr_quantity_price_exact",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)
             AS corr_qty_price,
           round((sxy - (sx * sy) / n) / (n - 1.0), 9) AS covar_samp_qty_price,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
             AS slope_price_per_qty
    FROM m
    """,
)
def corr_quantity_price_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Pearson correlation, sample covariance, and OLS
    slope of (quantity → extendedprice), from exact partial moments:
    one aggregation computes n, Σx, Σy, Σx², Σy², Σxy as decimals
    (every term is exactly representable: quantities are integers ≤ 50,
    prices have 2 decimals, so the products carry ≤ 4 decimals well
    inside DECIMAL(18,4) before summation), then the statistics
    combine in double. Identical answers at any partitioning — unlike
    engine-native ``F.corr``, whose float accumulation order varies.
    This partial-moments shape is also how the map-side combine works
    at scale: 6 numbers per group cross the shuffle, not values."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((q * q).cast("decimal(18,4)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(18,4)")).cast("double").alias("syy"),
        F.sum((q * p).cast("decimal(18,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # The partial sums are exact; the final double combination is NOT
    # bit-stable across engines (decimal→double cast strategy / FMA
    # contraction differ — observed 3.5e-18 divergence at sf0.001), so
    # the derived statistics are rounded to 9 dp on both sides. Spark's
    # HALF_UP and DuckDB's half-away-from-zero agree on every sign.
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9
        ).alias("corr_qty_price"),
        F.round((sxy - (sx * sy) / n) / (n - F.lit(1.0)), 9).alias(
            "covar_samp_qty_price"
        ),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9).alias(
            "slope_price_per_qty"
        ),
    )


_HIST_WIDTH = 30_000.0
_HIST_BINS = 20


@register(
    "histogram_order_totalprice",
    oracle=f"""
    SELECT LEAST(CAST(floor(o_totalprice / {_HIST_WIDTH}) AS BIGINT), {_HIST_BINS - 1})
             AS bucket,
           LEAST(CAST(floor(o_totalprice / {_HIST_WIDTH}) AS BIGINT), {_HIST_BINS - 1})
             * {_HIST_WIDTH} AS bucket_lo,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound equi-width histogram of order totalprice (20 ×
    30 000 bins, top bin open). Fixed bounds — not data-driven min/max
    — so the whole thing is one projection + partial-aggregated
    groupBy: no extra scan to find the range, no scalar-subquery
    barrier, and bins are stable across snapshots of a growing lake
    (the property dashboards diffing day-over-day histograms need).
    The bucket expression is floor of one double division — identical
    in both engines."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(_HIST_WIDTH)), F.lit(_HIST_BINS - 1)
    ).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * F.lit(_HIST_WIDTH)).alias("bucket_lo"),
            "n_orders",
        )
    )


@register(
    "outlier_orders_zscore",
    oracle="""
    WITH m AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           round((o_totalprice - s1 / n)
                 / sqrt(s2 / n - (s1 / n) * (s1 / n)), 9) AS z_score
    FROM orders JOIN m USING (o_orderpriority)
    WHERE abs(round((o_totalprice - s1 / n)
                    / sqrt(s2 / n - (s1 / n) * (s1 / n)), 9)) > 1.5
    """,
)
def outlier_orders_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority z-score outliers (|z| > 1.5) over order totalprice,
    from the same exact-partial-moment machinery as the correlation
    operator: one aggregation ships (n, Σx, Σx²) per group — the
    squares multiplied as DECIMALS so the products are exact (a double
    product cast to 4 decimals sits within 3× of totalprice²'s noise
    floor; decimal×decimal does not round at all) — then the tiny
    stats table broadcasts back onto the fact scan. The z-score is
    rounded to 9 dp on BOTH sides before the threshold compare, so the
    emitted row set is identical across engines (registry determinism
    contract applied to a filter predicate). Two scans of orders, one
    broadcast join, no window."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    pd2 = p.cast("decimal(18,2)")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(pd2).cast("double").alias("s1"),
        F.sum(pd2 * pd2).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    z = F.round((p - s1 / n) / F.sqrt(s2 / n - (s1 / n) * (s1 / n)), 9)
    return (
        o.join(F.broadcast(m), "o_orderpriority")
        .select("o_orderkey", "o_orderpriority", "o_totalprice", z.alias("z_score"))
        .filter(F.abs(F.col("z_score")) > 1.5)
    )


@register(
    "event_transition_counts",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    )
    SELECT src, dst, COUNT(*) AS n_transitions
    FROM nxt WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence: LEAD over (user_id, ts, event_id) — the event_id
    tiebreak makes simultaneous events deterministic — then a 25-cell
    (5×5 event types) aggregate. One shuffle for the per-user window
    (hash-partitioned by user_id, sort within partitions), one tiny
    shuffle for the counts; the window never sees more than one user's
    history per task."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    return (
        nxt.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
