"""Remaining TPC-H query shapes (Q4, Q6, Q10, Q12-Q17, Q18-Q22),
adapted to this lake's star schema — together with the shapes in
``relational.py`` / ``relational_ext.py`` (Q1/Q2/Q3/Q5/Q7/Q8/Q9/Q11)
every TPC-H query Q1-Q22 now has an adapted, oracle-checked twin.

The reference's query surface is an arbitrary SQL pass-through
(reference ``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:113``,
SURVEY.md §2.5 Q1), so the full dialect is in-scope; this module closes
out the classic decision-support shapes the other relational modules
don't cover: correlated EXISTS / NOT EXISTS (decorrelated by Catalyst
into semi/anti joins), left-join histograms, conditional revenue
shares, distinct-count rollups with NOT IN exclusion, per-group
threshold scans, and disjunctive join predicates.

Schema adaptations (the driver's tables carry no partsupp /
commitdate / receiptdate / shipmode / phone):

* Q4's ``l_commitdate < l_receiptdate`` lateness test becomes
  ``l_shipdate > o_orderdate`` (ships after the order date — true for
  ~51% of lines, same selectivity ballpark).
* Q12's shipmode classes become shipping-latency buckets
  (``datediff(l_shipdate, o_orderdate)``).
* Q16/Q17's partsupp becomes the observed supplier-part pairs
  ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem``.
* Q21's "kept orders waiting" becomes "was the strictly-latest shipper
  in a multi-supplier order".
* Q22's phone-prefix cut becomes a nation rollup; "no orders" (which
  this corpus never satisfies — every customer has orders) becomes
  "no URGENT orders".

Determinism contract (registry.py module docstring): money sums go
through DECIMAL casts before SUM; derived shares divide two exact
decimals cast to double (one correctly-rounded operation each);
SUM(CASE) counts are CAST AS BIGINT in the oracles (DuckDB yields
HUGEINT, Spark BIGINT — the r01 hash-mismatch lesson); top-k orderings
carry a unique tiebreak key. ``l_quantity`` is integer-valued in this
corpus (verified), so double sums of it are exact at any aggregation
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
from data_lake_construction_and_querying_with_pyspark_spark.operators.relational import (
    _dec2,
    _dec6,
)


@register(
    "order_priority_checking_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def order_priority_checking_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: priority histogram of orders having ≥1 late line.
    The correlated EXISTS is a LEFT SEMI join with a non-equi conjunct
    (l_shipdate > o_orderdate) riding the orderkey equi-key — Spark
    executes one shuffled semi join keyed on orderkey (the inequality
    evaluates as a join residual, never a cartesian), then a ≤5-group
    hash aggregate. Filter on o_orderdate is pushed to the scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "returned_item_reporting_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-07-01'
      AND o.o_orderdate < TIMESTAMP '1995-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_reporting_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    quarter. Fact-fact orders⋈lineitem shuffles on orderkey with both
    date and returnflag filters pushed below the join; customer joins
    on custkey and the 25-row nation is broadcast. Exact-decimal
    revenue + custkey tiebreak keep the top-20 cut engine-portable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "shipping_latency_priority_q12",
    oracle="""
    SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) <= 30
                THEN 'fast' ELSE 'slow' END AS latency_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def shipping_latency_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 with latency buckets standing in for ship modes:
    fact-fact join on orderkey, then a 2-group conditional-count
    rollup. The datediff bucket is computed post-join (it needs both
    sides); the priority CASE counts are map-side partial aggregates,
    so the final shuffle moves 2 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, "fast"
    ).otherwise("slow")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("latency_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "customer_order_distribution_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    ) cnt
    GROUP BY c_count
    """,
)
def customer_order_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over a filtered LEFT join. The
    priority predicate lives in the join condition, NOT a WHERE (a
    WHERE would silently turn the outer join inner and drop 0-order
    customers); COUNT(o_orderkey) counts matched rows only, so
    unmatched customers land in the c_count=0 bin. Two aggregations:
    per-customer (shuffles on custkey — same key as the join, so AQE
    reuses the partitioning) then a tiny histogram shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "promo_revenue_share_q14",
    oracle="""
    SELECT 100.0 * (CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                    / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                           AS DOUBLE)) AS promo_share,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def promo_revenue_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one ship-month. Part is
    broadcast (dimension-sized); the shipdate window is pushed to the
    lineitem scan. Both the conditional and total sums are exact
    decimals; the share divides the two after a single cast to double
    each, so the percentage is bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
    total = F.sum(rev).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            # (promo/total)*100, matching the oracle's 100*(promo/total):
            # IEEE multiplication commutes bit-exactly, division order
            # does not — (100*promo)/total rounds differently (seen as a
            # 1-ulp hash mismatch).
            ((promo / total) * F.lit(100.0)).alias("promo_share"),
            total.alias("total_revenue"),
        )
    )


@register(
    "parts_supplier_counts_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def parts_supplier_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 with observed (part, supplier) pairs standing in for
    partsupp, and the comment-LIKE supplier exclusion replaced by a
    negative-balance NOT IN (decorrelated to a broadcast LEFT ANTI
    join — the exclusion list is supplier-sized). The distinct
    pair-projection collapses lineitem to partsupp cardinality BEFORE
    any join; part filters prune brand/type/size at the scan."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "small_quantity_revenue_q17",
    oracle="""
    WITH thr AS (
        SELECT l_partkey,
               0.4 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*)) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN thr t ON l.l_partkey = t.l_partkey
    WHERE p.p_brand = 'Brand#7'
      AND l.l_quantity < t.qty_threshold
    """,
)
def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would vanish if small-quantity orders
    (below 40% of the part's mean quantity) were batched. The
    correlated AVG subquery is written as an explicit aggregate+join —
    the plan Catalyst decorrelates to anyway. The per-part mean is
    exact-decimal-sum / count cast once to double, so the strict `<`
    cut selects identical rows cross-engine (quantities are
    integer-valued; the threshold is fractional). The brand filter
    prunes part before its broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7")
    thr = li.groupBy("l_partkey").agg(
        (
            F.lit(0.4)
            * (F.sum(_dec2("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "large_volume_customers_q18",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           SUM(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def large_volume_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers holding orders with total quantity > 250
    (≈ the 99th percentile). The IN-subquery is a semi join against
    the qualifying-order aggregate — at scale the qualifier output is
    tiny (top ~1% of orders), so AQE turns that semi join into a
    broadcast. Quantity sums are doubles over integer values: exact at
    any order, no decimal detour needed."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


@register(
    "disjunctive_predicates_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_predicates_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR-of-ANDs mixing both join sides.
    The equi-key (partkey) still drives a hash join — the disjunction
    is a post-join residual, not a cartesian — and Catalyst extracts
    the common single-side implications (brand ∈ {…}, size ≤ 15,
    quantity ≤ 30) as pushed-down scan filters on each side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branch = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#11") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#21") & s.between(1, 15) & q.between(20, 30))
    )
    rev = _dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q21_SQL = """
    SELECT s.s_name AS supplier_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
"""


@register("late_shipper_q21", oracle=_Q21_SQL)
def late_shipper_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-supplier count of finished multi-supplier
    orders where that supplier was the strictly-latest shipper
    (EXISTS another supplier's line; NOT EXISTS a later one). Run as
    literal SQL — the identical string is the oracle — so Catalyst's
    subquery decorrelation is what's under test: EXISTS becomes a
    shuffled LEFT SEMI join and NOT EXISTS a LEFT ANTI join, both
    keyed on orderkey with the supplier/shipdate inequalities as join
    residuals. Three shuffles of lineitem on the same key — at 100 TB
    you'd pre-bucket lineitem by orderkey and all three become
    shuffle-free."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
    SELECT c.c_nationkey AS nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                                     AS DOUBLE) / COUNT(*)
                         FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
"""


@register("sales_opportunity_q22", oracle=_Q22_SQL)
def sales_opportunity_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: nation rollup of well-funded customers (balance
    above the positive-balance mean — exact-decimal mean, one cast to
    double) who placed no URGENT orders. Literal SQL shared with the
    oracle: the scalar subquery runs as a 1-row job feeding a pushed
    filter, and NOT EXISTS decorrelates to a LEFT ANTI join against
    the URGENT-filtered orders projection."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q22_SQL)


@register(
    "forecast_revenue_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the revenue-change forecast — a pure scan-side query:
    every predicate (shipdate range, discount band, quantity cap)
    pushes to the parquet scan, no join, one partial-aggregated
    global sum. The canonical 'is pushdown working' probe: its plan
    must show all three PushedFilters and a two-phase HashAggregate
    over a 1-row shuffle. Discount literals are inexact doubles, but
    both engines compare the same stored double against the same
    literal, so the selection is identical."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q15_SQL = """
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                    AS DOUBLE) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
"""


@register("top_supplier_q15", oracle=_Q15_SQL)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's top revenue supplier(s) — the view-
    plus-scalar-MAX shape. Literal SQL shared with the oracle: the
    revenue CTE is referenced twice (join input + MAX subquery) and
    Spark plans the MAX as a one-row scalar-subquery job feeding a
    post-aggregate filter. Ties are kept by both engines; equality on
    the exact-decimal-derived double is portable where it would be
    flaky on a float SUM."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q15_SQL)


@register(
    "dominant_supplier_q20",
    oracle="""
    WITH pq AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
        FROM lineitem
        WHERE year(l_shipdate) = 1995
        GROUP BY l_partkey, l_suppkey
    ),
    pt AS (SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN pq ON pq.l_suppkey = s.s_suppkey
    JOIN pt ON pq.l_partkey = pt.l_partkey
    WHERE pq.sq > 0.5 * pt.tq
    """,
)
def dominant_supplier_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape with observed shipments standing in for
    partsupp availability: suppliers who shipped more than half of some
    part's 1995 volume. Two stacked aggregates on the same first-level
    grouping — the (part, supplier) rollup re-aggregates to per-part
    totals, so the second shuffle moves part-level rows only — then a
    broadcast-sized supplier join and a distinct. Quantity sums are
    integer-valued doubles (exact at any order); 0.5 × tq is one exact
    double product, so the > cut is engine-portable."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1995)
    s = load_table(spark, sf_dir, "supplier")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("sq"))
    pt = pq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dominant = (
        pq.join(pt, "l_partkey")
        .filter(F.col("sq") > F.lit(0.5) * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
