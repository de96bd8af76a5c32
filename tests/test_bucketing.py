"""Bucketed-table co-location: joins on the bucket key must be
shuffle-free — the 100 TB repeated-join strategy (SURVEY.md §7).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
    from data_lake_construction_and_querying_with_pyspark_spark.sources.sinks import (
        write_bucketed_table,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed_table(li, "bkt_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed_table(o, "bkt_orders", ["o_orderkey"], n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    # Disable auto-broadcast so the join would otherwise shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("bkt_lineitem")
        o = spark.table("bkt_orders")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain(spark, bucketed):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
    )
    bkt = (
        spark.table("bkt_lineitem")
        .join(spark.table("bkt_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )
    )
    assert plain.first() == bkt.first()
