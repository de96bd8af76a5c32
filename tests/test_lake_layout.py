"""Ingest robustness (corrupt-record quarantine) and data-skipping
lake layout (sorted writes → disjoint parquet min/max statistics).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_corrupt_capture_quarantines_bad_rows(spark, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import (
        read_csv_with_corrupt_capture,
        split_corrupt,
    )

    p = tmp_path / "dirty.csv"
    p.write_text(
        "a,b,c\n"
        "1,x,10\n"
        "2,y\n"  # short row
        "3,z,30,EXTRA\n"  # long row
        "4,w,40\n"
    )
    df = read_csv_with_corrupt_capture(spark, str(p), ["a", "b", "c"])
    clean, quarantine = split_corrupt(df)
    assert clean.count() == 2
    assert "_corrupt_record" not in clean.columns
    assert quarantine.count() == 2
    raws = {r["_corrupt_record"] for r in quarantine.collect()}
    assert raws == {"2,y", "3,z,30,EXTRA"}


def test_sorted_write_produces_disjoint_file_ranges(spark, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
    from data_lake_construction_and_querying_with_pyspark_spark.sources.sinks import (
        write_sorted_lake,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_sorted")
    write_sorted_lake(orders, out, ["o_orderdate"], n_files=4)

    files = sorted(Path(out).glob("*.parquet"))
    assert len(files) >= 3  # range partitioner may merge tiny tails
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_orderdate"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # each file covers a narrow, non-overlapping slice of the date range
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {(lo1, hi1)} vs {(lo2, hi2)}"

    # and the filter still pushes down over the sorted layout
    narrow = spark.read.parquet(out).filter(
        F.col("o_orderdate").between("1996-01-01", "1996-03-31")
    )
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters")[1][:300]
    assert narrow.count() > 0


def test_partitioned_lake_prunes_partitions(spark, tmp_path):
    """Date-partitioned output + a partition-key filter must prune at
    planning time (PartitionFilters, one directory scanned) — the
    docx §8 recommendation the reference never implemented."""
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
    from data_lake_construction_and_querying_with_pyspark_spark.sources.sinks import write_lake

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_lake(orders, out, "parquet", partition_by=["order_year"])

    one_year = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1][:200]
    n_1996 = one_year.count()
    assert (
        n_1996
        == load_table(spark, SF_SMOKE, "orders")
        .filter(F.year("o_orderdate") == 1996)
        .count()
        > 0
    )
