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


def _files_overlapping(path, col, lo, hi):
    """Files whose parquet [min,max] for `col` intersects [lo,hi] — the
    set a stats-pruning reader must actually open."""
    hit = 0
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        if min(mins) <= hi and max(maxs) >= lo:
            hit += 1
    return hit


def test_zorder_write_skips_on_both_dimensions(spark, tmp_path):
    """Single-column sort skips perfectly on its column and not at all
    on any other; the Z-order layout must skip files for range
    predicates on EITHER clustered column."""
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table
    from data_lake_construction_and_querying_with_pyspark_spark.sources.sinks import (
        write_sorted_lake,
        write_zorder_lake,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    by_custkey = str(tmp_path / "orders_custkey_sorted")
    by_z = str(tmp_path / "orders_zorder")
    write_sorted_lake(orders, by_custkey, ["o_custkey"], n_files=16)
    write_zorder_lake(orders, by_z, ["o_custkey", "o_totalprice"], n_files=16)

    n_sorted = len(list(Path(by_custkey).glob("*.parquet")))
    n_z = len(list(Path(by_z).glob("*.parquet")))

    # ~20% band on the UNSORTED dimension: the custkey sort can skip
    # nothing (every file spans ~the full price range); Z-order reads
    # only the grid rows the band crosses
    lo, hi = orders.approxQuantile("o_totalprice", [0.4, 0.6], 0.001)
    sorted_hits = _files_overlapping(by_custkey, "o_totalprice", lo, hi)
    z_hits = _files_overlapping(by_z, "o_totalprice", lo, hi)
    assert sorted_hits >= n_sorted - 1, (sorted_hits, n_sorted)
    assert z_hits <= 0.7 * n_z, f"z-order read {z_hits}/{n_z} files for a 20% band"

    # narrow predicate on the sorted dimension still skips under Z-order
    # (coarser than the dedicated sort, but far from a full scan)
    klo, khi = orders.approxQuantile("o_custkey", [0.45, 0.55], 0.001)
    assert _files_overlapping(by_z, "o_custkey", klo, khi) <= 0.7 * n_z

    # correctness: both layouts hold exactly the same rows
    assert spark.read.parquet(by_z).count() == orders.count()
    both = (
        spark.read.parquet(by_z)
        .filter(F.col("o_totalprice").between(lo, hi) & F.col("o_custkey").between(klo, khi))
        .count()
    )
    expected = orders.filter(
        F.col("o_totalprice").between(lo, hi) & F.col("o_custkey").between(klo, khi)
    ).count()
    assert both == expected
