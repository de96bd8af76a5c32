"""funnel_conversion semantics on a crafted corpus (r7): the driver
fixture is fully-converting (every user completes the funnel), so the
strict-after chain's dropout and tie behavior is pinned here instead."""

from __future__ import annotations

import datetime as dt

import pytest


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_funnel_strict_after_chain_with_dropouts(spark, tmp_path):
    from data_lake_construction_and_querying_with_pyspark_spark.registry import all_queries

    rows = [
        # user 1 completes in order
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "signup", _ts(3)), (1, "purchase", _ts(4)),
        # user 2: click TIES the first view (not strictly after) -> stops at view;
        # the later signup must NOT count (chain is gated on click)
        (2, "view", _ts(1)), (2, "click", _ts(1)), (2, "signup", _ts(5)),
        # user 3: no view at all -> counted nowhere
        (3, "click", _ts(1)), (3, "purchase", _ts(2)),
        # user 4: one click BEFORE the view is ignored, the later one counts;
        # signup precedes that click -> no signup
        (4, "click", _ts(2)), (4, "view", _ts(3)), (4, "signup", _ts(4)), (4, "click", _ts(5)),
        # user 5: view only
        (5, "view", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = all_queries()["funnel_conversion"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_view, r.n_click, r.n_signup, r.n_purchase) == (4, 2, 1, 1)

    # the DuckDB oracle agrees on the same crafted corpus
    duckdb = pytest.importorskip("duckdb")
    spec = __import__(
        "data_lake_construction_and_querying_with_pyspark_spark.registry", fromlist=["QUERIES"]
    ).QUERIES["funnel_conversion"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.execute(spec.oracle).fetchone()
    assert tuple(o) == (4, 2, 1, 1)
