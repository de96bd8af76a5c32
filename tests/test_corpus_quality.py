"""Invariant tests for corpus-hygiene and lake-gate operators —
properties the DuckDB oracles cannot express (they check equality, not
the semantic contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_weighted_draw_conserves_draw_count(spark):
    """Systematic sampling must place exactly one draw per STEP chars
    of each shard's stream: Σ n_draws per source == number of
    multiples of STEP in [0, shard_total_chars) == ceil(total/STEP).
    This pins the integer-division formula against off-by-one drift
    (the property that caught the floor-vs-truncate divergence)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.corpus_quality import (
        _DRAW_STEP,
        weighted_systematic_draw,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    got = {
        r["source"]: r["draws"]
        for r in weighted_systematic_draw(spark, SF_SMOKE)
        .groupBy("source")
        .agg(F.sum("n_draws").alias("draws"))
        .collect()
    }
    totals = {
        r["source"]: r["total"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(F.sum("n_chars").alias("total"))
        .collect()
    }
    want = {s: -(-t // _DRAW_STEP) for s, t in totals.items()}  # ceil
    assert got == {s: w for s, w in want.items() if w > 0}


def test_expectations_pass_on_clean_lake(spark):
    """The driver fixture is a clean lake: every rule must report zero
    violations — the condition under which a CI gate allows publish.
    (Rules firing here would mean the rule predicates drifted from the
    fixture contract in FIXTURES.md, not that the lake went bad.)"""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.quality_gates import (
        _ORDER_RULES,
        expectations_orders,
    )

    rows = {r["rule"]: r["n_violations"] for r in expectations_orders(spark, SF_SMOKE).collect()}
    assert set(rows) == {n for n, _ in _ORDER_RULES} | {"custkey_fk_exists"}
    assert all(v == 0 for v in rows.values()), rows
