"""Every registered query vs its DuckDB oracle at sf0.001 (fast smoke;
the driver runs the same comparison at sf0.01). Shares the comparison
logic with scripts/check_oracles.py.
"""

from __future__ import annotations

import duckdb
import pytest

from scripts.check_oracles import TABLES, compare
from data_lake_construction_and_querying_with_pyspark_spark.registry import (
    all_oracles,
    all_queries,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return con


QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLES:
        assert sdf is not None  # rows-only contract
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_fixed_geometry_demo_matches_oracle(spark, duck):
    """The deregistered geometry-contrast demo (r5, VERDICT r4
    directive #4) keeps its exact-oracle pin here even though it no
    longer occupies a registry slot — see docs/SCALING.md's worked
    example for why its 256-key bands were demoted."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        _oracle_cosine_pairs,
        dedup_embedding_cosine_pairs_demo_fixed_geometry,
    )

    sdf = dedup_embedding_cosine_pairs_demo_fixed_geometry(spark, SF_SMOKE).toPandas()
    odf = duck.execute(_oracle_cosine_pairs()).fetchdf()
    problems = compare("dedup_embedding_cosine_pairs_demo_fixed_geometry", sdf, odf)
    assert not problems, problems
