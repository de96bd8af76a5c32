"""Query registry — the engine's curated, tested query surface.

The reference's query capability is a single pass-through —
``spark.sql(query)`` with a caller-supplied string (reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:113``,
SURVEY.md §2.5 Q1) — which makes the whole Spark SQL dialect in-scope.
This registry pins down the curated operator subset as named, tested
query builders: each entry is a ``(spark, sf_dir) -> DataFrame``
callable plus (where SQL-expressible) an ANSI-SQL oracle string that
DuckDB can run on the same parquet tables for an order-insensitive
value-for-value correctness check.

Determinism contract for oracle-checked queries (what keeps a Spark
result and a DuckDB result hash-identical):

* Money sums go through ``CAST(x AS DECIMAL(18,2))`` (or ``18,4`` for
  discounted products) **before** ``SUM`` — decimal addition is exact
  and associative, so partial aggregation order (which differs between
  Spark partitions and DuckDB morsels) cannot change the result. The
  final value is cast back to DOUBLE (one correctly-rounded
  conversion). Raw ``SUM(double)`` is order-dependent in the low bits
  and NOT comparable across engines.
* Averages are derived as exact-decimal-sum / count in double, never
  engine-native ``AVG(double)``.
* Every top-k / row_number ordering carries a unique tiebreak key.
* Column aliases are identical in the Spark builder and the SQL
  oracle — the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a ``(spark, sf_dir) -> DataFrame`` builder."""

    def deco(fn):
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Import for side effect: each module registers its queries.
    from data_lake_construction_and_querying_with_pyspark_spark.operators import relational  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import relational_ext  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import dedup  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import text  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import similarity  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import timeseries  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import asof  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import events_analytics  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.streaming.windows import (
        streaming_hourly_rollup_query,
    )

    if "streaming_hourly_rollup" not in QUERIES:
        QUERIES["streaming_hourly_rollup"] = QuerySpec(
            name="streaming_hourly_rollup",
            fn=streaming_hourly_rollup_query,
            oracle=None,
            doc="Structured Streaming hourly rollup drained via availableNow (rows-only).",
        )

    return {name: spec.fn for name, spec in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    all_queries()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
