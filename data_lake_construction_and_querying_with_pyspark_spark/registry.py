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
* DuckDB types a bare ``2.2`` as DECIMAL, so ``int_col * 2.2`` is
  EXACT decimal arithmetic — a different value than Spark's double
  multiply. Non-binary-exact literals that multiply/add with INTEGER
  columns must be ``CAST(... AS DOUBLE)`` in the oracle. Safe without
  a cast: literals in ``/`` (always DOUBLE in DuckDB), literals
  combining with an already-DOUBLE operand (the decimal→double
  conversion equals parsing the literal as a double), and
  binary-exact literals (0.5, 0.25, 0.75, 10.0, …) in any context.
  Audited across the full oracle surface 2026-08-14; the one
  violation (BM25's ``tf * 2.2``) is fixed and documented in place.
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


# Registration ORDER is a contract with the external correctness driver,
# which verifies only the first 50 registered entries (r01 evidence:
# positions 51-78 got zero CORRECTNESS rows). The window must therefore
# hold (a) only oracle-bearing entries — a rows-only entry inside it
# burns a slot as `err: "no_oracle"` — and (b) the queries whose
# verification matters most. Everything outside the window stays pinned
# locally by tests/test_queries_oracle.py, which checks ALL entries.
#
# Round-10 rotation (VERDICT r9 directive #1, rotated as the FIRST
# commit of the round per What's-wrong #4): ALL 37 oracle-bearing
# entries whose latest driver row is r7 (the contract edge — the
# scalar packs, set ops, windows, events analytics, knn_brute_force/
# top1, bpe_encode, rerank, format roundtrips), then 13 picks. Four
# of the picks are the operators r10 MODIFIES (VERDICT r9 directives
# #2/#3: weighted_systematic_draw + dsir_resample_draw are r9-green
# but get the two-phase bucket-offset de-serialization this round;
# sequence_packing + source_mix_draw are r8-aged AND modified), so
# the driver re-verifies the changed code on first exposure. The
# remaining 9 are complexity-first r8-aged picks (the span/cluster/
# cosine dedup ladder, SemDeDup fold, pagerank, PCA, stupid-backoff,
# WITH RECURSIVE). The 39 r8-aged entries left out keep green r8
# rows — exactly 2 rounds old at end of r10, inside the contract —
# and form r11's must-set (39 ≤ 50: feasible, asserted one round
# ahead by tests/test_registry_window.py).
# tests/test_registry_window.py derives this plan from the
# committed CORRECTNESS_r*.json artifacts and fails CI if mis-planned.
# Everything outside the window stays pinned locally by
# tests/test_queries_oracle.py, which checks ALL entries every run.
_CHECKED_WINDOW_FIRST: tuple[str, ...] = (
    # Round-12 rotation. -- r9-aged, contract edge this round: all 41
    # (every oracle entry whose latest driver row is r9 — 2 rounds old
    # at start of r12, stale at its end if left out) --
    "acid_change_feed",
    "acid_delete_data_skipping",
    "acid_orders_lifecycle",
    "asof_latest_order_per_event",
    "corr_quantity_price_exact",
    "customer_order_distribution_q13",
    "decontamination_overlap",
    "dedup_canonical_corpus",
    "dedup_canonical_corpus_embeddings",
    "deterministic_shuffle",
    "disjunctive_predicates_q19",
    "doc_repetition_signals",
    "dominant_supplier_q20",
    "event_transition_counts",
    "events_click_purchase_pairs",
    "events_cusum_drift",
    "events_hourly_rollup",
    "flagship_between",
    "forecast_revenue_q6",
    "histogram_order_totalprice",
    "join_fact_fact_revenue",
    "knn_pq_adc",
    "large_volume_customers_q18",
    "late_shipper_q21",
    "lm_perplexity_buckets",
    "order_priority_checking_q4",
    "parts_supplier_counts_q16",
    "pii_anonymize_customers",
    "promo_revenue_share_q14",
    "returned_item_reporting_q10",
    "sales_opportunity_q22",
    "shipping_latency_priority_q12",
    "small_quantity_revenue_q17",
    "source_mix_temperature_draw",
    "table_profile_events",
    "text_fingerprints",
    "text_quality_scores",
    "text_token_stats",
    "top_supplier_q15",
    "train_val_test_split",
    "unpivot_lineitem_measures",
    # -- r11-rewritten paths the driver has not seen on their new code
    # (VERDICT r11 Next-round #2: rotated out in 121852d BEFORE the
    # rewrites landed) --
    "pagerank_trade_network",
    "dedup_cluster_assignment",
    "semantic_dedup_embeddings",
    "dedup_embedding_cosine_pairs",
    "dedup_repeated_spans",
    "pricing_summary",
    # -- operators MODIFIED this round (r12): posting-list pre-prune +
    # persisted sizes (jaccard kernel), driver-side anchor bucketing +
    # seed collect gate (shortlist kernel — also covered above via
    # semantic_dedup_embeddings), corpus-quality scan fan-out. The
    # remaining shortlist consumers (knn_ivf_*, knn_pq_adc via the
    # forced list, hard_negative_mining) ride the same kernel; those
    # not in this window are r11-green and forced into r13's. --
    "dedup_ngram_jaccard_pairs",
    "semantic_dedup_sampled",
    "gopher_quality_filters",
)


def _ordered() -> dict[str, QuerySpec]:
    """QUERIES reordered for the driver's 50-slot window: the explicit
    priority list first, then remaining oracle-bearing entries in
    registration order, then every rows-only (oracle=None) entry last."""
    missing = [n for n in _CHECKED_WINDOW_FIRST if n not in QUERIES]
    if missing:
        raise KeyError(f"_CHECKED_WINDOW_FIRST names not registered: {missing}")
    out: dict[str, QuerySpec] = {n: QUERIES[n] for n in _CHECKED_WINDOW_FIRST}
    for name, spec in QUERIES.items():
        if name not in out and spec.oracle is not None:
            out[name] = spec
    for name, spec in QUERIES.items():
        if name not in out:
            out[name] = spec
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Import for side effect: each module registers its queries.
    from data_lake_construction_and_querying_with_pyspark_spark.operators import relational  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import relational_ext  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import tpch_more  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import dedup  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import text  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import tokenizer  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import similarity  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import timeseries  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import asof  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import events_analytics  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import corpus_quality  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import semantic  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import privacy  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import quality_gates  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import splits  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import profiling  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import statistics  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import retrieval  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import formats_roundtrip  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import graph  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import lake_acid  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import pca  # noqa: F401
    # the GEMM-twin modules register their production paths rows-only
    # (r8): no oracle — the BLAS ulp caveat in each module docstring —
    # so they sort after every oracle-bearing entry and never burn a
    # driver-window slot; value agreement with the hash-oracled fold
    # entries is pinned by the twin pytest suites + the rung gate
    from data_lake_construction_and_querying_with_pyspark_spark.operators import dedup_vectorized  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import semantic_vectorized  # noqa: F401
    from data_lake_construction_and_querying_with_pyspark_spark.operators import similarity_vectorized  # noqa: F401
    # registers streaming_hourly_rollup at module level like every
    # other entry (r7: the lazy special-case here made the registered
    # count method-dependent — 138 from bare module imports vs 139
    # from all_queries() — which tripped the r6 advisor's recount)
    from data_lake_construction_and_querying_with_pyspark_spark.streaming import windows  # noqa: F401

    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    all_queries()
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
