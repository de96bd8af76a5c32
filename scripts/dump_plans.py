"""Regenerate docs/PLANS.md: the physical plans of representative
queries with the properties the engine guarantees called out.

Usage: python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

COMMENTARY = {
    "filter_project_pushdown": (
        "Predicate AND projection reach the parquet scan: PushedFilters "
        "carries both conditions, ReadSchema lists only the 3 selected "
        "columns. At 100 TB this is the difference between scanning 3 "
        "columns of matching row groups and scanning the table."
    ),
    "pricing_summary": (
        "Partial HashAggregate above the scan, final HashAggregate after "
        "a tiny Exchange — the shuffle carries at most "
        "(#flags × #statuses) pre-aggregated rows per map task. Money "
        "sums are DECIMAL(18,x): order-independent, so AQE re-plans and "
        "task retries cannot change results."
    ),
    "join_broadcast_chain": (
        "Both dimension joins are BroadcastHashJoin (no Exchange on the "
        "customer side until the final aggregation). The fact table is "
        "never shuffled for the join."
    ),
    "join_fact_fact_revenue": (
        "Fact-fact join: both sides exchange on the join key once "
        "(sort-merge / shuffled-hash chosen by size at runtime via AQE), "
        "then partial aggregation before the final shuffle."
    ),
    "topk_global_orders": (
        "TakeOrderedAndProject: per-partition top-k heaps merged at the "
        "driver — no global sort of 100 TB ever happens."
    ),
    "window_topk_per_customer": (
        "One Exchange on the window partition key, in-partition sort, "
        "rank filter. Per-group top-k without a global sort."
    ),
    "dedup_minhash_near_dup": (
        "The whole near-dup pipeline hangs off one persisted inverted "
        "index (InMemoryTableScan nodes); candidates come from the "
        "band-bucket equi-join, never an O(n²) cross join."
    ),
    "two_nation_trade_q7": (
        "Six-relation join tree: both nation dims broadcast under "
        "different aliases, facts exchange once each; the disjunctive "
        "nation predicate is pre-applied to the broadcast sides."
    ),
    "market_share_q8": (
        "Eight-relation Q8 tree: every dimension side is broadcast, the "
        "selective p_type and order-date filters are pushed into their "
        "scans, and the only Exchange left is the final per-year "
        "aggregation. The fact table is never shuffled for a join."
    ),
    "product_profit_q9": (
        "Q9 profit tree: LIKE-filtered part broadcast (StringContains "
        "pushed to the scan), supplier and nation broadcast, partial "
        "aggregation before the 25-nation × years shuffle."
    ),
    "important_parts_q11": (
        "Q11 HAVING-vs-global-scalar: the threshold is one scalar "
        "Subquery (a single one-row job), the HAVING is a cheap "
        "post-aggregate Filter — no join against the aggregate, no "
        "per-row re-aggregation. Both lineitem scans read only the 3 "
        "needed columns and aggregate partially before their shuffle."
    ),
    "asof_latest_order_per_event": (
        "As-of join as union + single window pass: one Exchange on the "
        "key, one sort — compare with a per-event range probe which "
        "would be a nested-loop join."
    ),
    "dedup_ngram_jaccard_pairs": (
        "Document-frequency pruning in the shingle pipeline: the "
        "df-filter (HashAggregate on shingle → df <= cap) gates the "
        "persisted inverted index BEFORE its self-join, so one "
        "boilerplate shingle cannot fan out df² candidate rows. "
        "Jaccard is computed single-pass over the pruned universe — "
        "the self-join's group counts ARE the intersections; no "
        "second verify join."
    ),
    "doc_repetition_signals": (
        "Zero Exchange nodes: duplicate-token and duplicate-2-gram "
        "fractions are higher-order array expressions inside one "
        "projection — the whole quality signal is map-side at any "
        "corpus size (pinned by test_repetition_signals_zero_shuffle)."
    ),
    "decontamination_overlap": (
        "The benchmark shingle set (tiny: eval suites, not corpus) "
        "broadcasts; the corpus inverted index streams through a "
        "BroadcastHashJoin probe with no shuffle — only the per-doc "
        "count aggregate exchanges."
    ),
    "sequence_packing": (
        "One Window node: the exclusive token prefix-sum per source "
        "shard is the only sort/shuffle; sequence ids are integer "
        "divisions and boundary-straddling docs explode through "
        "Generate. Shards pack in parallel — no global sort."
    ),
    "forecast_revenue_q6": (
        "The canonical pushdown probe: all three predicates (shipdate "
        "range, discount band, quantity cap) reach the parquet scan as "
        "PushedFilters; no join; a two-phase HashAggregate over a "
        "1-row shuffle. At 100 TB the scan reads only matching row "
        "groups of 4 columns."
    ),
    "late_shipper_q21": (
        "Correlated EXISTS / NOT EXISTS decorrelated by Catalyst into "
        "one LEFT SEMI and one LEFT ANTI join, both equi-keyed on "
        "orderkey with the supplier/shipdate inequalities as join "
        "residuals — never a per-row subquery, never a cartesian. "
        "Three lineitem shuffles on the same key: pre-bucketing the "
        "fact table by orderkey would make all three shuffle-free."
    ),
    "customer_order_distribution_q13": (
        "The priority filter lives in the LEFT JOIN's condition, so "
        "the physical join stays LeftOuter and zero-order customers "
        "survive into the c_count=0 bin; both aggregation levels run "
        "partial before their shuffles."
    ),
    "deterministic_shuffle": (
        "Global permutation rank with NO single-partition funnel for "
        "the data: the corpus-side row_number windows partition by the "
        "key's first hex byte (hashpartitioning Exchange), and the "
        "only Exchange SinglePartition in the plan carries the 256-row "
        "bucket-offset prefix sum. Bucket-major order equals global "
        "key order because the bucket is a key prefix."
    ),
    "semantic_dedup_embeddings": (
        "SemDeDup final stage: the Lloyd's assignment probes a "
        "broadcast coarse-anchor array (pure projection, zero shuffle) "
        "then argmins over the broadcast-joined shortlist buckets with "
        "a map-side partial min_by (only n rows reach the exchange, "
        "not n·k — and only ~2·√k·d fold work per vector), and the "
        "within-cluster pair scan is an equi-join on cell with the "
        "vec_id inequality as a join residual — pair volume is "
        "Σ|cell|², never n²."
    ),
    "boilerplate_token_scrub": (
        "The data-derived boilerplate vocabulary (high-DF tokens) "
        "broadcasts into a LEFT ANTI BroadcastHashJoin against the "
        "occurrence index; text rebuilds inside the per-doc aggregate "
        "(sorted struct collect), so full documents never shuffle as "
        "exploded rows more than once."
    ),
    "outlier_orders_zscore": (
        "Two-pass outlier emission: pass one ships 3 exact partial "
        "moments per group across a 5-row shuffle; the stats table "
        "broadcasts back onto the second fact scan (BroadcastHashJoin) "
        "— no window, no sort, and the fact table is never shuffled."
    ),
    "weighted_systematic_draw": (
        "One Window node per source shard (hashpartitioning Exchange on "
        "source) computes the exclusive character prefix sum; draw "
        "multiplicity is pure integer division in the projection. No "
        "global sort, no SinglePartition funnel for the data."
    ),
    "events_cusum_drift": (
        "CUSUM change detection as two window passes over ONE shared "
        "sort: the prefix-sum Window and the running-min Window reuse "
        "the same (event_type, ts, event_id) ordering — one Exchange, "
        "one Sort, both aggregates decimal-exact."
    ),
    "unpivot_lineitem_measures": (
        "UNPIVOT as a zero-shuffle Expand: 4 long-format rows per "
        "input row, map-side; the orderkey filter sits BELOW the "
        "Expand as a PushedFilter on the scan — melting first would "
        "have hidden it."
    ),
    "recursive_transition_paths": (
        "WITH RECURSIVE as a UnionLoop: each iteration joins only the "
        "k²-bounded frontier against the 25-row edge relation; the "
        "corpus-sized work is confined to the LEAD window that builds "
        "the edges once."
    ),
    "expectations_orders": (
        "All four predicate rules evaluate in ONE conditional-"
        "aggregation scan (a single partial HashAggregate feeding a "
        "1-row shuffle), unpivoted to rule rows; the FK rule is a "
        "broadcast LEFT ANTI join — never one scan per rule."
    ),
    "snapshot_diff_orders": (
        "Keyed snapshot diff: one SortMergeJoin FullOuter on the key "
        "over md5 content hashes; both sides prune to (key, hash "
        "inputs) at the scan. Bucket both snapshots by the key and "
        "the Exchange disappears."
    ),
    "table_profile_events": (
        "One scan feeds the whole profile: the multi-column exact "
        "COUNT DISTINCT plans as a single Expand + two-phase "
        "HashAggregate; the per-column rows come from exploding an "
        "array of struct literals over the 1-row aggregate — the "
        "6-scan UNION ALL the oracle runs is exactly what this avoids."
    ),
    "bm25_topk_documents": (
        "Inverted-index retrieval: the 3-row query-term table is a "
        "BroadcastHashJoin onto the exploded postings (the corpus never "
        "shuffles on token content), df/length statistics are tiny keyed "
        "aggregates broadcast back, per-term contributions are "
        "DECIMAL(38,12) before the per-doc SUM, and the final top-20 is "
        "TakeOrderedAndProject — per-partition heaps, no global sort."
    ),
    "gopher_quality_filters": (
        "The whole Gopher rule pack is ONE map-side projection: no "
        "Exchange anywhere in the plan, every ratio an integer-count "
        "division, rule booleans computed in the same codegen stage as "
        "the scan. At 100 TB the cost is exactly one pass over text."
    ),
    "dedup_repeated_spans": (
        "Positional 5-gram span dedup with the SOURCE-SIZE-derived "
        "reducer rule: one explicit span-keyed Exchange (numPartitions "
        "from span_shuffle_partitions — exempt from AQE's compressed-"
        "byte coalescing, which merged these ~10×-compressible posting "
        "rows into spilling reducers) that BOTH the df aggregate and "
        "the hit join reuse; the interval merge is two windows "
        "partitioned by doc_id. Never a broadcast: the reference set "
        "is the corpus itself."
    ),
    "knn_graph_top1": (
        "Approximate kNN-graph edges: buckets assemble via corpus × "
        "broadcast plane table (the audited BroadcastNestedLoopJoin), "
        "candidates via the (tbl, bucket) equi-join, and the per-vector "
        "argmax is a partial max_by that collapses map-side — the final "
        "Exchange carries one row per vector, never the candidate "
        "multiset."
    ),
    "knn_pq_adc": (
        "Product-quantization ADC: the trained codebooks and the "
        "query distance tables are broadcast (m·k* = 128 rows each "
        "side), corpus codes join them on (j, code) as a "
        "BroadcastHashJoin, and the per-(query, vector) distance is a "
        "partial-aggregated SUM — the only exchange carries one row "
        "per (query, vector). The exact-cosine rerank touches only "
        "top_k·|queries| vectors. At 100 TB the scanned 'corpus' is "
        "8-byte codes, not 512-byte vectors."
    ),
    "semantic_dedup_sampled": (
        "Sample-trained SemDeDup (the 10M-ready registered "
        "configuration): the md5-threshold sample is a scan-time Filter "
        "directly above the cached corpus (no shuffle, no RNG state — "
        "the same subtree the DuckDB oracle replays), training "
        "iterations run the shortlist assignment over only those ~8·k "
        "rows, and the ONE full-corpus pass is the final shortlist "
        "assignment: broadcast anchor-array probes as pure projection, "
        "broadcast bucket equi-join, map-side min_by argmin — n rows "
        "cross the exchange exactly once for assignment regardless of "
        "corpus size, and training cost is corpus-size-independent."
    ),
    "funnel_conversion": (
        "Ordered funnel in ONE events scan (r7): a single "
        "hashpartitioning Exchange on user_id feeds one two-phase "
        "ObjectHashAggregate collecting the first view plus each later "
        "type's event times; the strict-after chain (t2..t4) is an "
        "array filter/array_min projection, and the four stage counts "
        "ride one final 1-row aggregate. No joins, no cross joins — "
        "the old shape re-joined events per stage (4 shuffles) and "
        "crossJoined four 1-row count subtrees."
    ),
}



# Hand-maintained plan essays appended verbatim after the generated
# sections — regeneration must not clobber them (it did once, r7).
HAND_SECTIONS = """\
## bpe_learn_merges / bpe_token_counts / bpe_encode_documents

Tokenizer-training family (`operators/tokenizer.py`). Three plan
shapes, pinned by `tests/test_plans.py::test_bpe_stage_plans`:

**Word-frequency build** (the ONE corpus-sized stage — shared subtree
of everything below):

```
HashAggregate (final: count → freq, + wrap chars as <c><h><a><r>)
+- Exchange hashpartitioning(word, 512)       -- the only corpus shuffle
   +- HashAggregate partial_count(1)           -- map-side combine
      +- Generate explode(filter(split(text)))
         +- Scan parquet ReadSchema: struct<text:string>   -- 1-col scan
```

Only `text` is read; partial counts collapse the token stream to
distinct words per map task before the exchange, so the shuffle carries
≤ |vocab| rows per task, not the token count.

**Per-iteration pair counting** (runs k times, vocabulary-sized):

```
HashAggregate (final sum → cnt)
+- Exchange hashpartitioning(lft, rgt, 512)    -- |pairs| ≤ |vocab|·len rows
   +- HashAggregate partial_sum(freq)
      +- Generate explode(arrays_zip(slice(syms,1,n-1), slice(syms,2,n-1)))
         +- [word-frequency subtree above]
```

One parquet scan total per iteration plan; the argmax is
`orderBy(cnt desc, lft, rgt).limit(1)` → TakeOrderedAndProject over the
vocabulary-sized aggregate, collected as ONE driver row per step (the
same deliberate driver-bounded shape as Lloyd's centroid
materialization). Applying the merge is a `replace` projection on the
word table — no action, just lineage for the next iteration.

**Document encode** (`bpe_encode_documents`, after the merges are
learned):

```
Project [doc_id, n_bpe_tokens, n_words, chars_per_token]
  -- k chained literal replace() calls inside ONE codegen'd projection
+- ColumnarToRow [codegen id : 1]
   +- Scan parquet ReadSchema: struct<doc_id,text,n_chars>
```

Zero exchanges, zero joins: the learned merges are inlined as string
literals, so the whole encode is a single whole-stage-codegen map over
the corpus — the textbook executor-scaled pass. Token count is
`length(seq) - length(replace(seq,'>',''))` (every symbol contributes
exactly one `>`), avoiding any split/explode on the hot path.

## rerank_bm25_candidates: the unpartitioned final window is deliberate

The ranking window at the end of the rerank pipeline
(`operators/retrieval.py`, `ROW_NUMBER() OVER (ORDER BY ...)` with no
PARTITION BY) triggers Spark's "No Partition Defined for Window
operation" WARN in every bench run. That is the plan we want, not an
oversight: the window's input is the BROADCAST top-50 candidate set —
exactly `top_n` rows at ANY corpus size (the 10M rung in
docs/SCALING.md measures the slope living entirely in the BM25 stage)
— so single-partition processing of 50 rows is O(top_n),
corpus-independent, and the only correct place to impose the global
rerank order. Repartitioning 50 rows to silence the WARN would add an
exchange for nothing.
"""


def main() -> None:
    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.registry import all_queries

    spark = get_spark(shuffle_partitions=8)
    qs = all_queries()
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        "Generated by `python scripts/dump_plans.py` at sf0.001 (plan shape",
        "is scale-independent; AQE adjusts partition counts at runtime).",
        "Each plan is followed by the property it demonstrates;",
        "`tests/test_plans.py` asserts these shapes stay true.",
        "",
    ]
    for name, comment in COMMENTARY.items():
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # keep the operator tree + scan details, drop per-node Input/Output noise
        tree, _, details = plan.partition("\n\n")
        keep = [tree, ""]
        for block in details.split("\n\n"):
            if any(k in block for k in ("PushedFilters", "ReadSchema", "Arguments: ")):
                keep.append(block)
                keep.append("")
        out += [f"## {name}", "", comment, "", "```", "\n".join(keep).strip(), "```", ""]
    out.append(HAND_SECTIONS)
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(COMMENTARY)} plans)")


if __name__ == "__main__":
    main()
