"""Lake data-quality gates and snapshot auditing.

Two operators every production lake runs between ingest and publish:

* ``expectations_orders`` — a declarative rule report (the Deequ /
  Great-Expectations shape): N predicate rules evaluated in ONE scan
  via conditional aggregation, plus referential-integrity rules that
  need a join, all emitted as (rule, n_violations) rows a CI gate can
  threshold on.
* ``snapshot_diff`` — keyed diff of two lake snapshots (added /
  removed / changed) via one full-outer join on the key comparing
  md5 content hashes — the audit primitive behind "what changed since
  yesterday's publish". The registered demo derives both snapshots
  deterministically from the orders table so the oracle can replay it.

Scale: the rule report is one pass + partial aggregation (a 1-row
shuffle) per table plus one broadcast-able anti join per FK rule; the
snapshot diff is a single co-keyed full-outer join — bucket both
snapshots by the key and it is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

# (rule name, SQL predicate that VALID rows satisfy) — kept as SQL
# strings so the Spark builder and the DuckDB oracle evaluate the
# byte-identical expression.
_ORDER_RULES: list[tuple[str, str]] = [
    ("totalprice_positive", "o_totalprice > 0"),
    ("orderdate_in_range", "o_orderdate >= '1995-01-01' AND o_orderdate < '2002-01-01'"),
    ("status_known", "o_orderstatus IN ('O', 'F', 'P')"),
    ("priority_nonnull", "o_orderpriority IS NOT NULL"),
]


@register(
    "expectations_orders",
    oracle=f"""
    SELECT rule, n_violations FROM (
        SELECT {", ".join(
            f"CAST(SUM(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {name}" for name, pred in _ORDER_RULES
        )}
        FROM orders
    ) UNPIVOT (n_violations FOR rule IN ({", ".join(n for n, _ in _ORDER_RULES)}))
    UNION ALL
    SELECT 'custkey_fk_exists' AS rule, COUNT(*) AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations over orders: four predicate rules in
    one conditional-aggregation scan (never one scan per rule), plus a
    referential-integrity rule (every o_custkey resolves in customer)
    as a broadcast anti join. Returns (rule, n_violations) — a CI gate
    fails the publish when any count exceeds its tolerance."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.agg(
        *[
            F.sum(F.when(~F.expr(pred), 1).otherwise(0)).cast("bigint").alias(name)
            for name, pred in _ORDER_RULES
        ]
    )
    predicate_rows = wide.unpivot(
        ids=[], values=[n for n, _ in _ORDER_RULES],
        variableColumnName="rule", valueColumnName="n_violations",
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    fk_violations = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("custkey_fk_exists").alias("rule"), "n_violations")
    )
    return predicate_rows.unionByName(fk_violations)


def _cell_repr(c: str) -> F.Column:
    """Collision-free rendering of one compared cell: NULL → NUL byte
    (keeps its slot — concat_ws would silently drop it, so a value
    shifting between columns would hash identically), non-NULL →
    length-prefixed string (a prefix code, so a value containing the
    '|' delimiter cannot collide across column boundaries)."""
    s = F.col(c).cast("string")
    return F.when(s.isNull(), F.lit("\x00")).otherwise(
        F.concat(F.length(s).cast("string"), F.lit(":"), s)
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Generic keyed snapshot diff: (key, change_type) for every row
    that was added, removed, or whose compared columns changed, via one
    full-outer join on the key and an md5 content-hash compare. The
    hash input is a null-safe, position-preserving prefix code
    (``_cell_repr``), so (s='a', v=NULL) vs (s=NULL, v='a') and
    delimiter-containing values all hash distinctly."""
    content = F.md5(F.concat_ws("|", *[_cell_repr(c) for c in compare_cols]))
    o = old.select(F.col(key).alias("k"), content.alias("old_hash"))
    n = new.select(F.col(key).alias("k"), content.alias("new_hash"))
    joined = o.join(n, "k", "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.select(F.col("k").alias(key), change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )


def _sql_cell_repr(s: str) -> str:
    """DuckDB twin of ``_cell_repr``: NULL → chr(0), else length-prefixed."""
    return (
        f"CASE WHEN {s} IS NULL THEN chr(0)"
        f" ELSE CAST(length({s}) AS VARCHAR) || ':' || {s} END"
    )


@register(
    "snapshot_diff_orders",
    oracle=f"""
    WITH old AS (
        SELECT o_orderkey AS k,
               md5(concat_ws('|',
                   {_sql_cell_repr("CAST(o_totalprice AS VARCHAR)")},
                   {_sql_cell_repr("o_orderstatus")})) AS h
        FROM orders WHERE o_orderkey % 103 <> 1
    ),
    new AS (
        SELECT o_orderkey AS k,
               md5(concat_ws('|',
                   {_sql_cell_repr('''CAST(CASE WHEN o_orderkey % 97 = 0
                             THEN o_totalprice + 10.0 ELSE o_totalprice END AS VARCHAR)''')},
                   {_sql_cell_repr("o_orderstatus")})) AS h
        FROM orders WHERE o_orderkey % 101 <> 0
    )
    SELECT COALESCE(old.k, new.k) AS o_orderkey,
           CASE WHEN old.k IS NULL THEN 'added'
                WHEN new.k IS NULL THEN 'removed'
                WHEN old.h <> new.h THEN 'changed' END AS change_type
    FROM old FULL OUTER JOIN new ON old.k = new.k
    WHERE CASE WHEN old.k IS NULL THEN 'added'
               WHEN new.k IS NULL THEN 'removed'
               WHEN old.h <> new.h THEN 'changed' END IS NOT NULL
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo of the keyed snapshot diff with deterministically derived
    snapshots (so the oracle replays them): "yesterday" drops keys
    ≡1 (mod 103); "today" drops keys ≡0 (mod 101) and bumps totalprice
    by 10 for keys ≡0 (mod 97). The diff therefore reports exactly the
    mod-103 keys as added, mod-101 keys as removed, and surviving
    mod-97 keys as changed — one full-outer join on the key."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 103 != 1)
    new = o.filter(F.col("o_orderkey") % 101 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 10.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    return snapshot_diff(old, new, "o_orderkey", ["o_totalprice", "o_orderstatus"])
