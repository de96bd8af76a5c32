"""Dataset split & shuffle — the last-mile mechanics of a training-data
pipeline (extension surface; the reference stops at querying, SURVEY.md
§2.7).

Both operators are *deterministic functions of the data*, never of
Spark's physical execution: re-running on a re-partitioned, re-ordered,
or incrementally-grown lake yields the same split for every existing
document. That is the property that makes train/test contamination
auditable — a doc can never silently migrate between splits because an
executor count changed.

Cross-engine portability trick shared by both: md5 hex strings compare
lexicographically exactly as their numeric value (fixed-width lowercase
hex), so thresholds and orderings over ``md5(...)`` substrings are
bit-identical in Spark and DuckDB without any hex→int conversion
(neither engine's hex-parse builtins agree, but their md5 and string
comparison do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

_SPLIT_SEED = 42


def split_key(id_col: F.Column, seed: int = _SPLIT_SEED) -> F.Column:
    """Two-hex-digit bucket in [0x00, 0xff] as a *string*: uniform,
    deterministic, salted by seed so a re-split under a new seed is
    independent of the old one."""
    return F.substring(F.md5(F.concat(F.lit(f"split:{seed}:"), id_col.cast("string"))), 1, 2)


def assign_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    seed: int = _SPLIT_SEED,
) -> DataFrame:
    """Adds a ``split`` column ∈ {train, val, test} by hashed-id
    threshold. Fractions are quantized to 1/256 (two hex digits) —
    ample for corpus splits; the comparison stays in string space so
    any SQL engine replays it exactly."""
    t_hi = format(int(round(train * 256)), "02x")
    v_hi = format(int(round((train + val) * 256)), "02x")
    h = split_key(F.col(id_col), seed)
    return df.withColumn(
        "split",
        F.when(h < t_hi, "train").when(h < v_hi, "val").otherwise("test"),
    )


@register(
    "train_val_test_split",
    oracle=f"""
    SELECT doc_id, source,
           CASE WHEN substr(md5('split:{_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train'
                WHEN substr(md5('split:{_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 80/10/10 split assignment (thresholds 0xcd/0xe6 ≈
    80.1%/10.2%/9.8%). Pure projection — no shuffle, no RNG state; the
    split column is computable at scan time on every executor
    independently, which is exactly what a 100 TB split needs (a
    ``randomSplit`` would be partitioning-dependent and
    non-reproducible across runs)."""
    docs = load_table(spark, sf_dir, "documents")
    return assign_split(docs, "doc_id").select("doc_id", "source", "split")


@register(
    "deterministic_shuffle",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY md5('shuffle:42:' || CAST(doc_id AS VARCHAR)),
                              doc_id) AS pos
    FROM documents
    """,
)
def deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle order for training-example serving:
    ``pos`` is the document's 1-based rank under ``md5(seed || id)``
    ordering — a reproducible permutation independent of physical
    layout.

    Scale shape: a single ``row_number() OVER (ORDER BY …)`` would
    funnel the corpus through ONE partition. Instead the rank is
    assembled in two phases — (1) a 256-row bucket-count aggregate
    (bucket = first hex byte of the key) turned into cumulative
    offsets by a window over those 256 rows, (2) per-bucket
    ``row_number`` partitioned BY bucket (fully parallel) plus the
    bucket's broadcast offset. Because the bucket is a prefix of the
    sort key, bucket-major order IS global key order, so the result
    equals the oracle's global ROW_NUMBER at any parallelism. Same
    two-phase trick zipWithIndex uses, expressed relationally."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuffle:42:"), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", key.alias("k"), F.substring(key, 1, 2).alias("bucket"))
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    # Constant partition key on the 256-row offsets window: driver-
    # bounded frame, but unpartitioned windows log `WindowExec: No
    # Partition Defined` — silence the benign case so genuine
    # single-partition regressions stand out. Numbering-identical.
    # (Must be NON-FOLDABLE: Spark 4's EliminateWindowPartitions strips
    # a literal key back out and the warning returns; an empty
    # substring of a real column is constant-valued but survives.)
    offsets = counts.select(
        "bucket",
        (
            F.sum("n").over(
                Window.partitionBy(F.substring(F.col("bucket"), 1, 0))
                .orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("off"),
    ).fillna({"off": 0})
    rn = F.row_number().over(Window.partitionBy("bucket").orderBy("k", "doc_id"))
    return (
        keyed.withColumn("rn", rn)
        .join(F.broadcast(offsets), "bucket")
        .select("doc_id", (F.col("off") + F.col("rn")).alias("pos"))
    )
