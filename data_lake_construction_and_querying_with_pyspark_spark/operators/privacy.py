"""Privacy / anonymization operators.

The training-data pipelines this engine targets scrub or pseudonymize
personal data before a corpus ships. The reference has no such step
(its Glue job moves raw CSV to parquet unchanged — SURVEY.md §2.4);
this module adds the standard toolkit as pure JVM-side expressions:

* pattern-based masking (``regexp_replace`` — regexes avoid
  lookarounds so Java regex (Spark) and RE2 (DuckDB) agree),
* deterministic pseudonymization (keyed md5 — referentially stable:
  the same identity maps to the same pseudonym across tables and
  runs, so joins survive anonymization),
* irreversible equality tokens (sha-256 truncation — same value ⇒
  same token, but not invertible),
* quasi-identifier generalization (k-anonymity-style value bucketing).

Runs on the ``customer`` table, whose ``c_name`` carries a 9-digit
identity suffix, so the masks demonstrably fire (an operator verified
only on text it never matches proves nothing).

Scale: one map-side projection — no shuffle, no UDF, embarrassingly
parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

# The identity shape in c_name: "Customer#000000001".
_ID_SHAPE = "^Customer#[0-9]{9}$"


@register(
    "pii_anonymize_customers",
    oracle=f"""
    SELECT c_custkey,
           md5('pseudo:' || c_name) AS name_pseudonym,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           substr(sha256(c_name), 1, 16) AS identity_token,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_bucket,
           c_mktsegment,
           CASE WHEN regexp_matches(c_name, '{_ID_SHAPE}') THEN 1 ELSE 0 END
               AS id_shape_ok
    FROM customer
    """,
)
def pii_anonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anonymize the customer table for downstream analytics:

    * ``name_pseudonym`` — keyed md5 of the identity: deterministic,
      so re-runs and cross-table joins still line up, but the raw
      name never leaves the projection.
    * ``name_masked`` — every digit replaced by ``#`` (display-safe
      rendering; Spark's regexp_replace is replace-all, so the oracle
      passes RE2's explicit ``'g'`` flag to match).
    * ``identity_token`` — 16-hex-char sha-256 prefix: an equality
      token (same identity ⇒ same token) that cannot be inverted.
    * ``acctbal_bucket`` — balance generalized to $1000 bands, the
      k-anonymity move that keeps the column analytically useful
      while dropping the identifying exact value.
    * ``id_shape_ok`` — audit bit: 1 iff the name matched the
      expected identity shape (a scrub that silently misses malformed
      rows is a compliance bug, so the miss-rate must be queryable).
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.concat(F.lit("pseudo:"), F.col("c_name"))).alias("name_pseudonym"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
        F.substring(F.sha2(F.col("c_name"), 256), 1, 16).alias("identity_token"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("bigint").alias("acctbal_bucket"),
        "c_mktsegment",
        F.when(F.col("c_name").rlike(_ID_SHAPE), 1).otherwise(0).alias("id_shape_ok"),
    )
