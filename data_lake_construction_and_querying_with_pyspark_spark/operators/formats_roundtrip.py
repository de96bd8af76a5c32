"""Format-fidelity roundtrip queries: JSON-Lines and ORC.

The reference's lake speaks CSV and Parquet through one format-dispatch
switch (reference
``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:59-66``,
SURVEY.md §2.1 S1-S3); LLM corpora overwhelmingly arrive as JSONL, and
ORC is the other columnar format a lake ingests, so the engine carries
both — and PROVES value fidelity by registering each roundtrip as an
oracle-checked query: write the fixture table out in the format, read
it back with the original schema, and let the driver hash the result
against DuckDB reading the untouched parquet. Any encode/decode loss
(type coercion, float rendering, string escaping, null handling) shows
up as a value-hash mismatch.

Scale: a format conversion is a map-only job — no shuffle at any size;
writer parallelism equals scan parallelism. JSON doubles survive
because Spark's Jackson writer emits the shortest round-trip decimal
rendering and the reader parses it back to the identical bits.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

_SCRATCH_ROOT: str | None = None


def _scratch(name: str, sf_dir: str) -> str:
    """Scratch path qualified by scale factor AND process: the write is
    eager while the returned DataFrame reads lazily, so an unqualified
    shared path would let a second scale factor (or a concurrent
    session) overwrite the files a still-unconsumed DataFrame points
    at — silently feeding the wrong rows to the oracle comparison.

    The pid-qualified root is removed at interpreter exit (atexit, not
    per-call: the returned DataFrame reads the files lazily, possibly
    long after the builder returns) so repeated bench/test/driver runs
    don't accrete full table copies under the system tempdir."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = os.path.join(
            tempfile.gettempdir(), "spark_graft_roundtrip", str(os.getpid())
        )
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_SCRATCH_ROOT, sf_tag, name)


@register(
    "jsonl_roundtrip_documents",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def jsonl_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL on disk → read back with the source schema.

    The oracle is the UNTOUCHED parquet table: equality means the JSONL
    encode/decode chain is lossless for every column (unicode text with
    spaces, ints, strings). The read supplies the original schema
    explicitly — production JSONL ingestion never schema-infers (an
    inference pass is a second full scan, and sampled inference can
    mis-type sparse columns)."""
    docs = load_table(spark, sf_dir, "documents")
    path = _scratch("documents_jsonl", sf_dir)
    docs.write.mode("overwrite").json(path)
    return (
        spark.read.schema(docs.schema)
        .json(path)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@register(
    "orc_roundtrip_customer",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def orc_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → ORC (zlib) → read back; oracle is the untouched
    parquet. ORC is columnar like parquet, so doubles/ints roundtrip
    bit-exactly by construction — the check pins the dispatch plumbing
    and schema preservation, and anchors the format switch the
    reference drives via its job argument (SURVEY.md §2.1 S3)."""
    cust = load_table(spark, sf_dir, "customer")
    path = _scratch("customer_orc", sf_dir)
    cust.write.mode("overwrite").orc(path)
    return spark.read.schema(cust.schema).orc(path).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
