"""Lexical retrieval over the document corpus: BM25 top-k and TF-IDF
characteristic-term extraction.

The reference exposes retrieval only as arbitrary SQL pass-through
(reference ``scripts/aws-hackathon-glue-data-lake-querying-pyspark.py:113``,
SURVEY.md §2.5 Q1); these operators pin the two canonical
inverted-index shapes a training-data pipeline runs on top of that
capability — corpus-level keyword relevance ranking (dataset curation
"find me docs about X", eval-set mining) and per-document keyword
profiles (topic tagging for source-mix reports).

Determinism contract (what keeps Spark and DuckDB hash-identical):

* The BM25 idf uses the **odds form** ``(N - df + 0.5) / (df + 0.5)``
  rather than the usual ``ln`` of it. Both rank identically (ln is
  monotone), but the odds form is a single correctly-rounded IEEE
  division — engines agree bit-for-bit — while ``ln``/``log`` are
  libm calls with no cross-engine ulp guarantee.
* Every intermediate is either exact integer arithmetic or a fixed
  chain of individually-rounded double ops written in the SAME shape
  in the Spark builder and the SQL oracle (no re-association).
* Per-term contributions are cast to DECIMAL(38,12) BEFORE the
  per-document SUM, so partial-aggregation order cannot move the
  score; the 12-digit cut sits far above double's ~1e-16 relative
  noise (same contract as ``unigram_rarity_scores``). The 26 integer
  digits matter: the odds idf grows ~N/df, so a rare term in a
  ~4.5e7-doc corpus overflows a (20,12)'s 8 integer digits — Spark
  (non-ANSI) would NULL the contribution and SUM would silently drop
  it while DuckDB errors. (38,12) holds to ~1e26 docs.
* Top-k orderings carry ``doc_id`` (or ``term``) as the unique
  tiebreak.

Scale shape (100 TB): the corpus side is exploded once into an
inverted index; the query-term list is tiny and broadcast, so the
posting-list probe is a map-side semi-join — the corpus never shuffles
on content. Document frequency and length statistics are
vocabulary-/doc-keyed aggregates that AQE keeps partial/map-side. The
final top-k is ``TakeOrderedAndProject`` (per-partition heap + driver
merge of k rows), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.operators.text import _toks
from data_lake_construction_and_querying_with_pyspark_spark.registry import register
from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

# Fixed demo query — terms chosen from the fixture vocabulary with
# distinct document frequencies so the idf weighting is exercised.
_QUERY_TERMS = ("spark", "merge", "window")
_K1 = 1.2  # BM25 term-frequency saturation
_TOPK = 20

_ORACLE_TOKS = """
    toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents
    )"""


@register(
    "bm25_topk_documents",
    oracle=f"""
    WITH {_ORACLE_TOKS},
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
    qterms(term) AS (VALUES {", ".join(f"('{t}')" for t in _QUERY_TERMS)}),
    tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
           FROM toks JOIN qterms ON tok = term
           GROUP BY doc_id, tok),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               -- k1-derived literals are CAST to DOUBLE: DuckDB types a
               -- bare 2.2 as DECIMAL(2,1), making tf * 2.2 EXACT decimal
               -- arithmetic — a different value than Spark's double
               -- multiply (verified: CAST(3*2.2 AS DOUBLE) <> 3.0*2.2e0).
               -- The binary-exact literals (0.5, 0.25, 0.75) and every
               -- `/` (always DOUBLE in DuckDB) need no cast.
               CAST(((n_docs - df + 0.5) / (df + 0.5))
                    * ((tf * CAST({_K1 + 1.0} AS DOUBLE)) /
                       (tf + CAST({_K1} AS DOUBLE)
                             * (0.25 + 0.75 * (dl / avgdl))))
                    AS DECIMAL(38,12)) AS contrib
        FROM tf JOIN dl ON tf.doc_id = dl.doc_id
                JOIN dft USING (term), nd, avgdl
    )
    SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS bm25_score
    FROM scored GROUP BY doc_id
    ORDER BY bm25_score DESC, doc_id
    LIMIT {_TOPK}
    """,
)
def bm25_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) relevance top-20 for a fixed keyword
    query, odds-form idf (see module docstring for why not ``ln``).

    Plan: one explode → inverted index; broadcast 3-row term table
    semi-joins the postings (corpus never shuffles on content); doc
    lengths and df are small keyed aggregates; final top-k is
    TakeOrderedAndProject, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_toks()).alias("tok"))

    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    qterms = spark.createDataFrame([(t,) for t in _QUERY_TERMS], "term string")

    tf = (
        toks.join(F.broadcast(qterms), toks["tok"] == qterms["term"])
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_norm = (F.col("tf") * F.lit(_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_K1) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(avgdl))
        .select("doc_id", (idf * tf_norm).cast("decimal(38,12)").alias("contrib"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("contrib").cast("double").alias("bm25_score"))
        .orderBy(F.desc("bm25_score"), F.asc("doc_id"))
        .limit(_TOPK)
    )


@register(
    "tfidf_top_terms_per_doc",
    oracle=f"""
    WITH {_ORACLE_TOKS},
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    weighted AS (
        SELECT doc_id, tok,
               CAST(tf * n_docs AS DOUBLE) / df AS tfidf_weight
        FROM tf JOIN dft USING (tok), nd
    )
    SELECT doc_id, tok, tfidf_weight, term_rank
    FROM (SELECT doc_id, tok, tfidf_weight,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf_weight DESC, tok) AS INT)
                     AS term_rank
          FROM weighted)
    WHERE term_rank <= 3
    """,
)
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by rational TF-IDF
    ``tf * N / df`` (exact integer product, one IEEE division — no
    ``ln``, same cross-engine-exactness rationale as BM25's odds idf).

    Plan: inverted index → per-(doc,term) tf → vocabulary-sized df
    aggregate broadcast back onto the postings → window ranked WITHIN
    doc_id partitions (no global sort; the window key is the natural
    partitioning so no second shuffle after the tf aggregate)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_toks()).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    weighted = (
        tf.join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "tfidf_weight"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_weight"), F.asc("tok"))
    return (
        weighted.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "tok", "tfidf_weight", "term_rank")
    )
