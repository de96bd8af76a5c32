"""Distributed BPE tokenizer training vs a pure-Python reference
implementation of Sennrich et al.'s algorithm, plus the cross-engine
string-semantics pins the operator's correctness rests on.

(The sf0.001 DuckDB-oracle comparison for both registered queries runs
in tests/test_queries_oracle.py like every other entry; these tests pin
the ALGORITHM against an independent third implementation.)
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_lake_construction_and_querying_with_pyspark_spark.operators.tokenizer import (
    N_MERGES,
    bpe_learn_merges,
    bpe_token_counts,
)
from tests.conftest import SF_SMOKE


def _reference_bpe(words: Counter, k: int):
    """Classic driver-side BPE (Sennrich et al. 2016): symbol tuples,
    leftmost-first merge application, (count desc, pair asc) tiebreak."""
    seqs = {w: tuple(w) for w in words}
    merges = []
    for step in range(1, k + 1):
        counts: Counter = Counter()
        for w, freq in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (lft, rgt), cnt = best
        merges.append((step, lft, rgt, lft + rgt, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lft and s[i + 1] == rgt:
                    out.append(lft + rgt)
                    i += 2  # leftmost-first, non-overlapping
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


@pytest.fixture(scope="module")
def corpus_words():
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["text"])
    words: Counter = Counter()
    for text in tbl.column("text").to_pylist():
        words.update(t for t in text.split(" ") if t)
    return words


def test_merges_match_reference_bpe(spark, corpus_words):
    expected, _ = _reference_bpe(corpus_words, N_MERGES)
    got = [
        (r["step"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
        for r in bpe_learn_merges(spark, SF_SMOKE).orderBy("step").collect()
    ]
    assert got == expected


def test_token_counts_match_reference_bpe(spark, corpus_words):
    _, seqs = _reference_bpe(corpus_words, N_MERGES)
    expected: Counter = Counter()
    for w, freq in corpus_words.items():
        for sym in seqs[w]:
            expected[sym] += freq
    got = {
        r["token"]: (r["token_len"], r["n_occurrences"])
        for r in bpe_token_counts(spark, SF_SMOKE).collect()
    }
    assert got == {t: (len(t), n) for t, n in expected.items()}


def test_encode_matches_reference_bpe(spark, corpus_words):
    """Per-document subword counts from the doc-level k-replace encode
    must equal tokenizing each document word-by-word through the
    reference implementation's final word→symbols map."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.tokenizer import (
        bpe_encode_documents,
    )

    _, seqs = _reference_bpe(corpus_words, N_MERGES)
    tbl = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    expected = {}
    for doc_id, text in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        words = [t for t in text.split(" ") if t]
        expected[doc_id] = (sum(len(seqs[w]) for w in words), len(words))
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in bpe_encode_documents(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_replace_semantics_on_overlapping_runs(spark):
    """The merge-application step IS literal leftmost non-overlapping
    string replace. aaaa + merge (a,a) must become (aa)(aa) — classic
    BPE left-to-right order — in Spark, DuckDB, and the reference
    implementation alike; a drift here would silently corrupt every
    later merge step."""
    seq = "<a><a><a><a><b><a><a>"
    spark_out = (
        spark.range(1)
        .select(F.replace(F.lit(seq), F.lit("<a><a>"), F.lit("<aa>")).alias("s"))
        .collect()[0]["s"]
    )
    duck_out = duckdb.sql(
        "SELECT replace('<a><a><a><a><b><a><a>', '<a><a>', '<aa>')"
    ).fetchone()[0]
    _, seqs = _reference_bpe(Counter({"aaaabaa": 1}), 1)
    ref = "".join(f"<{s}>" for s in seqs["aaaabaa"])
    assert spark_out == duck_out == ref == "<aa><aa><b><aa>"


import hypothesis.strategies as st

_words_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=20
)


def test_learn_merges_matches_reference_on_random_corpora(spark):
    """Property: for ANY small word multiset — single-char words (no
    pairs), repeated-letter runs (overlap order), heavy count ties —
    the distributed loop picks exactly the reference implementation's
    merges. Ties and degenerate shapes are where the cross-engine
    string semantics would first crack."""
    from hypothesis import HealthCheck, given, settings

    from data_lake_construction_and_querying_with_pyspark_spark.operators.tokenizer import (
        learn_merges,
    )

    @given(words=_words_strategy)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(words):
        counts = Counter(words)
        expected, _ = _reference_bpe(counts, 3)
        wdf = spark.createDataFrame(
            [(freq, "".join(f"<{c}>" for c in w)) for w, freq in sorted(counts.items())],
            "freq long, seq string",
        )
        merges, _ = learn_merges(wdf, 3)
        got = [(m["step"], m["lft"], m["rgt"], m["merged"], m["pair_count"]) for m in merges]
        assert got == expected, (words, got, expected)

    check()


def test_iterations_run_on_vocabulary_not_corpus(spark, corpus_words):
    """The 100 TB contract: after the one word-frequency shuffle, every
    merge iteration's pair scan reads the distinct-word table (31 rows
    here), never the corpus. Pin it by pointing the SAME learned
    pipeline at a word-frequency table built purely from the vocabulary
    multiset — identical merges prove nothing corpus-sized leaks into
    the iteration stages beyond word frequencies."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.tokenizer import (
        _pair_counts,
    )

    vocab_df = spark.createDataFrame(
        [
            (freq, "".join(f"<{c}>" for c in w))
            for w, freq in sorted(corpus_words.items())
        ],
        "freq long, seq string",
    )
    got = {
        (r["lft"], r["rgt"]): r["cnt"] for r in _pair_counts(vocab_df).collect()
    }
    counts: Counter = Counter()
    for w, freq in corpus_words.items():
        for i in range(len(w) - 1):
            counts[(w[i], w[i + 1])] += freq
    assert got == dict(counts)
