"""Invariant tests for corpus-hygiene and lake-gate operators —
properties the DuckDB oracles cannot express (they check equality, not
the semantic contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_weighted_draw_conserves_draw_count(spark):
    """Systematic sampling must place exactly one draw per STEP chars
    of each shard's stream: Σ n_draws per source == number of
    multiples of STEP in [0, shard_total_chars) == ceil(total/STEP).
    This pins the integer-division formula against off-by-one drift
    (the property that caught the floor-vs-truncate divergence)."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.corpus_quality import (
        _DRAW_STEP,
        weighted_systematic_draw,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    got = {
        r["source"]: r["draws"]
        for r in weighted_systematic_draw(spark, SF_SMOKE)
        .groupBy("source")
        .agg(F.sum("n_draws").alias("draws"))
        .collect()
    }
    totals = {
        r["source"]: r["total"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(F.sum("n_chars").alias("total"))
        .collect()
    }
    want = {s: -(-t // _DRAW_STEP) for s, t in totals.items()}  # ceil
    assert got == {s: w for s, w in want.items() if w > 0}


def test_expectations_pass_on_clean_lake(spark):
    """The driver fixture is a clean lake: every rule must report zero
    violations — the condition under which a CI gate allows publish.
    (Rules firing here would mean the rule predicates drifted from the
    fixture contract in FIXTURES.md, not that the lake went bad.)"""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.quality_gates import (
        _ORDER_RULES,
        expectations_orders,
    )

    rows = {r["rule"]: r["n_violations"] for r in expectations_orders(spark, SF_SMOKE).collect()}
    assert set(rows) == {n for n, _ in _ORDER_RULES} | {"custkey_fk_exists"}
    assert all(v == 0 for v in rows.values()), rows


def _write_docs(spark, tmp_path, rows):
    """Minimal documents.parquet a corpus operator can load_table from."""
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_span_scrub_keeps_first_occurrence_and_cuts_the_rest(spark, tmp_path):
    """Lee et al. ExactSubstr semantics on a planted corpus: the
    lexicographically-first occurrence of a duplicated 5-token span
    survives, every other occurrence's tokens are cut in place, docs
    shorter than the span width are untouched, and a doc that IS a
    duplicate span survives as empty text."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        dedup_span_scrub_documents,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b c d e u0 u1 u2"),   # canonical occurrence (doc 0, p=1)
            (1, "v0 v1 a b c d e"),      # duplicate at p=3 -> cut 5 tokens
            (2, "x y z"),                # < 5 tokens: no spans, untouched
            (3, "p q r s t"),            # canonical whole-doc span
            (4, "p q r s t"),            # duplicate whole doc -> scrubbed empty
        ],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dropped_tokens"], r["scrubbed_text"])
        for r in dedup_span_scrub_documents(spark, sf).collect()
    }
    assert got == {
        0: (8, 0, "a b c d e u0 u1 u2"),
        1: (7, 5, "v0 v1"),
        2: (3, 0, "x y z"),
        3: (5, 0, "p q r s t"),
        4: (5, 5, ""),
    }


def test_stupid_backoff_scores_hit_all_three_arms(spark, tmp_path):
    """Each backoff arm on a hand-computable corpus (train = even
    doc_ids 'a b c a b c' and 'z z' -> c3('a b c')=2,
    c2('a b')=c2('b c')=2, c2('c a')=1, c1(a)=c1(b)=c1(c)=c1(z)=2,
    N=8):

    * attested trigram: doc 1 'a b c' -> 2/2 = 1.0
    * attested tail bigram only: doc 7 'c c a' -> 0.4 * c2('c a')/c1(c)
      = 0.4 * 1/2 = 0.2
    * unigram arm, unseen word: doc 3 'a b d' -> 0.16 * 0/8 = 0.0
    * unigram arm, seen word (exercises the N denominator): doc 11
      'd d z' -> 0.16 * c1(z)/N = 0.16 * 2/8 = 0.04 (exact: a /4 of
      the 0.16 double is a power-of-two scaling, and the 12-digit
      decimal cut re-parses to the same double)
    * per-doc average: doc 5 'b c a b' -> ('b c a': 1/2, 'c a b': 1/1)
      -> 0.75
    * <3-token and even (train) docs produce no score rows."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.corpus_quality import (
        lm_stupid_backoff_scores,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b c a b c"),  # train
            (1, "a b c"),
            (2, "z z"),          # train (irrelevant unigrams: z)
            (3, "a b d"),
            (5, "b c a b"),
            (7, "c c a"),
            (9, "a b"),          # scored parity but <3 tokens: no row
            (11, "d d z"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["sb_score"])
        for r in lm_stupid_backoff_scores(spark, sf).collect()
    }
    assert got == {
        1: (1, 1.0),
        3: (1, 0.0),
        5: (2, 0.75),
        7: (1, 0.2),
        11: (1, 0.04),
    }


def test_perplexity_buckets_tertiles_and_tie_break(spark, tmp_path):
    """CCNet head/middle/tail on the LM test corpus plus one score
    tie. Scored docs and sb_scores (see the stupid-backoff test):
    1→1.0, 5→0.75, 7→0.2, 13→0.2 (tie with 7), 11→0.04, 3→0.0.
    Sample saturates (6 docs ≪ target), so cutoffs come from the full
    ranking 1,5,7,13,11,3; s=6 ⇒ boundary ranks (6+2)div3 = 2 and
    (12+2)div3 = 4 ⇒ b1=(0.75, doc 5), b2=(0.2, doc 13). The tie pair
    lands in 'middle' TOGETHER only because the boundary comparison
    breaks the 0.2 tie by doc_id ≤ 13 — the rule under test."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.corpus_quality import (
        lm_perplexity_buckets,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b c a b c"),  # train
            (1, "a b c"),
            (2, "z z"),          # train
            (3, "a b d"),
            (5, "b c a b"),
            (7, "c c a"),
            (11, "d d z"),
            (13, "c c a"),       # same score as doc 7: the tie
        ],
    )
    got = {
        r["doc_id"]: r["ppl_bucket"] for r in lm_perplexity_buckets(spark, sf).collect()
    }
    assert got == {1: "head", 5: "head", 7: "middle", 13: "middle", 11: "tail", 3: "tail"}


def test_dsir_weights_exact_integer_arithmetic(spark, tmp_path):
    """DSIR weights on a hand-computable corpus, checked against the
    exact integer formula (s12 = (ct+1)·(nr+B)·10¹² div
    ((cr+1)·(nt+B)); weight = sum(s12)/n/1e12 in that float op order):

    target doc 0 (src0) 'a b'; raw adds doc 1 (src1) 'a b' and doc 2
    (src1) 'c'. Features per doc: unigrams + the bigram. Counts:
    nt = 3 (a, b, 'a b' once each), nr = 7; doc 2's 'c' is absent
    from the target table (ct = 0 via the left-join coalesce)."""
    import hashlib

    from data_lake_construction_and_querying_with_pyspark_spark.operators.corpus_quality import (
        _DSIR_BUCKET_CHARS,
        _DSIR_BUCKETS,
        dsir_importance_weights,
    )

    # the expectation below assumes the 4 features hash to distinct buckets
    buckets = {
        hashlib.md5(f.encode()).hexdigest()[:_DSIR_BUCKET_CHARS]
        for f in ("dsir1:a", "dsir1:b", "dsir1:c", "dsir2:a b")
    }
    assert len(buckets) == 4

    df = spark.createDataFrame(
        [
            (0, "a b", "en", "src0", 3),
            (1, "a b", "en", "src1", 3),
            (2, "c", "en", "src1", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    B, nt, nr = _DSIR_BUCKETS, 3, 7

    def s12(ct, cr):
        return ((ct + 1) * (nr + B) * 10**12) // ((cr + 1) * (nt + B))

    # docs 0 and 1 share all three features (ct=1, cr=2 each)
    w01 = float(3 * s12(1, 2)) / 3 / 1e12
    w2 = float(s12(0, 1)) / 1 / 1e12
    got = {
        r["doc_id"]: (r["n_features"], r["dsir_weight"])
        for r in dsir_importance_weights(spark, str(tmp_path)).collect()
    }
    assert got == {0: (3, w01), 1: (3, w01), 2: (1, w2)}
    # the target-matching docs outweigh the out-of-target doc
    assert w01 > w2


def test_span_scrub_waves_equal_single_pass(spark, tmp_path):
    """The span_batches wave knob (scratch bound, docs/SCALING.md r9
    ENOSPC finding) must be EXACTLY single-pass: the xxhash64 wave
    hash partitions SPANS, so each posting list ranks inside one wave
    and the union of per-wave drop sets is the single-pass drop set.
    Full 4-column frame equality on a corpus with within-doc repeats,
    cross-doc boilerplate, and overlapping spans."""
    from data_lake_construction_and_querying_with_pyspark_spark.operators.dedup import (
        span_scrub_documents,
    )

    boiler = "the quick brown fox jumps"
    rows = [
        (0, f"{boiler} alpha beta gamma delta {boiler}"),       # self-repeat
        (1, f"{boiler} one two three four five six"),           # cross-doc
        (2, "one two three four five six seven eight nine"),    # overlap chain
        (3, "unique tokens only here nothing repeats at all"),
        (4, "two three four five six seven"),                    # subspan of 2
        (5, "tiny"),                                             # <K tokens
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def snap(out):
        return {
            r["doc_id"]: (r["n_tokens"], r["n_dropped_tokens"], r["scrubbed_text"])
            for r in out.collect()
        }

    single = snap(span_scrub_documents(spark, df))
    waved = snap(
        span_scrub_documents(
            spark, df, span_batches=3, scratch_dir=str(tmp_path / "waves")
        )
    )
    assert waved == single and len(single) == len(rows)
    # sanity: the knob ran on a corpus where scrubbing actually happens
    assert any(d > 0 for (_, d, _) in single.values())


def test_temperature_draw_upsamples_small_sources(spark, tmp_path):
    """T=2 temperature mixing must allocate by sqrt(char mass): a
    source holding 0.5% of the characters gets ~4.6% of the budget —
    strictly more than its proportional share (which floors to 0 here)
    — while within-source draws stay contiguous md5-rank prefixes."""
    import math

    from data_lake_construction_and_querying_with_pyspark_spark.operators.corpus_quality import (
        _TMIX_BUDGET,
        source_mix_temperature_draw,
    )

    rows = [(i, "x" * 10, "en", "srcS", 10) for i in range(30)] + [
        (100 + i, "y" * 2000, "en", "srcB", 2000) for i in range(30)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    sq = {"srcS": math.isqrt(300), "srcB": math.isqrt(60000)}
    sqsum = sum(sq.values())
    want_quota = {s: _TMIX_BUDGET * v // sqsum for s, v in sq.items()}
    assert want_quota["srcS"] > _TMIX_BUDGET * 300 // 60300  # flattening beats proportional
    out = source_mix_temperature_draw(spark, str(tmp_path)).collect()
    got_quota = {r["source"]: r["tmix_quota"] for r in out}
    assert got_quota == want_quota
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["tmix_rank"])
    # drawn count = min(quota, available); ranks are a contiguous 1..k prefix
    for s, ranks in by_src.items():
        k = min(want_quota[s], 30)
        assert sorted(ranks) == list(range(1, k + 1))


def test_dsir_resample_replays_the_systematic_formula(spark):
    """Full replay pin: recompute the draw in pure Python — integer w6
    off `_dsir_doc_integer_scores`' exact sums, the md5 shard order,
    the shifted-endpoint draw-count formula — and require the operator
    to emit exactly the same (doc_id → n_draws) map, zero-draw and
    zero-weight docs excluded. Pins window order, prefix arithmetic,
    and the w6 downscale in one shot, plus conservation (Σ draws per
    shard == ceil(shard mass / STEP))."""
    import hashlib

    from data_lake_construction_and_querying_with_pyspark_spark.operators.corpus_quality import (
        _DSIR_DRAW_STEP,
        _DSIR_W6_DOWNSCALE,
        _dsir_doc_integer_scores,
        dsir_resample_draw,
    )
    from data_lake_construction_and_querying_with_pyspark_spark.sources.readers import load_table

    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "source").collect()
    }
    shards: dict = {}
    for r in _dsir_doc_integer_scores(spark, SF_SMOKE).collect():
        w6 = r["s12_sum"] // r["n_features"] // _DSIR_W6_DOWNSCALE
        if w6 > 0:
            shards.setdefault(src[r["doc_id"]], []).append((r["doc_id"], w6))
    want: dict = {}
    mass: dict = {}
    for s, docs in shards.items():
        docs.sort(key=lambda t: (hashlib.md5(f"dsirdraw:{t[0]}".encode()).hexdigest(), t[0]))
        prefix = 0
        for doc_id, w6 in docs:
            n = (prefix + w6 - 1 + _DSIR_DRAW_STEP) // _DSIR_DRAW_STEP - (
                prefix - 1 + _DSIR_DRAW_STEP
            ) // _DSIR_DRAW_STEP
            if n > 0:
                want[doc_id] = n
            prefix += w6
        mass[s] = prefix
    got = {r["doc_id"]: r["n_draws"] for r in dsir_resample_draw(spark, SF_SMOKE).collect()}
    assert got == want
    per_shard = {s: sum(want.get(d, 0) for d, _ in docs) for s, docs in shards.items()}
    assert per_shard == {s: -(-m // _DSIR_DRAW_STEP) for s, m in mass.items() if m > 0}
