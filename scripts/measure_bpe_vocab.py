"""BPE learn-loop cost vs vocabulary size and merge count.

The scaling claim in ``operators/tokenizer.py`` is that after the one
corpus-sized word-frequency shuffle, every merge iteration costs
VOCABULARY, not corpus: pair extraction and the argmax aggregate run on
the distinct-word table. The scale_probe rungs measured that at
|V| = 2 001; this script measures the |V| term directly by holding the
corpus fixed (100k docs × 120 tokens) and sweeping:

* vocabulary 2 000 vs 100 000 distinct words (a realistic web-corpus
  word table is O(10⁵–10⁷) — Zipf-bounded, far below corpus size), and
* k = 6 vs k = 32 merges, so per-iteration cost falls out as
  (t(k=32) − t(k=6)) / 26 with the shared word-frequency prefix and
  first-6-merge cost differenced away.

Emits one JSON line per (vocab, k) cell:
    {"vocab": V, "k": k, "n_docs": n, "seconds": s, "n_words": w,
     "first_merge": [lft, rgt, count]}

Usage: python scripts/measure_bpe_vocab.py [n_docs] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.scale_probe as scale_probe  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bpe_vocab_probe"

    from data_lake_construction_and_querying_with_pyspark_spark import get_spark
    from data_lake_construction_and_querying_with_pyspark_spark.operators.tokenizer import (
        _word_freq,
        learn_merges,
    )

    spark = get_spark(app_name="measure_bpe_vocab")

    for vocab in (2_000, 100_000):
        vdir = f"{out}/v{vocab}"
        docs_path = f"{vdir}/documents.parquet"
        if not os.path.exists(docs_path):
            # build_documents reads the vocabulary size from the module
            # global (every token is vocab[pmod(hash(seed, i), V)]);
            # point it at this sweep's V for the build, then restore.
            saved = scale_probe._VOCAB_SIZE
            scale_probe._VOCAB_SIZE = vocab
            try:
                scale_probe.build_documents(spark, n_docs).write.mode(
                    "overwrite"
                ).parquet(docs_path)
            finally:
                scale_probe._VOCAB_SIZE = saved

        # warm page cache + codegen once per corpus
        spark.read.parquet(docs_path).write.mode("overwrite").format("noop").save()

        for k in (6, 32):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(0.3)
            t0 = time.time()
            words = _word_freq(spark, vdir)
            merges, final = learn_merges(words, k)
            # drain the final word table so the last replace projection
            # is executed, not just planned (same noop-sink discipline
            # as scale_probe.run)
            final.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            n_words = final.count()
            m0 = merges[0]
            print(
                json.dumps(
                    {
                        "vocab": vocab,
                        "k": k,
                        "n_docs": n_docs,
                        "seconds": round(dt, 2),
                        "n_merges_learned": len(merges),
                        "n_words": n_words,
                        "first_merge": [m0["lft"], m0["rgt"], m0["pair_count"]],
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
