#!/usr/bin/env python
"""Tokenizer-training demo — the round-12 BPE loop composed end to end
from its oracle-verified parts:

    train    — `ngrams.bpe_train` iterates recount→pick→merge on the
               FOLDED vocabulary (x168: the merge table, hash-verified
               against DuckDB's unrolled-CTE mirror) ->
    tokenize — `ngrams.bpe_tokenize` applies the merges vocab-side and
               reads back the top words' token streams (x171) ->
    decide   — `ngrams.bpe_fertility` scores every source by tokens
               per word UNDER THE TRAINED TOKENIZER (x172): the
               mixture-design signal for which sources cost more
               sequence length per byte.

The scale discipline on display: the corpus folds ONCE to the
(word, count) vocabulary; every merge iteration and the apply are
vocab-bounded; nothing corpus-sized runs per merge.

Run:  python examples/bpe_tokenizer_demo.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_fish_spark.catalog import table  # noqa: E402
from go_fish_spark.operators import ngrams  # noqa: E402
from go_fish_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="bpe-tokenizer-demo")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = table(spark, sf_dir, "documents")
        merges = ngrams.bpe_train(docs, "text", n_merges=6).collect()
        print("train: merge table =",
              [(r.merge_idx, r.lhs + "+" + r.rhs, r.n_occurrences)
               for r in merges])
        toks = ngrams.bpe_tokenize(docs, "text", n_merges=6, top_k=5)
        print("tokenize: top words ->",
              [(r.word, r.tokens, r.n_tokens) for r in toks.collect()])
        fert = ngrams.bpe_fertility(docs, "source", "text", n_merges=6)
        rows = fert.collect()
        worst = max(rows, key=lambda r: r.fertility)
        best = min(rows, key=lambda r: r.fertility)
        print(f"decide: {len(rows)} sources; fertility "
              f"best={best.source} {best.fertility} "
              f"worst={worst.source} {worst.fertility}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
