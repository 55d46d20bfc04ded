"""Corpus n-gram statistics — the vocabulary-analysis pass a training-data
pipeline runs before tokenizer training or quality filtering (which
n-grams dominate, how widespread each is).

Reference anchor: the reference has no corpus-statistics operator (gap
category, SURVEY.md §2.6); the op follows the same Column-expression
discipline as functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` word ``n``-grams by corpus frequency.

    Output: (ngram, term_freq, doc_freq) — total occurrences (repeats
    count) and number of distinct documents containing the n-gram,
    ordered by term_freq desc with the n-gram string as tie-break.

    Physical shape: n-grams are built array-side per row (transform over
    an index sequence — linear per row, no shuffle), exploded, then ONE
    shuffle on the n-gram key with map-side partial aggregation — hot
    n-grams combine before the exchange, so skew in natural language
    frequency (Zipf) hits the network as one partial row per partition,
    not one row per occurrence. The final top-k is a TakeOrdered over the
    aggregated (vocab-sized, not corpus-sized) frame.
    """
    w = tokens(text_col)
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count("*").alias("term_freq"),
            F.count_distinct("_id").alias("doc_freq"),
        )
        .orderBy(F.col("term_freq").desc(), F.col("ngram"))
        .limit(top_k)
    )
