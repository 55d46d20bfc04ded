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


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the KenLM-shaped fluency signal (documents of
    rare/garbled tokens score very negative; middle-of-the-distribution
    prose scores high). Output: (id_col, n_tokens, avg_logprob), ordered
    upstream by the caller.

    Cross-engine float discipline: the per-document MEAN accumulates
    floats, so each token's ln(cnt/N) is cast to decimal(27,18) before
    the sum (exact, order-independent) and the division back to double
    happens once per document. ln itself is NOT bit-stable across
    engines (Java Math.log vs libm disagree by 1 ulp on ~1e-4 of
    inputs — measured: 143/500 docs differed at the 1e-16 digit), so
    the final mean is rounded to 9 decimals, the same output-rounding
    pattern the cosine operators use.

    Physical shape: one (doc,token) explode → join to the vocabulary-
    sized frequency table on the token key (Zipf-hot keys — AQE skew
    handling applies; the frequency side is vocab-sized and usually
    broadcastable, but carries no forced hint since vocabulary grows
    with corpus scale) → one groupBy on the doc id. The total-token
    count joins as a broadcast 1-row aggregate."""
    term = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token")
    )
    freq = term.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = term.agg(F.count(F.lit(1)).alias("n_total"))
    logp = F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double"))
    return (
        term.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(logp.cast("decimal(27,18)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("avg_logprob"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "avg_logprob")
    )
