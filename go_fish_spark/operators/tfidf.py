"""TF-IDF term weighting over a document corpus.

North-star text-analysis extension (the reference has no text operators;
closest surface: ad-hoc Go string work in rules, SURVEY §2.6). Classic
training-data use: per-document salient terms for clustering, keyword
filters, and near-dup triage.

Scale shape (the expensive part is the explode, everything after runs on
collapsed rows):
  1. explode tokens → partial-aggregated count per (doc, token): the only
     row-multiplying step, collapsed map-side before ONE shuffle on the
     (doc, token) pair key;
  2. document frequency: distinct (doc, token) → groupBy(token) — shuffle
     on token, output is vocabulary-sized;
  3. N (corpus size) joins in via a broadcast single-row aggregate (no
     driver-side action — the whole plan stays lazy);
  4. df joins back on token (vocabulary-sized side — AQE broadcasts it
     when it fits);
  5. optional per-doc top-k via window row_number (partial
     WindowGroupLimit below the exchange, same plan shape as x06).

Determinism for the oracle: tf/df are exact longs; idf = ln((N+1)/(df+1))
+ 1 evaluates identically on both engines for the same doubles; tfidf
multiplies per-row values — no order-sensitive float accumulation
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """(id, token, tf, df, idf, tfidf[, rank]) per document term.

    ``tf`` = occurrences of token in doc; ``df`` = documents containing
    token; ``idf`` = ln((N+1)/(df+1)) + 1 (smoothed); ``tfidf`` = tf·idf.
    With ``top_k``, keeps the k highest-tfidf terms per document
    (deterministic tie-break on token)."""
    term = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(text_col, " ")).alias("token"),
    )
    tf = term.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        term.dropDuplicates(["id", "token"])
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0,
        )
        .withColumn("tfidf", F.col("tf").cast("double") * F.col("idf"))
        .select("id", "token", "tf", "df", "idf", "tfidf")
    )
    if top_k is None:
        return scored
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
