"""Data Selection via Importance Resampling (DSIR) — hashed n-gram
importance weights (Xie et al. 2023, arXiv:2302.03169): score every raw
document by how much it resembles a TARGET corpus (the "looks like
Wikipedia" selection move), using bag-of-hashed-ngram bucket distributions
instead of a learned model.

Reference anchor: the reference has no data-selection operator (gap
category, SURVEY.md §2.6); this extends the curation family alongside
sampling.weighted_sample (which consumes these weights as acceptance
probabilities).

Engine-invariance discipline: the feature hash is the md5 bucket
(sampling.hash_bucket — bit-identical in Spark and DuckDB), the bucket
log-ratios accumulate as decimal(27,18) (exact, order-independent — the
unigram_logprob recipe), and the final per-doc mean rounds to 9 decimals
(ln differs by 1 ulp across libms on ~1e-4 of inputs; the rounding hides
it, measured in x34).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .sampling import duck_hash_bucket, hash_bucket


def _bucket_log_ratios(
    raw_counts: DataFrame,
    t_counts: DataFrame,
    n_buckets: int,
    alpha: float,
) -> DataFrame:
    """The ONE place the smoothing lives (the DuckDB mirror in
    :func:`duck_dsir_sql` is its SQL transliteration): per bucket,
    ``log(p̂_target) − log(p̂_raw)`` with add-alpha smoothing. Buckets
    absent from the target corpus still need their smoothed log-prob:
    outer-join the (bounded, ≤ B rows) models on bucket id and fall back
    to ``log(alpha / (N_t + alpha·B))``. Inputs are (_b, _cnt) frames;
    output is the bounded (_b, _lr) ratio table."""

    def model(counts: DataFrame, name: str) -> DataFrame:
        tot = counts.agg(F.sum("_cnt").alias("_n"))
        return counts.crossJoin(F.broadcast(tot)).select(
            "_b",
            F.log(
                (F.col("_cnt") + F.lit(alpha))
                / (F.col("_n") + F.lit(alpha * n_buckets))
            ).alias(name),
        )

    t_tot = t_counts.agg(F.sum("_cnt").alias("_nt"))
    return (
        model(raw_counts, "_lp_raw")
        .join(model(t_counts, "_lp_t"), "_b", "left")
        .crossJoin(F.broadcast(t_tot))
        .select(
            "_b",
            (
                F.coalesce(
                    F.col("_lp_t"),
                    F.log(F.lit(alpha) / (F.col("_nt") + F.lit(alpha * n_buckets))),
                )
                - F.col("_lp_raw")
            ).alias("_lr"),
        )
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document average log importance ratio under hashed-unigram
    bucket models of the target vs the full (raw) corpus.

    For each bucket ``b``: ``p̂[b] = (count[b] + alpha) / (N + alpha·B)``
    (add-alpha smoothing), fit once over the docs matching ``target_pred``
    and once over ALL docs. Each document scores
    ``mean_token log(p̂_target[bucket(token)] / p̂_raw[bucket(token)])`` —
    positive ⇒ resembles the target more than the corpus average. Feed
    ``exp(score·T)`` (or a rank cut) into sampling.weighted_sample to
    complete the DSIR resampling step.

    Output: (id_col, n_tokens BIGINT, dsir_logweight DOUBLE rounded 9),
    one row per input doc.

    100 TB shape: ONE token explode feeds a per-(doc, bucket) count
    aggregation — everything downstream runs over distinct (doc, bucket)
    pairs (≤ B per doc), never raw occurrences. The two bucket models are
    B-row aggregates of that frame (map-side combined, bounded output) and
    join back as a BROADCAST — the corpus-sized frame shuffles exactly
    once, on the (doc, bucket) key. Skew is structurally bounded: bucket
    ids are md5-uniform, so no Zipf-head key exists at the exchange.
    """
    b_col = hash_bucket(F.col("token"), n_buckets)
    term = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token"),
        target_pred.alias("_is_t"),
    ).select("_id", b_col.alias("_b"), "_is_t")
    g = term.groupBy("_id", "_b", "_is_t").agg(F.count(F.lit(1)).alias("_c"))

    raw_counts = g.groupBy("_b").agg(F.sum("_c").alias("_cnt"))
    t_counts = (
        g.filter(F.col("_is_t")).groupBy("_b").agg(F.sum("_c").alias("_cnt"))
    )
    ratio = _bucket_log_ratios(raw_counts, t_counts, n_buckets, alpha)
    return (
        g.groupBy("_id", "_b")
        .agg(F.sum("_c").alias("_c"))
        .join(F.broadcast(ratio), "_b")
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("_lr").cast("decimal(27,18)")
                    * F.col("_c").cast("decimal(10,0)")
                ).cast("double")
                / F.sum("_c"),
                9,
            ).alias("dsir_logweight"),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", "dsir_logweight")
    )


def duck_dsir_sql(
    table: str,
    id_col: str,
    text_col: str,
    target_pred_sql: str,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> str:
    """DuckDB mirror of :func:`dsir_weights` — same bucket hash, same
    smoothing arithmetic in the same operation order, same decimal
    accumulation."""
    b = duck_hash_bucket("token", n_buckets)
    ab = alpha * n_buckets
    return f"""
    WITH term AS (
      SELECT {id_col} AS _id, {b} AS _b, ({target_pred_sql}) AS _is_t
      FROM (SELECT *, unnest(string_split({text_col}, ' ')) AS token
            FROM {table})
    ),
    g AS (SELECT _id, _b, _is_t, count(*) AS _c FROM term GROUP BY 1, 2, 3),
    raw_counts AS (SELECT _b, sum(_c) AS _cnt FROM g GROUP BY _b),
    t_counts AS (SELECT _b, sum(_c) AS _cnt FROM g WHERE _is_t GROUP BY _b),
    raw_tot AS (SELECT sum(_cnt) AS _n FROM raw_counts),
    t_tot AS (SELECT sum(_cnt) AS _nt FROM t_counts),
    ratio AS (
      SELECT r._b,
             coalesce(
               ln((t._cnt + {alpha}) / ((SELECT _nt FROM t_tot) + {ab})),
               ln({alpha} / ((SELECT _nt FROM t_tot) + {ab}))
             )
             - ln((r._cnt + {alpha}) / ((SELECT _n FROM raw_tot) + {ab})) AS _lr
      FROM raw_counts r LEFT JOIN t_counts t USING (_b)
    ),
    db AS (SELECT _id, _b, sum(_c) AS _c FROM g GROUP BY _id, _b)
    SELECT db._id AS {id_col}, CAST(sum(db._c) AS BIGINT) AS n_tokens,
           round(
             CAST(sum(CAST(ratio._lr AS DECIMAL(27,18))
                      * CAST(db._c AS DECIMAL(10,0))) AS DOUBLE)
             / sum(db._c), 9) AS dsir_logweight
    FROM db JOIN ratio USING (_b)
    GROUP BY db._id
    """


def fit_bucket_ratios(
    df: DataFrame,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Pass 1 of the streaming DSIR form: fit the bounded (bucket,
    log-ratio) table on a STATIC/historical corpus — the SAME
    :func:`_bucket_log_ratios` arithmetic :func:`dsir_weights` uses,
    exposed so a live stream can be scored against frozen ratios
    (:func:`score_with_ratios`) — the fit-on-history / apply-on-stream
    split every two-pass curation op here uses (x30/x33 pattern)."""
    b_col = hash_bucket(F.col("token"), n_buckets)
    term = df.select(
        F.explode(tokens(text_col)).alias("token"), target_pred.alias("_is_t")
    ).select(b_col.alias("_b"), "_is_t")
    raw_counts = term.groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt"))
    t_counts = (
        term.filter(F.col("_is_t")).groupBy("_b").agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return _bucket_log_ratios(raw_counts, t_counts, n_buckets, alpha)


def score_with_ratios(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ratios: DataFrame,
    n_buckets: int = 1024,
    missing_lr: float = 0.0,
) -> DataFrame:
    """Pass 2, streaming-safe: score each document against a FROZEN ratio
    table with a pure per-row expression — the bounded (≤ n_buckets-row)
    table is collected into ONE parsed map literal, each token folds its
    bucket's log-ratio into a decimal-exact sum, and the mean divides
    once. No explode, no join, no aggregation state: runs identically on
    batch and streaming DataFrames (asserted in tests), and equals
    :func:`dsir_weights` bit-for-bit when the ratios come from
    :func:`fit_bucket_ratios` on the same corpus — decimal addition is
    order-independent, so per-token folding ≡ per-(doc,bucket) grouped
    accumulation."""
    rows = ratios.collect()
    if len(rows) > n_buckets:
        raise ValueError(f"ratio table exceeds n_buckets={n_buckets}")
    toks = tokens(text_col)
    if rows:
        keys = ",".join(str(int(r._b)) for r in rows)
        vals = ",".join(f"{float(r._lr)!r}D" for r in rows)
        map_lit = F.expr(f"map_from_arrays(array({keys}), array({vals}))")
        # A bucket absent from the history table (possible on a live
        # stream) contributes ``missing_lr`` (default 0: neutral).
        per_token = lambda t: F.coalesce(  # noqa: E731
            F.element_at(map_lit, hash_bucket(t, n_buckets).cast("int")),
            F.lit(float(missing_lr)),
        )
    else:
        # Empty history (fit on an empty frame): every bucket is missing.
        # An empty map literal would type as map<void,void> and fail
        # analysis inside element_at, so score every token as missing_lr
        # directly.
        per_token = lambda t: F.lit(float(missing_lr))  # noqa: E731
    lr_sum = F.aggregate(
        F.transform(toks, per_token),
        F.lit(0).cast("decimal(27,18)"),
        # decimal + decimal widens to (28,18); cast back so the merge type
        # equals the accumulator type (values stay far below 10^9, so the
        # narrowing never truncates).
        lambda acc, x: (acc + x.cast("decimal(27,18)")).cast("decimal(27,18)"),
    )
    n = F.size(toks)
    # NULL text parity with dsir_weights: the batch form's explode emits
    # no rows for a NULL document, so the doc is absent from its output —
    # mirror that here (instead of emitting a NULL-scored row) to keep
    # the "equals dsir_weights bit-for-bit" contract over row SETS too.
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        F.round(lr_sum.cast("double") / n, 9).alias("dsir_logweight"),
    )
