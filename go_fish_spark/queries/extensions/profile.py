"""x-series, corpus-profile family: distribution-level release audits —
per-source length drift, embedding-dimension health, vocabulary-growth
(Heaps-law) curves, boilerplate affix detection, and near-dup-graph
PageRank centrality."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ...catalog import table
from ...operators import dedup
from ...operators.graph import duck_pagerank_sql, pagerank
from ...operators.profile import (
    boilerplate_affixes,
    duck_boilerplate_affixes_sql,
    duck_embedding_dim_stats_sql,
    duck_length_drift_sql,
    duck_embedding_centroid_sql,
    duck_heavy_hitters_sql,
    duck_vocab_coverage_sql,
    duck_vocab_growth_sql,
    embedding_centroid_report,
    embedding_dim_stats,
    heavy_hitters,
    length_drift,
    vocab_coverage,
    vocab_growth,
)
from .. import query
from ._shared import _DUCK_SHINGLES  # noqa: F401


@query(
    "x67_length_drift",
    oracle=duck_length_drift_sql("documents", "source", "text")
    + " ORDER BY source",
)
def x67_length_drift(spark, sf_dir):
    """Per-source length-distribution drift (profile.length_drift): KL
    divergence of each source's power-of-2 character-length histogram
    against the corpus-wide distribution — the monitor that catches one
    crawl suddenly shipping truncated or concatenated documents. ONE
    corpus pass produces the bounded (source, bin) counts; every
    derivation (per-source totals, corpus bins, KL terms) runs on that
    materialized ≤ sources×40-row frame."""
    return length_drift(
        table(spark, sf_dir, "documents"), "source", "text"
    ).orderBy("source")


@query(
    "x68_embedding_dim_stats",
    oracle=duck_embedding_dim_stats_sql("embeddings", "embedding")
    + " ORDER BY dim",
)
def x68_embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding health audit (profile.embedding_dim_stats):
    count, zero-count, mean and variance for every dimension — the
    dead/degenerate-dimension check run before any ANN index build. One
    posexplode to (dim, value), one bounded groupBy (= vector width
    keys); decimal-exact sums make the result independent of partition
    order."""
    return embedding_dim_stats(
        table(spark, sf_dir, "embeddings"), "embedding"
    ).orderBy("dim")


@query(
    "x69_vocab_growth",
    oracle=duck_vocab_growth_sql("documents", "doc_id", "text"),
)
def x69_vocab_growth(spark, sf_dir):
    """Vocabulary-growth (Heaps-law) curve (profile.vocab_growth):
    docs / token occurrences / DISTINCT tokens at 10%..100% corpus
    prefixes in deterministic md5 order. The distinct counts come from
    one (token) shuffle computing each token's FIRST prefix bucket —
    no per-step rescan; every curve point is a cumulative sum over the
    bounded bucket frame. All-integer output (exact)."""
    return vocab_growth(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query(
    "x70_boilerplate_affixes",
    oracle=duck_boilerplate_affixes_sql(
        "documents", "doc_id", "text", k=16, min_docs=2
    )
    + " ORDER BY kind, affix",
)
def x70_boilerplate_affixes(spark, sf_dir):
    """Shared 16-char document prefixes/suffixes
    (profile.boilerplate_affixes): crawl boilerplate — mirrored headers,
    injected footers — surfaces as an affix shared across docs whose
    bodies differ, which exact dedup misses. Map-only extraction, one
    groupBy on the (kind, affix) key, output bounded by the min_docs
    floor."""
    return boilerplate_affixes(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=16, min_docs=2
    ).orderBy("kind", "affix")


_X71_UND = f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.3
    )
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION SELECT id_b, id_a FROM pairs
"""


@query(
    "x71_dupgraph_pagerank",
    oracle=duck_pagerank_sql(
        "SELECT doc_id AS id FROM documents", _X71_UND, id_out="doc_id"
    ),
)
def x71_dupgraph_pagerank(spark, sf_dir):
    """PageRank centrality over the near-dup graph (graph.pagerank, 5
    fixed power iterations, d = 0.85): finds HUB documents — boilerplate
    templates and mirror roots that pair with many others without any
    single cluster growing large enough for the x62 histogram to flag.
    A second ITERATIVE graph op beside connected components: same
    pre-partitioned persisted adjacency (only the slim rank frame moves
    per round), per-round lineage truncation, and an unrolled-CTE oracle
    made possible by the fixed iteration count. Deterministic across
    engines via the round-12/decimal-sum/round-9 discipline."""
    docs = table(spark, sf_dir, "documents")
    from ._shared import shared_jaccard_pairs

    pairs = shared_jaccard_pairs(spark, sf_dir)
    return pagerank(
        docs.select("doc_id"), pairs, id_col="doc_id", n_iter=5
    ).orderBy("doc_id")


@query(
    "x78_vocab_coverage",
    oracle=duck_vocab_coverage_sql(
        "documents", "source", "text", vocab_size=500
    ),
)
def x78_vocab_coverage(spark, sf_dir):
    """Per-source OOV report (profile.vocab_coverage): token- and
    type-level out-of-vocabulary rates against the corpus's own top-500
    token vocabulary (deterministic count-DESC/token-ASC boundary) —
    the tokenizer-fit audit that flags a source as off-domain or junk
    before a vocab is committed. One (token) shuffle to count, a
    TakeOrdered top-N election (no global window), broadcast vocab into
    the map-only coverage join, bounded source-key aggregation."""
    return vocab_coverage(
        table(spark, sf_dir, "documents"), "source", "text", vocab_size=500
    ).orderBy("source")


@query(
    "x81_heavy_hitters",
    oracle=duck_heavy_hitters_sql("documents", "text", k=100),
)
def x81_heavy_hitters(spark, sf_dir):
    """Heavy-hitter tokens (profile.heavy_hitters): every token
    exceeding 1% of all occurrences (k=100), found via per-partition
    Misra–Gries summaries (bounded memory, mergeable-summaries fold in
    Arrow-batched mapInPandas) whose candidate union provably contains
    every true heavy hitter, then verified EXACTLY in one
    broadcast-filtered count pass — so the output is sketch-independent
    integer truth (count·k > n_total) and the oracle is plain SQL. The
    only token-keyed shuffle is over candidates, never the corpus
    vocabulary."""
    return heavy_hitters(
        table(spark, sf_dir, "documents"), "text", k=100
    ).orderBy("token")


@query(
    "x83_embedding_centroid_report",
    oracle=duck_embedding_centroid_sql("embeddings", "label", "embedding"),
)
def x83_embedding_centroid_report(spark, sf_dir):
    """Per-label embedding centroid/dispersion audit
    (profile.embedding_centroid_report): ‖centroid‖², E‖x‖², and the
    total-variance dispersion E‖x − c‖² per group — the semantic-drift
    check run between snapshots (a collapsing centroid flags incoherent
    content; collapsing dispersion flags template flooding). One
    posexplode → ONE bounded (group × dim) exchange; decimal-exact sums
    with round-12 re-entry make every value engine-portable."""
    return embedding_centroid_report(
        table(spark, sf_dir, "embeddings"), "label", "embedding"
    ).orderBy("label")


@query(
    "x89_degree_histogram",
    oracle=f"""
    WITH und AS ({_X71_UND}),
    deg AS (SELECT src AS _id, count(*) AS _d FROM und GROUP BY src),
    j AS (
      SELECT coalesce(deg._d, 0) AS _d
      FROM (SELECT DISTINCT doc_id AS _id FROM documents) n
      LEFT JOIN deg USING (_id)
    )
    SELECT CASE WHEN _d = 0 THEN 0
                ELSE CAST(pow(2, floor(log2(_d))) AS BIGINT) END AS bucket_lo,
           count(*) AS n_nodes
    FROM j GROUP BY 1 ORDER BY bucket_lo
    """,
)
def x89_degree_histogram(spark, sf_dir):
    """Degree distribution of the near-dup pair graph
    (graph.degree_histogram): power-of-2 buckets over per-node degree,
    isolated docs in bucket 0 — the cheap, iteration-free symptom check
    for template hubs (the x71 skew hazard) and over-permissive pair
    thresholds, completing the graph-audit family beside x62 (cluster
    sizes) and x71 (centrality). One node-key groupBy + a ≤ 40-bin
    groupBy."""
    from ...operators.graph import degree_histogram

    docs = table(spark, sf_dir, "documents")
    from ._shared import shared_jaccard_pairs

    pairs = shared_jaccard_pairs(spark, sf_dir)
    return degree_histogram(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )


def _x98_oracle() -> str:
    from ...operators.profile import duck_zipf_slope_sql

    return (
        "SELECT * FROM ("
        + duck_zipf_slope_sql("documents", "source", "text", max_rank=1000)
        + ") ORDER BY source"
    )


@query("x98_zipf_slope", oracle=_x98_oracle())
def x98_zipf_slope(spark, sf_dir):
    """Per-source Zipf rank-frequency slope (profile.zipf_slope): the
    log-log OLS fit of token frequency on rank — the one-number
    vocabulary-health summary beside x69's growth curve (≈ −1 is
    natural language; → 0 flags templated text, ≪ −1 a degenerate
    vocabulary). One corpus exchange to (source, token) counts, a
    vocabulary-bounded per-source ranking window, five decimal-exact
    regression sums per source; fixed-order closed-form slope + round-9
    for the DuckDB hash match."""
    from ...operators.profile import zipf_slope

    docs = table(spark, sf_dir, "documents")
    return zipf_slope(docs, "source", "text", max_rank=1000).orderBy(
        "source"
    )


@query(
    "x105_key_skew_audit",
    oracle="""
    WITH pk AS (SELECT user_id AS _k, count(*) AS _n
                FROM events GROUP BY user_id)
    SELECT CAST(pow(2, floor(log2(CAST(_n AS DOUBLE)))) AS BIGINT)
             AS group_size_bucket_lo,
           count(*) AS n_keys,
           CAST(sum(_n) AS BIGINT) AS n_rows
    FROM pk GROUP BY group_size_bucket_lo ORDER BY group_size_bucket_lo
    """,
)
def x105_key_skew_audit(spark, sf_dir):
    """Key-skew histogram over the event stream's user key
    (profile.key_skew_audit): exact per-key group sizes folded into
    power-of-2 buckets — the pre-flight report that decides whether a
    user-keyed join/groupBy needs salting and how much state a keyed
    streaming operator (q08/q21's shapes) holds per key. ONE key
    exchange with map-side combine, then a ≤ 40-key rollup; integer
    arithmetic end-to-end (the pair-budget estimator's law, applied to
    shuffle sizing)."""
    from ...operators.profile import key_skew_audit

    return key_skew_audit(table(spark, sf_dir, "events"), "user_id")


@query(
    "x109_kmv_distinct",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT source AS _g, s AS _s FROM (
        SELECT source, unnest({_DUCK_SHINGLES}) AS s
        FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
      )
    ),
    hashed AS (
      SELECT _g, _s,
             CAST(CAST(('0x' || substr(md5(_s), 1, 8)) AS UBIGINT)
                  AS BIGINT) AS _h
      FROM sh
    ),
    counts AS (SELECT _g, count(*) AS n_exact FROM hashed GROUP BY _g),
    kth AS (
      SELECT _g, max(_h) AS _hk, count(*) AS _nk FROM (
        SELECT _g, _h,
               row_number() OVER (PARTITION BY _g ORDER BY _h, _s) AS _rn
        FROM hashed
      ) WHERE _rn <= 256 GROUP BY _g
    )
    SELECT counts._g AS source, n_exact,
           round(CASE WHEN _nk < 256 THEN CAST(n_exact AS DOUBLE)
                      ELSE 255.0 * 4294967296.0 / CAST(_hk AS DOUBLE)
                 END, 3) AS kmv_estimate,
           round(abs(CASE WHEN _nk < 256 THEN CAST(n_exact AS DOUBLE)
                          ELSE 255.0 * 4294967296.0 / CAST(_hk AS DOUBLE)
                     END - CAST(n_exact AS DOUBLE))
                 / CAST(n_exact AS DOUBLE), 6) AS rel_err
    FROM counts JOIN kth ON counts._g = kth._g
    ORDER BY source
    """,
)
def x109_kmv_distinct(spark, sf_dir):
    """KMV distinct-shingle census with accuracy audit
    (profile.kmv_distinct_audit, k=256): per source, the k-minimum-
    values estimate Ê = (k−1)·2³²/h₍k₎ beside the exact distinct count
    and relative error — the estimator a corpus-scale vocabulary census
    uses (k values per group instead of the full distinct fold), with
    ground truth attached so the error column is the evidence. One
    distinct (source, shingle) exchange; the k-smallest selection is
    the q37 WindowGroupLimit law pointed at the smallest hashes."""
    from ...operators.profile import kmv_distinct_audit

    return kmv_distinct_audit(
        table(spark, sf_dir, "documents"), "source", "text",
        k_shingle=3, k_min=256,
    ).orderBy("source")


from ...operators.profile import duck_zipf_fit_sql, zipf_fit  # noqa: E402


@query(
    "x129_zipf_fit",
    oracle=duck_zipf_fit_sql("documents", "source", "text", top_n=200),
)
def x129_zipf_fit(spark, sf_dir):
    """Per-source Zipf-law fit (profile.zipf_fit): OLS slope + R² of
    ln(freq) on ln(rank) over each source's top-200 tokens — slope ≈ −1
    is natural text, flat flags synthetic/templated sources, the
    "is this language at all" companion to x114's KL. One (source,
    token) exchange, per-SOURCE rank windows, ≤|sources| regression
    agg with round-12/decimal point sums."""
    return zipf_fit(table(spark, sf_dir, "documents"), "source", "text", 200)


from ...operators.profile import (  # noqa: E402
    duck_hill_tail_index_sql,
    hill_tail_index,
)


@query(
    "x134_hill_tail_index",
    oracle=duck_hill_tail_index_sql("documents", "source", "n_chars", k=20),
)
def x134_hill_tail_index(spark, sf_dir):
    """Per-source Hill heavy-tail index over document lengths
    (profile.hill_tail_index — Hill 1975, k=20): α ≈ 1 ⇒ Zipf-mass
    monsters dominate (packing/memory must budget for them), α > 2 ⇒
    tame tail. Per-GROUP rank windows over ≤ k+1 rows each, decimal-
    summed round-12 ln terms, ≤|sources| output."""
    return hill_tail_index(
        table(spark, sf_dir, "documents"), "source", "n_chars", k=20
    )


from ...operators.profile import duck_score_auc_sql, score_auc  # noqa: E402
from ._shared import _DUCK_STOP  # noqa: E402

_DUCK_QUALITY = (
    "(0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)"
    " + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),"
    f" w -> w IN ({_DUCK_STOP}))) / len(string_split(text, ' ')))"
    " + 0.3 * least((length(text) - (len(string_split(text, ' ')) - 1))"
    " / len(string_split(text, ' ')) / 10.0, 1.0))"
)


@query(
    "x135_score_auc",
    oracle=duck_score_auc_sql(
        "documents", "source", _DUCK_QUALITY, "lang = 'en'"
    ),
)
def x135_score_auc(spark, sf_dir):
    """Per-source AUC of the quality score against the lang='en' label
    (profile.score_auc — Mann–Whitney with average-rank ties): the
    scalar does-the-filter-rank-anything metric beside x74's
    calibration curve. EXACT by construction: 2×ranks stay BIGINT
    (R2 = Σ n_pos·(2·cum+n+1) over distinct scores), one final
    division. One (group, score) exchange + bounded windows."""
    from ...functions import text as tx

    docs = table(spark, sf_dir, "documents")
    return score_auc(
        docs, "source", tx.quality_score("text"), F.col("lang") == "en"
    )


from ...operators.profile import duck_ks_drift_sql, ks_drift  # noqa: E402


@query(
    "x137_ks_drift",
    oracle=duck_ks_drift_sql("documents", "source", _DUCK_QUALITY, 3),
)
def x137_ks_drift(spark, sf_dir):
    """Per-source two-sample KS drift (profile.ks_drift, round-3
    quantized quality score): sup-gap between each source's ECDF and
    the rest of the corpus — the assumption-free shape alarm beside
    x67's binned KL. Bounded (group × quantized-value) grid, integer
    cumulative counts, one IEEE division per grid point."""
    from ...functions import text as tx

    return ks_drift(
        table(spark, sf_dir, "documents"), "source",
        tx.quality_score("text"), decimals=3,
    )


from ...operators.profile import (  # noqa: E402
    _SPECTRUM_COLS,
    _spectrum_metrics,
    duck_spectrum_sums,
    embedding_spectrum_audit,
)
from ._shared import _EMB_DIM  # noqa: E402


def _x138_oracle(sf_dir: str) -> str | None:
    """Re-derive the exact decimal sums with DuckDB, run the SAME
    sums→metrics numpy step, and emit the result row as literals —
    every float is computed once by shared code from bit-identical
    inputs, so the hash compare proves the sum pipelines agree."""
    import os

    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        return None
    n, sum_x, sum_xx = duck_spectrum_sums(
        path, "embedding", _EMB_DIM, id_col="vec_id", max_fit=1000
    )
    m = _spectrum_metrics(n, sum_x, sum_xx, _EMB_DIM)
    cols = ", ".join(
        ("NULL" if m[c] is None else repr(m[c])) + f" AS {c}"
        for c in _SPECTRUM_COLS
    )
    return (
        f"SELECT CAST(n AS BIGINT) AS n, CAST(dim AS INT) AS dim, "
        f"total_var, top1_share, top8_share, effective_rank, "
        f"mean_sq_norm, centroid_share FROM (SELECT {cols})"
    )


@query("x138_embedding_spectrum", oracle=_x138_oracle)
def x138_embedding_spectrum(spark, sf_dir):
    """Embedding-space spectrum/anisotropy audit (profile.
    embedding_spectrum_audit — Ethayarajh 2019): covariance
    eigenspectrum shares, effective rank, and the centroid-offset share
    — the off-diagonal health check x68's per-dim stats cannot see,
    run before trusting cosine geometry. DECIMAL(38,30) lossless sums
    (no rounding boundary at all) over the UPPER-TRIANGLE products into
    a bounded dim(dim+1)/2-key exchange, fit on the deterministic
    hash-ordered 1000-vector sample (the quantizer contract — the
    oracle refits the same rows at any SF); eigen on the driver from
    the exact sums, shared with the oracle arm."""
    m = embedding_spectrum_audit(
        table(spark, sf_dir, "embeddings"), "embedding", _EMB_DIM,
        id_col="vec_id", max_fit=1000,
    )
    row = [tuple(m[c] for c in _SPECTRUM_COLS)]
    return spark.createDataFrame(
        row,
        "n bigint, dim int, total_var double, top1_share double, "
        "top8_share double, effective_rank double, mean_sq_norm double, "
        "centroid_share double",
    )


# --- round 10: coverage/calibration/concentration reports --------------------

from ...operators.profile import (  # noqa: E402
    apply_auc_gate,
    duck_gini_sql,
    duck_good_turing_sql,
    duck_oov_frozen_sql,
    duck_oov_sql,
    duck_roc_sql,
    good_turing_unseen,
    oov_rate,
    roc_points,
    score_distribution_baseline,
    source_gini,
)
from ._shared import _DUCK_EVAL  # noqa: E402


def _x141_oracle() -> str:
    """The gate-vs-batch parity identity IS the oracle: the frozen-
    baseline AUC of the eval slice against history equals the batch
    Mann–Whitney over the combined sample (same BIGINT numerator, same
    single division), so DuckDB computes the BATCH form and the hash
    compare proves the streaming arm's identity holds on real data."""
    return f"""
    WITH g AS (
      SELECT source AS _g, {_DUCK_QUALITY} AS _s, count(*) AS _n,
             sum(CASE WHEN {_DUCK_EVAL} THEN 1 ELSE 0 END) AS _np
      FROM documents GROUP BY _g, _s
    ),
    ranked AS (
      SELECT _g, _n, _np,
             coalesce(sum(_n) OVER (
               PARTITION BY _g ORDER BY _s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS _cum
      FROM g
    ),
    agg AS (
      SELECT _g, sum(_n) AS n, sum(_np) AS n_pos,
             sum(_np * (2 * _cum + _n + 1)) AS _r2
      FROM ranked GROUP BY _g
    )
    SELECT _g AS source, CAST(n_pos AS BIGINT) AS n,
           CASE WHEN n_pos > 0 AND n - n_pos > 0
                THEN round(CAST(_r2 - n_pos * (n_pos + 1) AS DOUBLE)
                           / (2.0 * CAST(n_pos * (n - n_pos) AS DOUBLE)), 9)
           END AS auc
    FROM agg WHERE n_pos > 0 ORDER BY source
    """


@query("x141_auc_gate_readback", oracle=_x141_oracle())
def x141_auc_gate_readback(spark, sf_dir):
    """The x135 STREAMING arm under the oracle contract: fit the frozen
    per-source score baseline on HISTORY (docs outside the eval slice),
    gate the eval slice (doc_id % 97 == 0 — "today's batch") with
    apply_auc_gate, per source. The U-statistic identity makes
    gate(batch, fit(history)) ≡ batch score_auc EXACTLY, so the oracle
    is the plain batch MW SQL — the hash compare certifies the
    fit/apply split end-to-end on corpus data, not just in the unit
    parity test. Bounded per-group merged-step frames; the baseline is
    the broadcast side."""
    from ...functions import text as tx

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 97 == 0
    base = score_distribution_baseline(
        docs.filter(~is_new), "source", tx.quality_score("text")
    )
    return apply_auc_gate(
        docs.filter(is_new), base, "source", tx.quality_score("text")
    )


@query(
    "x143_good_turing",
    oracle=duck_good_turing_sql("documents", "source", "text"),
)
def x143_good_turing(spark, sf_dir):
    """Per-source Good–Turing missing mass (profile.good_turing_unseen
    — Good 1953): P(next token is an unseen type) = singletons/N, the
    have-we-crawled-enough coverage gauge beside x132's diversity and
    x129's Zipf shape. One vocab-bounded (source, token) exchange."""
    return good_turing_unseen(
        table(spark, sf_dir, "documents"), "source", "text"
    )


@query(
    "x144_roc_points",
    oracle=duck_roc_sql("documents", _DUCK_QUALITY, _DUCK_EVAL),
)
def x144_roc_points(spark, sf_dir):
    """ROC curve of the quality score against the eval-slice label
    (profile.roc_points): TPR/FPR at every distinct raw score — the
    operating-point view x135's scalar AUC summarizes. The grid is the
    raw mirrored doubles (bitwise-identical cross-engine, no rounding
    boundary); integer descending cums over the bounded frame."""
    from ...functions import text as tx

    return roc_points(
        table(spark, sf_dir, "documents"),
        tx.quality_score("text"),
        F.col("doc_id") % 97 == 0,
    )


@query(
    "x146_source_gini",
    oracle=duck_gini_sql("documents", "source", "text"),
)
def x146_source_gini(spark, sf_dir):
    """Gini coefficient of token-mass concentration across sources
    (profile.source_gini, exact sorted-cumulative formula): the
    monoculture gauge a mixture designer reads before the x16/x85/x108
    quota family chooses weights. Integer arithmetic to one division
    over the ≤|sources| frame."""
    return source_gini(table(spark, sf_dir, "documents"), "source", "text")


@query(
    "x147_oov_rate",
    oracle=duck_oov_sql("documents", "source", "text", 1000),
)
def x147_oov_rate(spark, sf_dir):
    """Per-source out-of-vocabulary occurrence rate against the frozen
    corpus top-1000 vocabulary (profile.oov_rate — count-DESC/token-ASC
    deterministic rank): the tokenizer-coverage question. The global
    vocab re-aggregates the SAME (source, token) frame — one corpus
    pass total."""
    return oov_rate(table(spark, sf_dir, "documents"), "source", "text", 1000)


@query(
    "x153_ecdf_gate_readback",
    oracle=f"""
    WITH hist AS (
      SELECT round(CAST({_DUCK_QUALITY} AS DOUBLE), 2) AS _h
      FROM documents WHERE NOT ({_DUCK_EVAL})
    ),
    n AS (SELECT count(*) AS _n FROM hist),
    ev AS (
      SELECT doc_id, CAST({_DUCK_QUALITY} AS DOUBLE) AS _v
      FROM documents WHERE {_DUCK_EVAL}
    )
    SELECT e.doc_id,
           round(CAST((SELECT count(*) FROM hist h WHERE h._h <= e._v)
                      AS DOUBLE) / CAST(n._n AS DOUBLE), 9) AS pctl,
           (CAST((SELECT count(*) FROM hist h WHERE h._h <= e._v)
                 AS DOUBLE) / CAST(n._n AS DOUBLE)) < 0.05
           OR (CAST((SELECT count(*) FROM hist h WHERE h._h <= e._v)
                    AS DOUBLE) / CAST(n._n AS DOUBLE)) > 0.95 AS is_tail
    FROM ev e, n ORDER BY e.doc_id
    """,
)
def x153_ecdf_gate_readback(spark, sf_dir):
    """The declarable `ecdf_gate` TASK under the oracle contract: fit
    the frozen quality-score ECDF on HISTORY (round-2 quantized values
    — a bounded ≤~100-point step list, so the task config needs no
    rank subsampling and the oracle can recompute the exact step), run
    the task's pure array-literal percentile lookup over the eval
    slice, flag the [0.05, 0.95] tails. The oracle re-derives every
    row's percentile as count(history ≤ v)/N in SQL — the hash compare
    certifies the gate EXPRESSION (step lookup, tail logic, rounding)
    on corpus data, the same way x141 certifies the AUC gate."""
    from ...functions import text as tx
    from ...tasks import get_task
    from ...tasks.builtin import ecdf_gate_config

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 97 == 0
    base = score_distribution_baseline(
        docs.filter(~is_new).select(
            F.lit("g").alias("g"),
            F.round(tx.quality_score("text"), 2).alias("s"),
        ),
        "g", "s",
    )
    task = get_task(
        "ecdf_gate", baseline=ecdf_gate_config(base, max_points=10**9),
        value_col="_v", lo=0.05, hi=0.95,
    )
    ev = docs.filter(is_new).select(
        "doc_id", tx.quality_score("text").alias("_v")
    )
    return task.apply(ev).select("doc_id", "pctl", "is_tail").orderBy(
        "doc_id"
    )


# --- round 11: frozen arms for the round-10 statistics (r10 Next #5) ---------


@query(
    "x158_gt_gate_readback",
    oracle=duck_good_turing_sql("documents", "source", "text"),
)
def x158_gt_gate_readback(spark, sf_dir):
    """The x143 Good–Turing STREAMING arm under the oracle contract
    (the x141 pattern): fit the frozen per-(source, token) count table
    on HISTORY (docs outside the eval slice), merge "today's batch"
    (doc_id % 97 == 0) by integer addition with
    profile.apply_good_turing_gate. Counts are additive, so
    gate(batch, fit(history)) ≡ good_turing_unseen(history ∪ batch)
    EXACTLY — the oracle is the plain batch SQL over the whole table,
    and the hash compare certifies the fit/apply split end-to-end on
    corpus data. Bounded vocab frames; history never re-reads text."""
    from ...operators.profile import (
        apply_good_turing_gate,
        fit_token_counts,
    )

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 97 == 0
    base = fit_token_counts(docs.filter(~is_new), "source", "text")
    return apply_good_turing_gate(
        docs.filter(is_new), base, "source", "text"
    )


@query(
    "x159_gini_gate_readback",
    oracle=duck_gini_sql("documents", "source", "text"),
)
def x159_gini_gate_readback(spark, sf_dir):
    """The x146 Gini STREAMING arm under the oracle contract: freeze
    the per-source token-mass Lorenz table on HISTORY, add the eval
    batch's masses with profile.apply_gini_gate, evaluate the exact
    sorted-cumulative Gini on the merged ≤|sources| table. Masses add,
    so gate(batch, fit(history)) ≡ source_gini(full corpus) EXACTLY —
    batch SQL as the oracle, hash-certified split."""
    from ...operators.profile import apply_gini_gate, fit_source_mass

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 97 == 0
    base = fit_source_mass(docs.filter(~is_new), "source", "text")
    return apply_gini_gate(docs.filter(is_new), base, "source", "text")


@query(
    "x160_oov_gate_readback",
    oracle=duck_oov_frozen_sql(
        "documents", "source", "text", 1000,
        hist_pred="doc_id % 97 != 0", batch_pred="doc_id % 97 = 0",
    ),
)
def x160_oov_gate_readback(spark, sf_dir):
    """The x147 OOV STREAMING arm under the oracle contract: the
    top-1000 vocabulary is FROZEN from history (count-DESC/token-ASC
    deterministic rank — profile.fit_vocab_topn) and today's batch is
    gated against it with profile.apply_oov_gate — the real streaming
    split ("how much of today's crawl falls outside the tokenizer
    vocab we already shipped?"), which duck_oov_frozen_sql mirrors with
    the same history/batch predicates. The frozen side is a ≤1000-row
    broadcast; the batch side is one (source, token) exchange."""
    from ...operators.profile import apply_oov_gate, fit_vocab_topn

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 97 == 0
    vocab = fit_vocab_topn(docs.filter(~is_new), "text", 1000)
    return apply_oov_gate(docs.filter(is_new), vocab, "source", "text")
