"""x-series, text-analysis family: language ID, quality scoring, token
counts, fingerprints, TF-IDF, n-gram stats, decontamination (shingle /
substring / graded / split-leakage), repetition, PII, Gopher rules,
unigram/bigram fluency, novelty, source overlap, fertility, BM25."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ...catalog import table  # noqa: F401
from ...functions import text as tx  # noqa: F401
from ...functions import vectors  # noqa: F401
from ...operators import decontam, dedup, multimodal, similarity  # noqa: F401
from .. import query  # noqa: F401
from ...operators.sampling import duck_hash_bucket  # noqa: F401
from ._shared import _DUCK_EVAL, _DUCK_SHINGLES, _DUCK_STOP, _EMB_DIM  # noqa: F401


@query(
    "x17_tfidf",
    oracle="""
    WITH term AS (
      SELECT doc_id AS id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT id, token, count(*) AS tf FROM term GROUP BY id, token),
    df AS (SELECT token, count(DISTINCT id) AS df FROM term GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT id, token, tf, df, idf, tfidf, rank FROM (
      SELECT tf.id, tf.token, tf.tf, df.df,
             ln((n_docs + 1.0) / (df.df + 1.0)) + 1.0 AS idf,
             CAST(tf.tf AS DOUBLE) * (ln((n_docs + 1.0) / (df.df + 1.0)) + 1.0)
               AS tfidf,
             row_number() OVER (
               PARTITION BY tf.id
               ORDER BY CAST(tf.tf AS DOUBLE)
                          * (ln((n_docs + 1.0) / (df.df + 1.0)) + 1.0) DESC,
                        tf.token
             ) AS rank
      FROM tf JOIN df USING (token) CROSS JOIN n
    ) WHERE rank <= 3
    ORDER BY id, rank
    """,
)
def x17_tfidf(spark, sf_dir):
    """TF-IDF top-3 salient terms per document (operators/tfidf.py):
    explode collapses map-side into one (doc,token) shuffle, df is
    vocabulary-sized, N joins in as a broadcast aggregate (no driver
    action), per-doc top-k is a WindowGroupLimit window. tf/df are exact
    longs and idf/tfidf are per-row double expressions, so the output is
    hash-comparable with no float-accumulation caveats."""
    from ...operators.tfidf import tf_idf

    return tf_idf(
        table(spark, sf_dir, "documents"), "doc_id", "text", top_k=3
    ).orderBy("id", "rank")


def _duck_lang_case() -> str:
    scores = tx.duck_lang_scores("text")
    cols = ", ".join(f"{e} AS s_{lang}" for lang, e in scores.items())
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in scores) + ")"
    whens = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in scores)
    return f"""
    WITH scored AS (SELECT doc_id, {cols} FROM documents),
    best_t AS (SELECT doc_id, *, {best} AS best FROM scored)
    SELECT doc_id,
           CASE WHEN best <= 0 THEN 'und' {whens} ELSE 'und' END AS lang_pred
    FROM best_t ORDER BY doc_id
    """


@query("x07_lang_id", oracle=_duck_lang_case())
def x07_lang_id(spark, sf_dir):
    """Marker-token language ID (argmax over per-language stopword hits,
    deterministic tie-break, 'und' when no markers hit)."""
    df = table(spark, sf_dir, "documents")
    return df.select("doc_id", tx.lang_id("text").alias("lang_pred")).orderBy(
        "doc_id"
    )


@query(
    "x08_quality_score",
    oracle=f"""
    SELECT doc_id, n_words, stop_ratio, mean_word_len,
           0.4 * least(n_words / 100.0, 1.0)
             + 0.3 * (1.0 - stop_ratio)
             + 0.3 * least(mean_word_len / 10.0, 1.0) AS score
    FROM (
      SELECT doc_id,
             len(ws) AS n_words,
             len(list_filter(ws, w -> w IN ({_DUCK_STOP}))) / len(ws) AS stop_ratio,
             (length(text) - (len(ws) - 1)) / len(ws) AS mean_word_len
      FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
    ) ORDER BY doc_id
    """,
)
def x08_quality_score(spark, sf_dir):
    """Document quality scoring: length / stopword-ratio / word-length
    signals composed into a [0,1] score (all column expressions)."""
    df = table(spark, sf_dir, "documents")
    m = tx.quality_metrics("text")
    return df.select(
        "doc_id",
        m["n_words"].alias("n_words"),
        m["stop_ratio"].alias("stop_ratio"),
        m["mean_word_len"].alias("mean_word_len"),
        tx.quality_score("text").alias("score"),
    ).orderBy("doc_id")


@query(
    "x09_token_count",
    oracle=r"""
    SELECT doc_id, n_chars,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def x09_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex tokens."""
    df = table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        "n_chars",
        F.size(tx.tokens("text")).alias("n_ws_tokens"),
        tx.bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@query(
    "x10_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_fp,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS bag_fp
    FROM documents ORDER BY doc_id
    """,
)
def x10_fingerprint(spark, sf_dir):
    """Document fingerprinting: exact-content md5 + order-insensitive
    bag-of-words md5 (catches word-order-permuted duplicates)."""
    df = table(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        tx.content_fingerprint("text").alias("content_fp"),
        tx.bag_fingerprint("text").alias("bag_fp"),
    ).orderBy("doc_id")


@query(
    "x21_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE {_DUCK_EVAL}),
    tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE NOT ({_DUCK_EVAL}))
    SELECT tr.doc_id, count(*) AS n_hits
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    ORDER BY doc_id
    """,
)
def x21_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/decontam.py): training docs
    sharing >= 1 word-3-shingle with the eval set, with the hit count.
    100 TB shape: the eval shingle set is DISTINCT'd then broadcast — the
    training corpus is never shuffled for the membership probe (plan
    guard in tests/test_plans.py); only matched doc_ids reach the final
    groupBy."""
    docs = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return decontam.contaminated_docs(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text", k=3
    ).orderBy("doc_id")


@query(
    "x22_repetition_filter",
    # ws/g2 bound once per layer (MATERIALIZED stops DuckDB re-inlining
    # the split/comprehension into every consumer — same let-binding
    # discipline the Spark side applies via functions.text._let).
    oracle="""
    WITH w AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS MATERIALIZED (
      SELECT doc_id, ws,
             [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))] AS g2
      FROM w
    ),
    m AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(ws) <= 0 THEN 0.0
                  ELSE 1.0 - len(list_distinct(ws)) / len(ws) END
               AS dup_word_ratio,
             CASE WHEN len(g2) <= 0 THEN 0.0
                  ELSE list_max(list_transform(list_distinct(g2),
                         x -> len(list_filter(g2, y -> y = x)))) / len(g2) END
               AS top_2gram_frac
      FROM g
    )
    SELECT doc_id, dup_word_ratio, top_2gram_frac,
           dup_word_ratio < 0.6 AND top_2gram_frac < 0.2 AS rep_pass
    FROM m ORDER BY doc_id
    """,
)
def x22_repetition_filter(spark, sf_dir):
    """Gopher-style repetition quality signals: duplicate-word ratio and
    most-frequent-2-gram fraction, plus the pass/fail gate — all array-side
    Column expressions (zero shuffle; frequency argmax is per-row)."""
    m = tx.repetition_metrics("text")
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            m["dup_word_ratio"].alias("dup_word_ratio"),
            m["top_2gram_frac"].alias("top_2gram_frac"),
            ((m["dup_word_ratio"] < 0.6) & (m["top_2gram_frac"] < 0.2)).alias(
                "rep_pass"
            ),
        )
        .orderBy("doc_id")
    )


# Deterministic PII injection: the synthetic corpus carries none, so both
# engines append the SAME synthetic contact lines to every 4th/5th doc
# before detection — the scrubber is exercised on real matches.


_DUCK_PII_TEXT = (
    "text || CASE WHEN doc_id % 4 = 0 THEN ' contact user' || doc_id "
    "|| '@example.com now' ELSE '' END "
    "|| CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 200) "
    "|| '.1 call 555-867-5309' ELSE '' END"
)


def _pii_text_col() -> F.Column:
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".1 call 555-867-5309"),
            ),
        ).otherwise(F.lit("")),
    )


_DUCK_PII_N = tx.duck_pii_counts(f"({_DUCK_PII_TEXT})")


@query(
    "x23_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           {_DUCK_PII_N['email']} AS n_email,
           {_DUCK_PII_N['ipv4']} AS n_ip,
           {_DUCK_PII_N['phone']} AS n_phone,
           md5({tx.duck_scrub_pii(f'({_DUCK_PII_TEXT})')}) AS scrub_sig
    FROM documents
    ORDER BY doc_id
    """,
)
def x23_pii_scrub(spark, sf_dir):
    """PII detection + redaction (functions/text.py PII_PATTERNS): count
    email/IPv4/phone matches and emit the md5 of the scrubbed text (typed
    placeholders, fixed replacement order). Patterns are restricted to the
    Java-regex ∩ RE2 dialect so both engines match identically; all
    JVM-side regexp_count/regexp_replace — no UDFs, no shuffle."""
    t = _pii_text_col()
    n = tx.pii_counts(t)
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            n["email"].alias("n_email"),
            n["ipv4"].alias("n_ip"),
            n["phone"].alias("n_phone"),
            F.md5(tx.scrub_pii(t)).alias("scrub_sig"),
        )
        .orderBy("doc_id")
    )


@query(
    "x27_ngram_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])
               AS ngram
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    )
    SELECT ngram,
           CAST(count(*) AS BIGINT) AS term_freq,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM g GROUP BY ngram
    ORDER BY term_freq DESC, ngram
    LIMIT 100
    """,
)
def x27_ngram_stats(spark, sf_dir):
    """Corpus bigram frequency table (operators/ngrams.py): array-side
    n-gram construction, one shuffle with map-side combine (Zipf-skew
    tolerant), TakeOrdered top-100 over the vocab-sized aggregate."""
    from ...operators.ngrams import ngram_stats

    return ngram_stats(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=2, top_k=100
    )


@query(
    "x32_substring_decontam",
    oracle=f"""
    WITH probes AS (
      SELECT DISTINCT substr(text, 1, 12) AS p FROM documents
      WHERE {_DUCK_EVAL} AND length(substr(text, 1, 12)) >= 12
    ),
    train AS (SELECT doc_id, text FROM documents WHERE NOT ({_DUCK_EVAL}))
    SELECT doc_id, count(*) AS n_probe_hits
    FROM train JOIN probes ON contains(train.text, probes.p)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def x32_substring_decontam(spark, sf_dir):
    """Exact-substring decontamination (decontam.substring_contaminated_docs):
    training docs containing an eval probe VERBATIM — the canary/verbatim
    complement to x21's shingle overlap. Probes here are 12-char prefixes
    of the eval docs (the longest slice that actually collides in this
    synthetic corpus — real canaries are longer; probes shorter than 12
    chars are dropped so no trivially-matching probe survives); the probe
    list broadcasts and the corpus side is map-only."""
    docs = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    probes = (
        docs.filter(is_eval)
        .select(F.substring("text", 1, 12).alias("probe"))
        .filter(F.length("probe") >= 12)
    )
    return decontam.substring_contaminated_docs(
        docs.filter(~is_eval), probes, "doc_id", "text"
    ).orderBy("doc_id")


@query(
    "x34_unigram_logprob",
    oracle="""
    WITH term AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS cnt FROM term GROUP BY token),
    tot AS (SELECT count(*) AS n_total FROM term)
    SELECT doc_id, count(*) AS n_tokens,
           round(CAST(sum(CAST(ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))
                          AS DECIMAL(27,18))) AS DOUBLE) / count(*), 9)
             AS avg_logprob
    FROM term JOIN freq USING (token) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def x34_unigram_logprob(spark, sf_dir):
    """Mean unigram log-probability per document under the corpus's own
    unigram distribution (ngrams.unigram_logprob) — the KenLM-shaped
    fluency score. Per-token ln is a per-row double (x17 precedent for
    cross-engine bit-equality); the per-doc mean sums decimal(27,18)
    casts so accumulation is exact and order-independent."""
    from ...operators.ngrams import unigram_logprob

    return unigram_logprob(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    ).orderBy("doc_id")


@query(
    "x38_contamination_score",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE {_DUCK_EVAL}),
    tr AS (SELECT doc_id, sh FROM sh WHERE NOT ({_DUCK_EVAL})),
    hits AS (
      SELECT t.doc_id, count(*) AS n_hits
      FROM (SELECT doc_id, unnest(sh) AS s FROM tr) t JOIN ev USING (s)
      GROUP BY t.doc_id
    )
    SELECT tr.doc_id, len(tr.sh)::BIGINT AS n_shingles,
           coalesce(hits.n_hits, 0)::BIGINT AS n_hits,
           round(CASE WHEN len(tr.sh) > 0
                      THEN coalesce(hits.n_hits, 0)::DOUBLE / len(tr.sh)
                      ELSE 0.0 END, 6) AS overlap
    FROM tr LEFT JOIN hits USING (doc_id) ORDER BY doc_id
    """,
)
def x38_contamination_score(spark, sf_dir):
    """Graded contamination report (decontam.contamination_score): for
    EVERY training doc, the fraction of its distinct 3-shingles found
    anywhere in the benchmark — the threshold-sweep complement of x21's
    boolean membership (GPT-3 appendix-C-style overlap analysis). Same
    broadcast-probe plan discipline: the corpus never shuffles for the
    probe; only the hit groupBy and the id join-back exchange corpus
    keys."""
    docs = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return decontam.contamination_score(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text", k=3
    ).orderBy("doc_id")


@query(
    "x41_novelty_score",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    e AS (
      SELECT doc_id, md5(s) AS d
      FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
    ),
    c AS (SELECT d FROM e GROUP BY d HAVING count(*) >= 2),
    hits AS (
      SELECT e.doc_id, count(*) AS n_common
      FROM e JOIN c USING (d) GROUP BY e.doc_id
    )
    SELECT sh.doc_id, len(sh.sh)::BIGINT AS n_shingles,
           coalesce(hits.n_common, 0)::BIGINT AS n_common,
           round(CASE WHEN len(sh.sh) > 0
                      THEN 1.0 - coalesce(hits.n_common, 0)::DOUBLE / len(sh.sh)
                      ELSE 1.0 END, 6) AS novelty
    FROM sh LEFT JOIN hits USING (doc_id) ORDER BY doc_id
    """,
)
def x41_novelty_score(spark, sf_dir):
    """Cross-corpus novelty (ngrams.novelty_score): the share of each
    doc's distinct 3-shingles appearing in NO other document — graded
    boilerplate detection, the document-level cousin of x36's span dedup
    (x36 removes the shared spans; this flags the docs that are mostly
    shared). Digest-keyed: the doc-frequency groupBy, the common-shingle
    join, and the per-doc rollup all exchange 16-byte md5 keys."""
    from ...operators.ngrams import novelty_score

    return novelty_score(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=3, min_df=2
    ).orderBy("doc_id")


def _x42_oracle() -> str:
    g = tx.duck_gopher_exprs("text")
    cols = ", ".join(
        [
            f"{g['n_words']}::BIGINT AS n_words",
            f"round({g['mean_word_len']}, 6) AS mean_word_len",
            f"round({g['symbol_ratio']}, 6) AS symbol_ratio",
            f"round({g['alpha_ratio']}, 6) AS alpha_ratio",
            f"{g['n_stop_distinct']}::BIGINT AS n_stop_distinct",
        ]
        + [
            f"{g[k]} AS {k}"
            for k in (
                "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
                "ok_alpha_ratio", "ok_stopwords",
            )
        ]
        + [f"{g['keep']} AS keep"]
    )
    return f"SELECT doc_id, {cols} FROM documents ORDER BY doc_id"


@query("x42_gopher_rules", oracle=_x42_oracle())
def x42_gopher_rules(spark, sf_dir):
    """Gopher/MassiveText heuristic rule gate (Rae et al. 2021 §A1.1, the
    non-repetition set — the repetition pair is x22): per document, the
    raw signals (word count, mean word length, symbol-to-word ratio,
    alphabetic-word ratio, distinct stopwords), one pass/fail flag per
    rule, and the conjunctive keep decision. Thresholds live in ONE table
    (functions.text.GOPHER_THRESHOLDS) read by both the Spark flags and
    the DuckDB mirror. Pure Column expressions — map-only, zero shuffles;
    at 100 TB this is scan-speed and the filter pushes into the same stage
    as the parquet read."""
    m = tx.gopher_metrics("text")
    flags = tx.gopher_flags(m)
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            m["n_words"].alias("n_words"),
            F.round(m["mean_word_len"], 6).alias("mean_word_len"),
            F.round(m["symbol_ratio"], 6).alias("symbol_ratio"),
            F.round(m["alpha_ratio"], 6).alias("alpha_ratio"),
            m["n_stop_distinct"].alias("n_stop_distinct"),
            *[c.alias(k) for k, c in flags.items()],
            tx.gopher_keep(flags).alias("keep"),
        )
        .orderBy("doc_id")
    )


@query(
    "x45_split_leakage",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING jaccard >= 0.3
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN {duck_hash_bucket('doc_id')} < 80 THEN 'train'
                  WHEN {duck_hash_bucket('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
    FROM pairs p
    JOIN sp sa ON p.id_a = sa.doc_id
    JOIN sp sb ON p.id_b = sb.doc_id
    WHERE sa.split != sb.split
    ORDER BY id_a, id_b
    """,
)
def x45_split_leakage(spark, sf_dir):
    """Cross-split leakage guard (decontam.split_leakage): near-duplicate
    pairs (word-3-shingle Jaccard ≥ 0.3, the x04 pair engine) whose
    members landed in DIFFERENT train/val/test splits under the canonical
    hash split (x14) — exactly the pairs that inflate eval scores if left
    in place. Pair generation is the one shingle-key shuffle; the split
    join-back touches only pair ids. The pair frame is the
    SESSION-SHARED x04 graph (shared_jaccard_pairs — identical k=3 /
    t=0.3 params), so the shingle-key shuffle runs once per session
    across the pair-graph family."""
    from ...operators.sampling import split_assign
    from ._shared import shared_jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    return decontam.split_leakage(
        docs, "doc_id", "text",
        split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
        k=3, threshold=0.3,
        pairs=shared_jaccard_pairs(spark, sf_dir),
    ).orderBy("id_a", "id_b")


@query(
    "x50_source_overlap",
    oracle="""
    WITH sh AS (
      SELECT source,
             list_distinct([array_to_string(ws[i:i+7], ' ')
                            for i in range(1, len(ws) - 6)]) AS sh
      FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
    ),
    d AS (SELECT DISTINCT md5(unnest(sh)) AS dg, source FROM sh)
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS n_shared
    FROM d a JOIN d b ON a.dg = b.dg AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def x50_source_overlap(spark, sf_dir):
    """Inter-source CONTENT-overlap matrix: for every source pair, how
    many distinct 8-token spans occur in BOTH — the diagnostic that
    catches one crawl mirroring or templating another below full-document
    granularity (whole-doc digests find literally zero cross-source dups
    on this corpus at sf0.01 — span granularity is what makes the matrix
    informative; same reasoning as x36's passage dedup). Digest-keyed:
    spans reduce to 16-byte md5s before the one self-join exchange;
    output is bounded by the source-pair count, never the corpus."""
    from ...operators.ngrams import source_span_overlap

    return source_span_overlap(
        table(spark, sf_dir, "documents"), "source", "text", k=8
    ).orderBy("source_a", "source_b")


def _x53_oracle() -> str:
    scores = tx.duck_lang_scores("text")
    cols = ", ".join(f"{e} AS s_{lang}" for lang, e in scores.items())
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in scores) + ")"
    whens = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in scores)
    return f"""
    WITH scored AS (SELECT lang, {cols} FROM documents),
    pred AS (
      SELECT lang,
             CASE WHEN best <= 0 THEN 'und' {whens} ELSE 'und' END AS lang_pred
      FROM (SELECT *, {best} AS best FROM scored)
    )
    SELECT lang, lang_pred, count(*) AS n
    FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """


@query("x53_langid_confusion", oracle=_x53_oracle())
def x53_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the x07 classifier evaluated against
    the corpus's ground-truth labels — the calibration pass that decides
    whether per-language gates (x30's quality bars, x48's mixture
    schedule) can trust the predictor. Map-only scoring + one groupBy on
    the bounded (lang, lang_pred) key."""
    df = table(spark, sf_dir, "documents")
    return (
        df.select("lang", tx.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


@query(
    "x54_fertility",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
           round(CAST(sum(length(text)) AS DOUBLE)
                 / sum(len(string_split(text, ' '))), 6) AS chars_per_word,
           round(CAST(sum(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) )
                      AS DOUBLE)
                 / sum(len(string_split(text, ' '))), 6) AS bpe_per_word
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def x54_fertility(spark, sf_dir):
    """Per-language tokenizer-fertility report: characters and BPE-ish
    tokens per whitespace word — the numbers that convert a per-language
    token budget into document counts (high-fertility languages consume
    budget faster; the mixture planner, x33/x48, needs this to weigh
    sources in TOKENS rather than docs). Integer sums are exact under any
    partitioning; one groupBy on the bounded language key."""
    from ...functions.text import bpe_ish_token_count, tokens

    df = table(spark, sf_dir, "documents")
    n_words = F.size(tokens("text"))
    n_bpe = bpe_ish_token_count("text")
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
            F.sum(n_words).alias("n_words"),
            F.round(
                F.sum(F.length("text")).cast("double") / F.sum(n_words), 6
            ).alias("chars_per_word"),
            F.round(F.sum(n_bpe).cast("double") / F.sum(n_words), 6).alias(
                "bpe_per_word"
            ),
        )
        .orderBy("lang")
    )


_BM25_TERMS = ["spark", "window", "hash", "merge"]


from ...operators.retrieval import duck_bm25_sql  # noqa: E402


@query(
    "x57_bm25",
    oracle=(
        "SELECT * FROM ("
        + duck_bm25_sql("documents", "doc_id", "text", _BM25_TERMS)
        + ") ORDER BY bm25 DESC, doc_id LIMIT 100"
    ),
)
def x57_bm25(spark, sf_dir):
    """Okapi BM25 keyword scoring (retrieval.bm25_scores) for a 4-term
    query over the documents table — the lexical retrieval arm beside the
    embedding ANN family. Query terms broadcast into the token explode as
    an isin prune (the corpus never shuffles); df/N/avgdl are bounded
    broadcast aggregates; contributions round-12 → decimal-sum → round-9
    (the x34 float discipline), so the score hash-matches DuckDB."""
    from ...operators.retrieval import bm25_scores

    docs = table(spark, sf_dir, "documents")
    return bm25_scores(
        docs, "doc_id", "text", _BM25_TERMS
    ).orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(100)


from ...operators.ngrams import duck_bigram_logprob_sql  # noqa: E402


@query(
    "x60_bigram_logprob",
    oracle=(
        "SELECT * FROM ("
        + duck_bigram_logprob_sql("documents", "doc_id", "text", lam=0.7)
        + ") ORDER BY doc_id"
    ),
)
def x60_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM fluency (ngrams.bigram_logprob, λ=0.7
    Jelinek-Mercer): per-doc mean ln(λ·p̂(w₂|w₁) + (1−λ)·p̂(w₂)) — the
    word-ORDER-sensitive upgrade of x34's unigram score. One explode into
    distinct (doc, bigram) pairs (the x34 fused discipline), a bigram-
    keyed model exchange, vocabulary-bounded broadcast unigram backoff;
    round-12/decimal/round-9 float parity with the DuckDB mirror."""
    from ...operators.ngrams import bigram_logprob

    docs = table(spark, sf_dir, "documents")
    return bigram_logprob(docs, "doc_id", "text", lam=0.7).orderBy("doc_id")


_X74_Q = f"""
      SELECT doc_id, lang,
             0.4 * least(len(ws) / 100.0, 1.0)
               + 0.3 * (1.0 - len(list_filter(ws, w -> w IN ({_DUCK_STOP})))
                              / len(ws))
               + 0.3 * least((length(text) - (len(ws) - 1)) / len(ws) / 10.0,
                             1.0) AS q
      FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS ws
            FROM documents)
"""


@query(
    "x74_quality_calibration",
    oracle=f"""
    WITH q AS ({_X74_Q})
    SELECT CAST(least(floor(q * 10), 9) AS INTEGER) AS decile,
           count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
           round(CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE)
                 / count(*), 9) AS share_en
    FROM q GROUP BY 1 ORDER BY decile
    """,
)
def x74_quality_calibration(spark, sf_dir):
    """Quality-score CALIBRATION (reliability) curve: docs bucketed by
    score decile, and per decile the share whose ground-truth ``lang``
    label is 'en' — the sanity check that a heuristic quality score is
    MONOTONE in something you can actually verify before it gates
    terabytes (the same fixed-width-band trick as x63: data-independent
    deciles keep the report a pure per-row map + one bounded groupBy;
    data-fit deciles would need a global rank). The score expression is
    bit-identical cross-engine (x08), so the decile assignment and the
    share divide (one fixed double op order) hash-match."""
    docs = table(spark, sf_dir, "documents")
    q = tx.quality_score("text")
    decile = F.least(F.floor(q * 10), F.lit(9)).cast("int")
    is_en = F.col("lang") == "en"
    return (
        docs.select(decile.alias("decile"), "lang")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(is_en, 1)).alias("n_en"),
            F.round(
                F.count(F.when(is_en, 1)).cast("double") / F.count(F.lit(1)),
                9,
            ).alias("share_en"),
        )
        .orderBy("decile")
    )


_X76_EVAL_LIST = f"""SELECT list(DISTINCT s) FROM (
      SELECT unnest({_DUCK_SHINGLES}) AS s
      FROM (SELECT string_split(text, ' ') AS ws FROM documents
            WHERE {_DUCK_EVAL}))"""


@query(
    "x76_decontam_scrub",
    oracle=decontam.duck_scrub_spans_sql(
        f"(SELECT * FROM documents WHERE NOT ({_DUCK_EVAL}))",
        "doc_id",
        "text",
        _X76_EVAL_LIST,
    ),
)
def x76_decontam_scrub(spark, sf_dir):
    """SPAN-LEVEL decontamination (decontam.scrub_contaminated_spans):
    instead of dropping a leaked training doc (x21), surgically remove
    exactly the tokens covered by a benchmark 3-shingle and keep the
    rest — the treatment for long documents that quote one eval question
    but carry mostly clean text. The benchmark shingle set is fit once
    (bounded — the x32 collected-probe argument) and frozen into a pure
    per-row array-surgery expression: no explode, no join, no state
    (streaming-safe like the x21 frozen form). Output: every train doc
    with its scrubbed text and removed-token count."""
    from ...operators.decontam import (
        fit_eval_shingles,
        scrub_contaminated_spans,
    )

    docs = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    shingles = fit_eval_shingles(docs.filter(is_eval), "text")
    return scrub_contaminated_spans(
        docs.filter(~is_eval), "doc_id", "text", shingles
    ).orderBy("doc_id")


@query(
    "x88_eval_coverage",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    tr AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE NOT ({_DUCK_EVAL})),
    ev AS (SELECT doc_id, sh FROM sh WHERE {_DUCK_EVAL}),
    hits AS (
      SELECT e.doc_id, count(*) AS n_covered
      FROM (SELECT doc_id, unnest(sh) AS s FROM ev) e JOIN tr USING (s)
      GROUP BY e.doc_id
    )
    SELECT ev.doc_id, len(ev.sh)::BIGINT AS n_shingles,
           coalesce(hits.n_covered, 0)::BIGINT AS n_covered,
           round(CASE WHEN len(ev.sh) > 0
                      THEN coalesce(hits.n_covered, 0)::DOUBLE / len(ev.sh)
                      ELSE 0.0 END, 6) AS coverage
    FROM ev LEFT JOIN hits USING (doc_id) ORDER BY ev.doc_id
    """,
)
def x88_eval_coverage(spark, sf_dir):
    """Per-benchmark-item leakage report (decontam.eval_coverage): the
    REVERSE of x38 — for every EVAL doc, the fraction of its distinct
    3-shingles found anywhere in the training corpus, the number that
    decides whether a benchmark is still trustworthy after a crawl.
    The corpus side reduces to distinct 16-byte shingle digests before
    the digest-keyed semi-join (text never shuffles); per-item work is
    bounded by the eval set."""
    docs = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return decontam.eval_coverage(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text", k=3
    ).orderBy("doc_id")


from ...operators.ngrams import duck_pmi_collocations_sql  # noqa: E402


@query(
    "x95_pmi_collocations",
    oracle=duck_pmi_collocations_sql("documents", "text", min_count=5, top_k=50),
)
def x95_pmi_collocations(spark, sf_dir):
    """Phrase mining by pointwise mutual information
    (ngrams.pmi_collocations, min_count=5): top-50 adjacent-word pairs
    whose co-occurrence beats chance — the collocation pass that feeds
    tokenizer merges and boilerplate-phrase curation, completing the
    n-gram family (x27 counts frequency, x34/x60 score fluency, this
    ranks ASSOCIATION). Per-row zip_with bigrams, ONE bigram-keyed
    exchange, min_count floor BEFORE the vocabulary-bounded broadcast
    unigram joins, TakeOrdered top-k; single fixed-order ln expression
    + round-9 for float parity with the DuckDB mirror."""
    from ...operators.ngrams import pmi_collocations

    docs = table(spark, sf_dir, "documents")
    return pmi_collocations(docs, "doc_id", "text", min_count=5, top_k=50)


from ...operators.ngrams import duck_bpe_merge_candidates_sql  # noqa: E402


@query(
    "x99_bpe_merge_candidates",
    oracle=duck_bpe_merge_candidates_sql("documents", "text", top_k=50),
)
def x99_bpe_merge_candidates(spark, sf_dir):
    """First-iteration BPE merge table (ngrams.bpe_merge_candidates):
    top-50 adjacent character pairs by corpus frequency — the pair-count
    table tokenizer training computes before its first merge, and the
    head-vs-tail shape a vocab-size decision reads. The scale reduction
    is the point: ONE corpus exchange folds text to the (word, count)
    vocabulary, the pair explode runs over the VOCAB (not corpus
    tokens), and the final groupBy is ≤ alphabet² keys; integer counts
    end-to-end, deterministic (count DESC, pair) tie-break."""
    from ...operators.ngrams import bpe_merge_candidates

    docs = table(spark, sf_dir, "documents")
    return bpe_merge_candidates(docs, "text", top_k=50)


from ...operators.ngrams import duck_bpe_train_sql  # noqa: E402


@query(
    "x168_bpe_train",
    oracle=duck_bpe_train_sql("documents", "text", n_merges=4),
)
def x168_bpe_train(spark, sf_dir):
    """The FULL BPE merge loop (r11 verdict Next #6 — x99 priced one
    iteration; this trains the tokenizer): four merges over the
    documents corpus, each recounting adjacent symbol pairs on the
    FOLDED vocabulary, choosing the most frequent pair ((count DESC,
    lhs, rhs) tie-break), and applying the merge to every vocab word
    via the shared string-fold (ngrams._bpe_merge_col — greedy
    left-to-right, non-overlapping by construction). Output = the
    merge table a tokenizer ships. The oracle unrolls the identical
    loop as a v0→(p_i, b_i, v_i) CTE chain with DuckDB's list_reduce
    running symbol-for-symbol the same fold. Scale: ONE corpus
    exchange to the vocab; each of the N iterations is vocab-bounded
    (pair explode over distinct words, alphabet²-ish count, LIMIT-1
    collect, map-only merge) — never a corpus-scale explode."""
    from ...operators.ngrams import bpe_train

    docs = table(spark, sf_dir, "documents")
    return bpe_train(docs, "text", n_merges=4)


from ...operators.ngrams import duck_bpe_tokenize_sql  # noqa: E402


@query(
    "x171_bpe_tokenize",
    oracle=duck_bpe_tokenize_sql("documents", "text", n_merges=4, top_k=50),
)
def x171_bpe_tokenize(spark, sf_dir):
    """APPLY the trained merges — the tokenizer loop's serving half
    (x168 trains; this tokenizes): after four merges, the 50 most
    frequent words with their post-merge token count and the joined
    token stream. The APPLY is vocab-folded — tokenizing never
    re-touches corpus text, because every occurrence of a word shares
    its vocabulary row; reconstructing per-doc token streams is then
    the x54 fertility join. The oracle reads the SAME unrolled CTE
    chain as x168 at its final folded vocabulary v4, so the hash
    certifies the merge application itself (greedy, non-overlapping,
    composed symbols) word for word, token for token."""
    from ...operators.ngrams import bpe_tokenize

    docs = table(spark, sf_dir, "documents")
    return bpe_tokenize(docs, "text", n_merges=4, top_k=50)


from ...operators.ngrams import duck_bpe_fertility_sql  # noqa: E402


@query(
    "x172_bpe_fertility",
    oracle=duck_bpe_fertility_sql("documents", "source", "text", n_merges=4),
)
def x172_bpe_fertility(spark, sf_dir):
    """Per-source fertility under the CORPUS-TRAINED tokenizer
    (ngrams.bpe_fertility): tokens per word once the four x168 merges
    apply — the mixture-design signal for which sources the tokenizer
    serves badly (high fertility = more sequence length per byte =
    more training compute for that source). x54 measures fertility
    under a fixed heuristic tokenizer; this one closes the loop with
    the tokenizer the corpus itself trains. Exact integer sums; one
    division per source at the edge; the corpus is read twice total
    (vocab fold + per-source counts), never per merge."""
    from ...operators.ngrams import bpe_fertility

    docs = table(spark, sf_dir, "documents")
    return bpe_fertility(docs, "source", "text", n_merges=4)


@query(
    "x173_bloom_decontam",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE {_DUCK_EVAL}),
    tr AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE NOT ({_DUCK_EVAL}))
    SELECT tr.doc_id, count(*) AS n_hits
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    ORDER BY doc_id
    """,
)
def x173_bloom_decontam(spark, sf_dir):
    """Bloom-prescreened decontamination
    (decontam.bloom_contaminated_docs): x21's exact answer — the oracle
    IS x21's SQL, because a Bloom filter has no false negatives and the
    exact verification join kills its false positives — produced by the
    two-phase membership discipline 100 TB demands: the benchmark's
    shingle set compresses to a FIXED-size xxhash64 bit array (~10
    bits/shingle, ~1% FPR) broadcast as one row, the prescreen is k
    codegen'd hash probes on the corpus scan (map-only, no join), and
    only might-contain survivors reach the exact broadcast join. Where
    x21's broadcast grows with the benchmark's vocabulary, this one is
    ~1.25 MB per million shingles, fixed."""
    docs = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return decontam.bloom_contaminated_docs(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text", k=3
    ).orderBy("doc_id")


_X101_Q = f"""
      SELECT source, doc_id,
             0.4 * least(len(ws) / 100.0, 1.0)
               + 0.3 * (1.0 - len(list_filter(ws, w -> w IN ({_DUCK_STOP})))
                              / len(ws))
               + 0.3 * least((length(text) - (len(ws) - 1)) / len(ws) / 10.0,
                             1.0) AS q
      FROM (SELECT source, doc_id, text, string_split(text, ' ') AS ws
            FROM documents)
"""


@query(
    "x101_trimmed_quality",
    oracle=f"""
    WITH q AS ({_X101_Q}),
    r AS (SELECT source, doc_id,
                 CAST(round(q, 12) AS DECIMAL(27,18)) AS v FROM q),
    ranked AS (
      SELECT source, v,
             row_number() OVER (PARTITION BY source ORDER BY v, doc_id)
               AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM r
    )
    SELECT source, count(*) AS n_docs,
           min(CAST(floor(n * 0.05) AS INTEGER)) AS n_trimmed_each,
           round(CAST(sum(v) FILTER (WHERE rn > floor(n * 0.05)
                                       AND rn <= n - floor(n * 0.05))
                      AS DOUBLE)
                 / CAST(count(*) FILTER (WHERE rn > floor(n * 0.05)
                                           AND rn <= n - floor(n * 0.05))
                        AS DOUBLE), 9) AS trimmed_mean,
           round(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE), 9)
             AS raw_mean
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def x101_trimmed_quality(spark, sf_dir):
    """Per-source trimmed-mean quality (profile.trimmed_group_mean over
    x08's composite score): drop each source's 5% lowest- and
    highest-scoring docs by EXACT rank (ties to doc_id — a total order,
    so the trimmed set is deterministic, unlike percentile-interpolation
    winsorizing whose cut value is engine-specific) and average the
    rest — the robust source-health number a curation dashboard should
    track instead of the raw mean a few spam stubs can drag. One
    source-keyed exchange + per-group window; decimal-exact sums,
    round-9."""
    from ...operators.profile import trimmed_group_mean

    docs = table(spark, sf_dir, "documents")
    return trimmed_group_mean(
        docs, "source", tx.quality_score("text"), "doc_id", trim_frac=0.05
    ).orderBy("source")


@query(
    "x107_token_budget_curve",
    oracle=f"""
    WITH q AS ({_X101_Q}),
    toks AS (
      SELECT CAST(least(floor(q.q * 10), 9) AS INTEGER) AS decile,
             len(string_split(d.text, ' ')) AS n_toks
      FROM q JOIN documents d USING (doc_id)
    ),
    per AS (
      SELECT decile, count(*) AS _d, CAST(sum(n_toks) AS BIGINT) AS _t
      FROM toks GROUP BY decile
    ),
    tot AS (SELECT CAST(sum(_t) AS BIGINT) AS _tt FROM per),
    cum AS (
      SELECT decile,
             CAST(sum(_d) OVER (ORDER BY decile DESC) AS BIGINT)
               AS n_docs_kept,
             CAST(sum(_t) OVER (ORDER BY decile DESC) AS BIGINT)
               AS n_tokens_kept
      FROM per
    )
    SELECT round(decile / 10.0, 1) AS threshold, n_docs_kept,
           n_tokens_kept,
           round(CAST(n_tokens_kept AS DOUBLE) / CAST(tot._tt AS DOUBLE), 9)
             AS frac_tokens
    FROM cum CROSS JOIN tot ORDER BY threshold
    """,
)
def x107_token_budget_curve(spark, sf_dir):
    """Token-budget curve over the quality bar: for each score decile
    threshold, how many documents and TOKENS survive "keep score ≥ t" —
    the trade-off curve a curation decision actually reads (x74 says
    what's IN each decile, x30 selects a top quantile; this prices the
    bar in tokens, the unit training budgets are written in). ONE
    corpus pass folds (decile → docs, tokens) into a ≤ 10-row frame;
    the survival curve is a reverse cumulative sum over that bounded
    frame. Integer counts; the only float is the final fraction
    (exact-int ratio, round-9)."""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    decile = F.least(
        F.floor(tx.quality_score("text") * 10), F.lit(9)
    ).cast("int")
    per = (
        docs.select(
            decile.alias("decile"),
            F.size(tx.tokens("text")).alias("_nt"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("_d"),
            F.sum("_nt").alias("_t"),
        )
    )
    tot = per.groupBy().agg(F.sum("_t").alias("_tt"))
    w = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.select(
            "decile",
            F.sum("_d").over(w).alias("n_docs_kept"),
            F.sum("_t").over(w).alias("n_tokens_kept"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(F.col("decile") / 10.0, 1).alias("threshold"),
            "n_docs_kept",
            "n_tokens_kept",
            F.round(
                F.col("n_tokens_kept").cast("double")
                / F.col("_tt").cast("double"),
                9,
            ).alias("frac_tokens"),
        )
        .orderBy("threshold")
    )


from ...operators.ngrams import duck_js_divergence_sql  # noqa: E402


@query(
    "x112_js_divergence",
    oracle=duck_js_divergence_sql("documents", "source", "text"),
)
def x112_js_divergence(spark, sf_dir):
    """Pairwise Jensen–Shannon divergence between source unigram
    distributions (ngrams.js_divergence_matrix) — the domain-DISTANCE
    matrix beside the content-overlap matrices (x87 sketch overlap,
    x50 span containment): symmetric, bounded [0, ln 2] nats, defined
    for disjoint vocabularies. The mixture-design read: sources with
    near-zero JS are interchangeable for sampling weights; a source
    whose JS to every other source is high is the diversity the mix
    must protect. ONE (source, token) exchange to the vocab-bounded
    count frame, the pair join on that frame (≤ sources² discipline),
    totals broadcast; intersection decomposition keeps missing-token
    mass exact (BIGINT ratios · a shared ln 2 literal); round-12 →
    decimal(27,18) term sums, round-9 output — fully hash-checked."""
    from ...operators.ngrams import js_divergence_matrix

    docs = table(spark, sf_dir, "documents")
    return js_divergence_matrix(docs, "source", "text")


from ...operators.ngrams import duck_source_kl_sql  # noqa: E402


@query(
    "x114_source_kl",
    oracle=duck_source_kl_sql("documents", "source", "text"),
)
def x114_source_kl(spark, sf_dir):
    """Per-source KL divergence to the corpus unigram distribution
    (ngrams.source_kl_to_corpus) — the asymmetric companion to x112's
    pairwise JS matrix, and the mix-design read beside x31/x33/x48: a
    source with high KL to the blend is the one the mixture
    under-serves (its tokens are rare in the mix), the signal a
    temperature/rebalance pass uses to protect diversity. Always
    defined (the corpus distribution dominates every source's — no
    smoothing), ONE (source, token) exchange, corpus stats are the same
    frame re-aggregated, totals broadcast; round-12 → decimal term
    sums, round-9 output — fully hash-checked."""
    from ...operators.ngrams import source_kl_to_corpus

    docs = table(spark, sf_dir, "documents")
    return source_kl_to_corpus(docs, "source", "text")


from ...operators.ngrams import duck_moore_lewis_sql, moore_lewis_score  # noqa: E402


@query(
    "x122_moore_lewis",
    oracle=duck_moore_lewis_sql(
        "documents", "doc_id", "text", "source IN ('src0', 'src1')"
    ),
)
def x122_moore_lewis(spark, sf_dir):
    """Moore–Lewis cross-entropy difference selection
    (ngrams.moore_lewis_score — Moore & Lewis, ACL 2010): per-doc mean
    ln(p_in/p_all) under add-0.5-smoothed unigram models, the in-domain
    seed being sources src0/src1 (~10% of the corpus). The EXACT
    unigram form of the selection family x43's DSIR approximates with
    hashed features — rank by ml_score, keep the top slice. One
    explode, one token-keyed model exchange computing BOTH models, a
    1-row totals broadcast, doc-distinct scoring join (x34's fused
    Zipf-skew shape)."""
    return moore_lewis_score(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        F.col("source").isin("src0", "src1"),
    ).orderBy("doc_id")


from ...operators.ngrams import (  # noqa: E402
    distinct_ngram_diversity,
    duck_distinct_ngram_diversity_sql,
)


@query(
    "x132_distinct_ngrams",
    oracle=duck_distinct_ngram_diversity_sql("documents", "source", "text"),
)
def x132_distinct_ngrams(spark, sf_dir):
    """Per-source distinct-1/distinct-2 diversity (ngrams.
    distinct_ngram_diversity — Li et al. 2016): the mode-collapse /
    template gauge for synthetic or scraped sources; exact distinct on
    the (source, gram) exchange, ≤|sources| output."""
    return distinct_ngram_diversity(
        table(spark, sf_dir, "documents"), "source", "text"
    )


def _x133_oracle() -> str:
    sym, kw, score = tx.duck_code_likeness_sql("text")
    return f"""
    SELECT doc_id, {sym} AS symbol_count, {kw} AS kw_hits,
           {score} AS code_score
    FROM documents ORDER BY doc_id
    """


@query("x133_code_likeness", oracle=_x133_oracle())
def x133_code_likeness(spark, sf_dir):
    """Heuristic code/text separation signal (functions.text
    .code_likeness — the routing gate Stack-style mixed-crawl pipelines
    apply before language-specific cleaning): symbol-character density
    + distinct keyword hits blended to [0,1]. Exact integer counts via
    per-character length differences, one IEEE division per term —
    pure map-only Column arithmetic, zero shuffles before the
    presentation sort."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.code_symbol_count("text").alias("symbol_count"),
        tx.code_keyword_hits("text").alias("kw_hits"),
        tx.code_likeness("text").alias("code_score"),
    ).orderBy("doc_id")


def _x156_oracle() -> str:
    p = tx.duck_sentiment_parts("text")
    pol = (
        f"CASE WHEN {p['n_words']} > 0 THEN "
        f"CAST({p['n_pos']} - {p['n_neg']} AS DOUBLE)"
        f" / CAST({p['n_words']} AS DOUBLE) ELSE 0.0 END"
    )
    return f"""
    WITH s AS (
      SELECT source, doc_id,
             CAST({p['n_pos']} AS BIGINT) AS n_pos,
             CAST({p['n_neg']} AS BIGINT) AS n_neg,
             {pol} AS _pol
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_pos) AS BIGINT) AS pos_tokens,
           CAST(sum(n_neg) AS BIGINT) AS neg_tokens,
           round(CAST(sum(CAST(round(_pol, 12) AS DECIMAL(27,18)))
                      AS DOUBLE) / count(*), 9) AS mean_polarity,
           CAST(sum(CASE WHEN _pol > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive_docs,
           CAST(sum(CASE WHEN _pol < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative_docs
    FROM s GROUP BY source ORDER BY source
    """


@query("x156_sentiment_profile", oracle=_x156_oracle())
def x156_sentiment_profile(spark, sf_dir):
    """Per-source SENTIMENT profile (functions/text.sentiment_metrics —
    the SURVEY §7 phase-5 "sentiment-style" analyzer as pure column
    expressions over an embedded lexicon, no UDF): token polarity
    counts, decimal-accumulated mean polarity, and per-sign doc counts.
    The tone dimension of the x55 data card a content-mix owner reads
    next to quality/code-rate. Map-only scan into a ≤|sources| agg;
    the lexicon rides the expression tree (IN-list, codegen-side)."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    m = tx.sentiment_metrics("text")
    s = docs.select(
        "source",
        m["n_pos"].alias("_np"),
        m["n_neg"].alias("_nn"),
        m["polarity"].alias("_pol"),
    )
    agg = s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_np").alias("pos_tokens"),
        F.sum("_nn").alias("neg_tokens"),
        F.sum(
            F.round(F.col("_pol"), 12).cast("decimal(27,18)")
        ).alias("_s"),
        F.sum(F.when(F.col("_pol") > 0, 1).otherwise(0)).alias(
            "n_positive_docs"
        ),
        F.sum(F.when(F.col("_pol") < 0, 1).otherwise(0)).alias(
            "n_negative_docs"
        ),
    )
    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("pos_tokens").cast("bigint").alias("pos_tokens"),
        F.col("neg_tokens").cast("bigint").alias("neg_tokens"),
        F.round(
            F.col("_s").cast("double") / F.col("n_docs").cast("double"), 9
        ).alias("mean_polarity"),
        F.col("n_positive_docs").cast("bigint").alias("n_positive_docs"),
        F.col("n_negative_docs").cast("bigint").alias("n_negative_docs"),
    ).orderBy("source")
