"""x-series, sampling/packing family: train/test split, stratified /
weighted / temperature sampling, quality bars, mixture rebalance, epoch
upsampling, DSIR, token budgets, source caps, epoch & curriculum order,
chunking, packing, data cards."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ...catalog import table  # noqa: F401
from ...functions import text as tx  # noqa: F401
from ...functions import vectors  # noqa: F401
from ...operators import decontam, dedup, multimodal, similarity  # noqa: F401
from .. import query  # noqa: F401
from ...operators.sampling import (  # noqa: F401
    duck_hash_bucket,
    duck_weighted_reservoir_sql,
    weighted_reservoir,
)
from ._shared import _DUCK_SHINGLES, _DUCK_STOP, _EMB_DIM  # noqa: F401


@query(
    "x14_train_test_split",
    oracle=f"""
    SELECT split, count(*) AS n, min(doc_id) AS first_doc
    FROM (
      SELECT doc_id,
             CASE WHEN {duck_hash_bucket('doc_id')} < 80 THEN 'train'
                  WHEN {duck_hash_bucket('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) GROUP BY split ORDER BY split
    """,
)
def x14_train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split via md5 hash buckets —
    a pure function of the key, invariant to partitioning, run order, and
    engine (df.sample would be none of these)."""
    from ...operators.sampling import split_assign

    docs = table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id", split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    return (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("first_doc"))
        .orderBy("split")
    )


@query(
    "x16_stratified_sample",
    oracle="""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20 ORDER BY lang, doc_id
    """,
)
def x16_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: exactly 20 docs per language,
    chosen by md5-hash order — a pure function of the keys (stable across
    engines, partitionings, and runs; df.sampleBy is none of these)."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        table(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


@query(
    "x24_chunk_documents",
    oracle="""
    WITH w AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    c AS MATERIALIZED (
      SELECT doc_id, ws,
             CAST(ceil(greatest(len(ws) - 64, 0) / 48.0) AS INT) + 1 AS n_chunks
      FROM w
    ),
    e AS (
      SELECT doc_id, unnest(generate_series(1, n_chunks)) AS i, ws FROM c
    )
    SELECT doc_id, i - 1 AS chunk_id,
           least(64, len(ws) - (i-1)*48) AS n_tokens,
           array_to_string(list_slice(ws, (i-1)*48 + 1, (i-1)*48 + 64), ' ')
             AS chunk
    FROM e ORDER BY doc_id, chunk_id
    """,
)
def x24_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (operators/chunking.py): 64-token
    windows, stride 48 — every token covered, final window short, one
    chunk for sub-window docs. Pure per-row map + posexplode: zero
    shuffles, linear in corpus size."""
    from ...operators.chunking import chunk_documents

    return chunk_documents(
        table(spark, sf_dir, "documents"), "doc_id", "text", win=64, stride=48
    ).orderBy("doc_id", "chunk_id")


@query(
    "x25_pack_documents",
    oracle=f"""
    WITH s AS MATERIALIZED (
      SELECT doc_id,
             CAST({duck_hash_bucket('doc_id', 64)} AS BIGINT) AS shard,
             len(string_split(text,' ')) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  AS BIGINT) - n_tokens AS "offset"
      FROM s
    )
    SELECT doc_id, shard, CAST(floor("offset" / 2048.0) AS BIGINT) AS pack_id,
           n_tokens, "offset"
    FROM o ORDER BY doc_id
    """,
)
def x25_pack_documents(spark, sf_dir):
    """Concatenate-and-cut context-window packing (operators/chunking.py):
    md5-sharded streams (64 shards — the cumulative offset window
    parallelizes per shard instead of serializing the corpus through one
    global sort), 2048-token cuts, each doc assigned to the pack where it
    starts. Deterministic: shard and order are pure functions of doc_id."""
    from ...operators.chunking import pack_documents

    return pack_documents(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        capacity=2048, n_shards=64,
    ).orderBy("doc_id")


_DUCK_UNIFORM_DOCID = (
    "(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS UBIGINT) AS DOUBLE) / 4294967296.0)"
)


_X28_ORACLE = f"""
    WITH q AS (
      SELECT doc_id,
             0.4 * least(n_words / 100.0, 1.0)
               + 0.3 * (1.0 - stop_ratio)
               + 0.3 * least(mean_word_len / 10.0, 1.0) AS score
      FROM (
        SELECT doc_id,
               len(ws) AS n_words,
               len(list_filter(ws, w -> w IN ({_DUCK_STOP}))) / len(ws)
                 AS stop_ratio,
               (length(text) - (len(ws) - 1)) / len(ws) AS mean_word_len
        FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
              FROM documents)
      )
    )
    SELECT doc_id, score FROM q
    WHERE {_DUCK_UNIFORM_DOCID} < least(score * 0.8, 1.0)
    ORDER BY doc_id
    """


@query("x28_weighted_sample", oracle=_X28_ORACLE)
def x28_weighted_sample(spark, sf_dir):
    """Quality-proportional importance sampling (sampling.weighted_sample):
    keep each document with probability 0.8×quality_score, decided by the
    doc_id's md5-uniform (sampling.hash_uniform ≡ _DUCK_UNIFORM_DOCID) —
    layout/engine-invariant, a pure pushable filter. The weight is x08's
    (hash-verified bit-identical) score, so the acceptance decision is
    reproducible across engines."""
    from ...operators.sampling import weighted_sample

    df = table(spark, sf_dir, "documents").select(
        "doc_id", tx.quality_score("text").alias("score")
    )
    return weighted_sample(df, "doc_id", "score", scale=0.8).orderBy("doc_id")


# --- x29-x31: recurring-crawl dedup, per-stratum quality bar, mix report ---

# "Historical corpus" vs "new crawl batch": deterministic doc_id split
# (~80% historical), identical on both engines.


@query(
    "x30_quality_topq",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             0.4 * least(len(ws) / 100.0, 1.0)
               + 0.3 * (1.0 - len(list_filter(ws, w -> w IN ({_DUCK_STOP}))) / len(ws))
               + 0.3 * least((length(text) - (len(ws) - 1)) / len(ws) / 10.0, 1.0)
               AS score
      FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents)
    )
    SELECT doc_id, lang, score FROM (
      SELECT *, percent_rank() OVER (
        PARTITION BY lang ORDER BY score DESC, doc_id ASC
      ) AS pr FROM scored
    ) WHERE pr <= 0.2
    ORDER BY doc_id
    """,
)
def x30_quality_topq(spark, sf_dir):
    """Per-language quality bar (sampling.top_fraction_per_group): keep
    each language's top 20% by quality score — a SEPARATE bar per
    stratum, the curation move that stops a global cutoff from drowning
    low-resource languages. percent_rank over (score DESC, doc_id ASC)
    is total-ordered, so the kept set is deterministic and
    engine-portable."""
    from ...operators.sampling import top_fraction_per_group

    scored = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tx.quality_score("text").alias("score")
    )
    return top_fraction_per_group(
        scored, "lang", "score", 0.2, "doc_id"
    ).orderBy("doc_id")


@query(
    "x31_source_mix",
    oracle=r"""
    WITH per_src AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             count(DISTINCT md5(text)) AS n_distinct
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share,
           CAST(n_docs - n_distinct AS DOUBLE) / n_docs AS dup_rate
    FROM per_src
    ORDER BY source
    """,
)
def x31_source_mix(spark, sf_dir):
    """Corpus composition report: per-source doc/token counts, each
    source's share of the token budget, and its exact-dup rate — the
    numbers a data-mixture plan is written against. One groupBy on the
    (bounded-cardinality) source key with distinct-digest counting
    map-side; the share is a window over the handful of source rows, so
    the second pass is O(#sources)."""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tx.tokens("text"))).alias("n_tokens"),
        F.count_distinct(F.md5("text")).alias("n_distinct"),
    )
    return (
        per_src.select(
            "source",
            "n_docs",
            "n_tokens",
            (
                F.col("n_tokens").cast("double")
                / F.sum("n_tokens").over(Window.partitionBy())
            ).alias("token_share"),
            (
                (F.col("n_docs") - F.col("n_distinct")).cast("double")
                / F.col("n_docs")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "x33_mix_rebalance",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n FROM documents
    ),
    s AS (SELECT source, CAST(sum(n) AS DOUBLE) AS tok FROM t GROUP BY source),
    r AS (
      SELECT source,
             least(1.0, ((SELECT sum(tok) FROM s) / (SELECT count(*) FROM s))
                          / tok) AS rate
      FROM s
    )
    SELECT t.doc_id, t.source FROM t JOIN r ON t.source = r.source
    WHERE {_DUCK_UNIFORM_DOCID} < rate
    ORDER BY doc_id
    """,
)
def x33_mix_rebalance(spark, sf_dir):
    """Mixture rebalancing (sampling.rebalance_mix): downsample each
    source toward a UNIFORM token budget — oversized sources are thinned
    to the per-source target, undersized ones kept whole. Pass 1 is one
    groupBy on the bounded source key → a broadcast rates table; pass 2
    is a pure per-row hash filter, so the corpus itself never shuffles.
    Acceptance is the doc_id's md5-uniform — deterministic and
    engine-portable (hash-verified here)."""
    from ...operators.sampling import rebalance_mix

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tx.tokens("text")).alias("n")
    )
    return (
        rebalance_mix(docs, "doc_id", "source", "n")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "x40_epoch_upsample",
    oracle=f"""
    WITH t AS (SELECT source, sum(n_chars) AS tok FROM documents GROUP BY source),
    r AS (
      SELECT source,
             2.0 * ((SELECT sum(tok) FROM t)::DOUBLE / (SELECT count(*) FROM t))
                 / tok AS rf
      FROM t
    ),
    j AS (
      SELECT d.doc_id, d.source,
             CAST(floor(r.rf) AS BIGINT)
               + CASE WHEN {_DUCK_UNIFORM_DOCID} < r.rf - floor(r.rf)
                      THEN 1 ELSE 0 END AS n
      FROM documents d JOIN r USING (source)
    )
    SELECT doc_id, source, CAST(unnest(range(1, n + 1)) AS BIGINT) AS epoch
    FROM j WHERE n >= 1 ORDER BY doc_id, epoch
    """,
)
def x40_epoch_upsample(spark, sf_dir):
    """Multi-epoch mixture upsampling (sampling.epoch_upsample): with a
    2× token budget at uniform source shares, each source's repeat factor
    lands in ~1.7–2.4 — every doc gets 1–2 guaranteed epochs plus a
    deterministic key-hash draw for the fractional one (the LLaMA/Dolma
    data-card move x33 can't make: it only thins). Pass 1 is the bounded
    source-key groupBy; pass 2 broadcasts the factors and explodes
    1..n_copies map-only — the corpus never shuffles."""
    from ...operators import sampling

    return (
        sampling.epoch_upsample(
            table(spark, sf_dir, "documents"),
            "doc_id", "source", "n_chars", budget_factor=2.0,
        )
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    )


from ...operators.dsir import dsir_weights, duck_dsir_sql


@query(
    "x43_dsir_weights",
    oracle=duck_dsir_sql(
        "documents", "doc_id", "text", "lang = 'en'", n_buckets=1024
    )
    + " ORDER BY doc_id",
)
def x43_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): every document scored by
    its average hashed-unigram log importance ratio against a TARGET
    distribution (here: the English subset — the 'select raw docs that
    look like the exemplar corpus' move). Downstream,
    sampling.weighted_sample turns these into the resampling step. One
    corpus shuffle on md5-uniform (doc, bucket) keys; both bucket models
    are bounded (1024 rows) and broadcast — see operators/dsir.py."""
    docs = table(spark, sf_dir, "documents")
    return dsir_weights(
        docs, "doc_id", "text", F.col("lang") == "en", n_buckets=1024
    ).orderBy("doc_id")


@query(
    "x46_token_budget",
    oracle="""
    WITH n AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
    g AS (
      SELECT (1::BIGINT << floor(log2(n))::INT) AS bucket_lo,
             count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tok_total
      FROM n WHERE n >= 1 GROUP BY 1
    )
    SELECT bucket_lo, n_docs, tok_total,
           round(CAST(sum(tok_total) OVER (ORDER BY bucket_lo) AS DOUBLE)
                 / (SELECT sum(tok_total) FROM g), 6) AS cum_share
    FROM g ORDER BY bucket_lo
    """,
)
def x46_token_budget(spark, sf_dir):
    """Token-budget report (chunking.token_budget_report): corpus length
    distribution in power-of-2 token bins with cumulative token share —
    the planning pass before sequence packing (x25). One groupBy on the
    bounded bin key; the cumulative window runs over ≤ ~40 bin rows."""
    from ...operators.chunking import token_budget_report

    return token_budget_report(table(spark, sf_dir, "documents"), "text")


from ...operators.sampling import duck_hash_uniform


_DUCK_UNIFORM_DOC = duck_hash_uniform("doc_id")


@query(
    "x48_temperature_mix",
    oracle=f"""
    WITH t AS (SELECT source, sum(n_chars) AS tok FROM documents GROUP BY source),
    r AS (
      SELECT source,
             round(least(1.0,
               ((SELECT sum(tok) FROM t)
                * (pow(tok::DOUBLE, 0.7)
                   / (SELECT sum(pow(tok::DOUBLE, 0.7)) FROM t)))
               / tok), 12) AS rate
      FROM t
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN r USING (source)
    WHERE {_DUCK_UNIFORM_DOC} < r.rate
    ORDER BY d.doc_id
    """,
)
def x48_temperature_mix(spark, sf_dir):
    """Temperature-scaled mixture sampling (sampling.temperature_sample,
    τ=0.7 — the mBERT/XLM-R exponential-smoothing schedule): oversized
    sources are thinned toward share ∝ p^τ while small sources keep all
    their mass. Pass 1 is the bounded source groupBy; pass 2 broadcasts
    the rates and filters by the deterministic key hash — the corpus
    never shuffles."""
    from ...operators.sampling import temperature_sample

    return (
        temperature_sample(
            table(spark, sf_dir, "documents"), "doc_id", "source", "n_chars",
            tau=0.7,
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "x55_data_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, md5(text) AS dg,
             len(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    langs AS (
      SELECT lang, count(*) AS c, (SELECT count(*) FROM base) AS n
      FROM base GROUP BY lang
    )
    SELECT (SELECT count(*) FROM base) AS n_docs,
           (SELECT CAST(sum(n_words) AS BIGINT) FROM base) AS n_tokens,
           (SELECT round(1.0 - count(DISTINCT dg)::DOUBLE / count(*), 6)
            FROM base) AS exact_dup_rate,
           (SELECT round(CAST(sum(CAST(round(-(c::DOUBLE / n) * ln(c::DOUBLE / n),
                                            12) AS DECIMAL(20,12))) AS DOUBLE), 6)
            FROM langs) AS lang_entropy
    """,
)
def x55_data_card(spark, sf_dir):
    """One-row dataset card — the summary a curation pipeline publishes
    with every release: corpus size, token count, exact-duplication rate,
    and language-mix Shannon entropy (nats; ≈ln(5)≈1.609 for a uniform
    5-language mix, 0 for monolingual). Entropy terms are rounded to 12
    decimals and summed as decimals so the ≤#langs-term sum is
    order-independent across engines; everything else is exact integer
    arithmetic. Two bounded aggregations over one scan-shaped base."""
    from ...functions.text import tokens

    df = table(spark, sf_dir, "documents")
    base = df.select(
        "lang", F.md5("text").alias("dg"), F.size(tokens("text")).alias("n_words")
    )
    totals = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        F.round(
            1.0 - F.count_distinct("dg").cast("double") / F.count(F.lit(1)), 6
        ).alias("exact_dup_rate"),
    )
    p = F.col("c").cast("double") / F.col("n")
    entropy = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(base.agg(F.count(F.lit(1)).alias("n"))))
        .agg(
            F.round(
                F.sum(
                    F.round(-p * F.log(p), 12).cast("decimal(20,12)")
                ).cast("double"),
                6,
            ).alias("lang_entropy")
        )
    )
    return totals.crossJoin(F.broadcast(entropy))


@query(
    "x56_source_cap",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= 300 ORDER BY doc_id
    """,
)
def x56_source_cap(spark, sf_dir):
    """Per-source contribution cap (sampling.source_cap): keep at most
    300 docs per source, chosen as the 300 smallest md5(doc_id) per key —
    the C4/RedPajama-style hot-domain cap. The operator's under/over
    split means only over-cap sources' rows ever reach the rank window
    (broadcast count split; the under-cap corpus never shuffles); the
    oracle applies the global rank form, identical by construction."""
    from ...operators.sampling import source_cap

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return source_cap(docs, "source", "doc_id", cap=300).orderBy("doc_id")


@query(
    "x58_training_order",
    oracle="""
    SELECT position, doc_id FROM (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5('seed0' || '|' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS position
      FROM documents)
    WHERE position <= 100 ORDER BY position
    """,
)
def x58_training_order(spark, sf_dir):
    """Deterministic global training order (sampling.global_hash_order):
    every doc's exact 1-based rank in the seeded hash order — the
    reproducible, layout-independent epoch shuffle. Exact ranks with NO
    single-task global window: hash-byte range buckets + broadcast
    cumulative offsets + per-bucket parallel rank (the TeraSort shape);
    the oracle's one-window global rank is identical by prefix-order
    construction. First 100 positions returned."""
    from ...operators.sampling import global_hash_order

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return (
        global_hash_order(docs, "doc_id", seed="seed0")
        .select("position", "doc_id")
        .orderBy("position")
        .limit(100)
    )


_X63_Q = f"""
      SELECT doc_id,
             0.4 * least(len(ws) / 100.0, 1.0)
               + 0.3 * (1.0 - len(list_filter(ws, w -> w IN ({_DUCK_STOP}))) / len(ws))
               + 0.3 * least((length(text) - (len(ws) - 1)) / len(ws) / 10.0, 1.0) AS q
      FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
"""


@query(
    "x63_curriculum_order",
    oracle=f"""
    WITH q AS ({_X63_Q}),
    st AS (
      SELECT doc_id,
             CAST(least(floor((1.0 - least(greatest(q, 0.0), 1.0)) * 5),
                        4) AS INTEGER) AS stage
      FROM q
    )
    SELECT CAST(row_number() OVER (
             ORDER BY stage,
                      md5('cur0' || '|' || CAST(doc_id AS VARCHAR)),
                      doc_id) AS BIGINT) AS position,
           stage, doc_id
    FROM st ORDER BY position
    """,
)
def x63_curriculum_order(spark, sf_dir):
    """Curriculum training order (sampling.curriculum_order): quality
    stages (fixed score bands, stage 0 = cleanest first) hash-shuffled
    within stage with exact global positions — the clean-data-first
    schedule with a real in-stage shuffle. Positions come from the
    two-level distributed rank ((stage, hash-bucket) windows + broadcast
    offsets — no single-task global window); the oracle's one-window
    global rank is identical by prefix-order construction."""
    from ...operators.sampling import curriculum_order

    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", tx.quality_score("text").alias("_q")
    )
    return (
        curriculum_order(scored, "doc_id", "_q", n_stages=5, seed="cur0")
        .select("position", "stage", "doc_id")
        .orderBy("position")
    )


@query(
    "x73_pack_efficiency",
    oracle=f"""
    WITH s AS MATERIALIZED (
      SELECT doc_id,
             CAST({duck_hash_bucket('doc_id', 64)} AS BIGINT) AS shard,
             len(string_split(text,' ')) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  AS BIGINT) - n_tokens AS "offset"
      FROM s
    ),
    p AS (
      SELECT shard, CAST(floor("offset" / 2048.0) AS BIGINT) AS pack_id,
             n_tokens
      FROM o
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE)
                 / ((max(pack_id) + 1) * 2048), 9) AS utilization
    FROM p GROUP BY shard ORDER BY shard
    """,
)
def x73_pack_efficiency(spark, sf_dir):
    """Pack-utilization report over the x25 packing: per shard, how full
    the 2048-token context windows actually are — the efficiency number a
    training job watches (utilization far below 1.0 means the packer is
    cutting documents across pack boundaries it then pads, i.e. wasted
    compute per step). A bounded groupBy (≤ n_shards keys) on top of the
    packing op; the utilization divide runs in one fixed double operation
    order on both engines."""
    from ...operators.chunking import pack_documents

    packed = pack_documents(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        capacity=2048, n_shards=64,
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("pack_id") + 1).cast("bigint").alias("n_packs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double")
                / ((F.max("pack_id") + 1) * 2048),
                9,
            ).alias("utilization"),
        )
        .orderBy("shard")
    )


@query(
    "x84_weighted_reservoir",
    oracle=(
        "SELECT doc_id, aes_key FROM ("
        + duck_weighted_reservoir_sql(
            "documents",
            "doc_id",
            "len(string_split(text, ' '))",
            k=100,
            select_cols="doc_id",
        )
        + ") ORDER BY doc_id"
    ),
)
def x84_weighted_reservoir(spark, sf_dir):
    """Exactly-k weighted sample without replacement
    (sampling.weighted_reservoir): Efraimidis–Spirakis A-ES over the
    deterministic md5 uniform — P(selected) ∝ token count, reproducible
    across engines/re-runs/layouts because the variate is a pure
    function of (seed, id). Complements x28's binomial-size acceptance
    sampling with the exactly-k lottery used for eval-set carving. Zero
    shuffles for the key; TakeOrdered top-k (no global sort)."""
    docs = table(spark, sf_dir, "documents")
    return (
        weighted_reservoir(
            docs, "doc_id", F.size(tx.tokens("text")), k=100
        )
        .select("doc_id", "aes_key")
        .orderBy("doc_id")
    )


@query(
    "x86_source_floor",
    oracle="""
    WITH d AS (
      SELECT doc_id, source || '/' || lang AS cell FROM documents
    )
    SELECT doc_id, cell FROM d
    WHERE cell IN (SELECT cell FROM d GROUP BY cell HAVING count(*) >= 8)
    ORDER BY doc_id
    """,
)
def x86_source_floor(spark, sf_dir):
    """Long-tail suppression (sampling.source_floor): keep docs only
    from (source, language) cells contributing ≥ 8 — the
    k-anonymity-flavored inverse of the x56 hot-domain cap (tiny cells
    are disproportionately identifying and host the spam one-offs; the
    sf corpus's cells span 1–16 docs, so both branches are exercised).
    One bounded-key count, then a left-semi join against the qualifying
    keys, whose number is provably ≤ corpus/min_docs."""
    from ...operators.sampling import source_floor

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.concat_ws("/", "source", "lang").alias("cell")
    )
    return source_floor(docs, "cell", 8).orderBy("doc_id")


@query(
    "x108_eval_quota",
    oracle="""
    WITH cells AS (
      SELECT lang, source, count(*) AS n_docs
      FROM documents GROUP BY lang, source
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS _tot FROM cells),
    c AS (
      SELECT lang, source, n_docs,
             (100 * n_docs) // _tot AS _base,
             (100 * n_docs) % _tot AS _rem
      FROM cells CROSS JOIN tot
    ),
    lft AS (SELECT 100 - CAST(sum(_base) AS BIGINT) AS _left FROM c),
    rk AS (
      SELECT c.*, row_number() OVER (ORDER BY _rem DESC, lang, source)
               AS _rk
      FROM c
    )
    SELECT lang, source, n_docs,
           CAST(_base + CASE WHEN _rk <= _left THEN 1 ELSE 0 END AS INTEGER)
             AS quota
    FROM rk CROSS JOIN lft
    ORDER BY lang, source
    """,
)
def x108_eval_quota(spark, sf_dir):
    """Eval-budget apportionment (sampling.quota_apportion): spread 100
    eval slots across the lang × source cells by Hamilton
    largest-remainder — quotas sum to exactly 100, each cell within 1
    of its proportional share, ALL integer arithmetic (no float
    apportionment drift). The quota table feeds x16's deterministic
    per-stratum selection to materialize the eval set. One
    strata-keyed fold to the bounded cell frame; remainder ranking is
    a window over that frame."""
    from ...operators.sampling import quota_apportion

    return quota_apportion(
        table(spark, sf_dir, "documents"), ["lang", "source"], k=100
    )


from ...operators.sampling import duck_quantile_norm_sql  # noqa: E402


@query(
    "x116_quantile_norm",
    oracle=duck_quantile_norm_sql(
        "documents", "source", "n_chars", "doc_id", keep_quantile=0.8
    ),
)
def x116_quantile_norm(spark, sf_dir):
    """Per-source quantile normalization of a quality signal
    (sampling.per_group_quantile_norm over n_chars): each document's
    within-source percent-rank, plus the keep flag for "top 20% of
    EVERY source" — the fair cross-source threshold a raw global score
    cut cannot give (score distributions differ by source; a global
    bar lets verbose sources crowd out the rest). Deterministic
    (score, id) total order; one window per source partition (the
    monster-source remedy is the q85 bucketed rank); hash-checked
    including the boolean flag."""
    from ...operators.sampling import per_group_quantile_norm

    return per_group_quantile_norm(
        table(spark, sf_dir, "documents"), "source", "n_chars",
        "doc_id", keep_quantile=0.8,
    ).orderBy("doc_id")


from ...operators.sampling import duck_waterfill_sql  # noqa: E402


@query(
    "x117_waterfill_budget",
    oracle=duck_waterfill_sql(
        "documents", "source", "n_chars", budget=60_000
    ),
)
def x117_waterfill_budget(spark, sf_dir):
    """Max-min fair water-filling of a 60k-char budget across sources
    (sampling.waterfill_allocation) — the fairness DUAL of x108's
    proportional Hamilton quotas and the x48 temperature knob: shares
    EQUALIZE until a source exhausts its capacity (small sources keep
    everything; the level rises on whoever remains). Exact integer
    construction (saturation test prefix(k−1)+cap_k·(n−k+1) ≤ B on the
    capacity-ascending order, integer level + deterministic remainder);
    Σ allocated = min(B, Σ cap) exactly. ONE source-keyed exchange;
    every window runs on the ≤ |sources| capacity frame."""
    from ...operators.sampling import waterfill_allocation

    return waterfill_allocation(
        table(spark, sf_dir, "documents"), "source", "n_chars",
        budget=60_000,
    )


@query(
    "x128_pack_purity",
    oracle=f"""
    WITH s AS MATERIALIZED (
      SELECT doc_id, source,
             CAST({duck_hash_bucket('doc_id', 64)} AS BIGINT) AS shard,
             len(string_split(text,' ')) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, source, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                  AS BIGINT) - n_tokens AS "offset"
      FROM s
    ),
    p AS (
      SELECT shard, CAST(floor("offset" / 2048.0) AS BIGINT) AS pack_id,
             source, sum(n_tokens) AS _tok
      FROM o GROUP BY shard, pack_id, source
    ),
    pp AS (
      SELECT shard, pack_id, count(*) AS n_sources,
             sum(_tok) AS _tot, max(_tok) AS _mx
      FROM p GROUP BY shard, pack_id
    )
    SELECT CAST(n_sources AS BIGINT) AS n_sources,
           CAST(least(floor((CAST(_mx AS DOUBLE) / CAST(_tot AS DOUBLE))
                            * 10), 9) AS INT) AS purity_bin,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(_tot) AS BIGINT) AS tok_total
    FROM pp GROUP BY n_sources, purity_bin
    ORDER BY n_sources, purity_bin
    """,
)
def x128_pack_purity(spark, sf_dir):
    """Pack-purity audit (chunking.pack_purity_profile): token-weighted
    majority-source share per x25 pack, reported as the bounded
    (n_sources × 0.1-bin) histogram — the cross-source contamination
    exposure of concatenate-and-cut packing, measured before paying for
    boundary masks or source-partitioned streams. Integer token sums;
    the one division is IEEE-identical cross-engine; binning floors the
    raw double (no rounding boundary)."""
    from ...operators.chunking import pack_purity_profile

    return pack_purity_profile(
        table(spark, sf_dir, "documents"), "doc_id", "text", "source",
        capacity=2048, n_shards=64,
    )


@query(
    "x130_robust_scale",
    oracle="""
    WITH med AS (
      SELECT source AS _g,
             quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
      FROM documents GROUP BY _g
    ),
    dev AS (
      SELECT t.doc_id, t.source,
             CAST(t.n_chars AS DOUBLE) AS value, m.med,
             abs(CAST(t.n_chars AS DOUBLE) - m.med) AS _dev
      FROM documents t JOIN med m ON t.source = m._g
    ),
    mad AS (
      SELECT source AS _g, quantile_cont(_dev, 0.5) AS mad
      FROM dev GROUP BY _g
    )
    SELECT d.doc_id, d.source, d.value,
           round(d.med, 9) AS med,
           round(m.mad, 9) AS mad,
           CASE WHEN m.mad > 0
                THEN round((d.value - d.med) / (1.4826 * m.mad), 9)
           END AS robust_z
    FROM dev d JOIN mad m ON d.source = m._g
    ORDER BY d.doc_id
    """,
)
def x130_robust_scale(spark, sf_dir):
    """Per-source robust z-scores (sampling.robust_scale): (value −
    median)/(1.4826·MAD) over n_chars — outlier-immune cross-source
    score normalization, the shape-preserving sibling of x116's
    quantile norm. Two bounded ≤|sources| aggregations (percentile ≡
    quantile_cont, the q42 equivalence) + a map-only scoring pass."""
    from ...operators.sampling import robust_scale

    return robust_scale(
        table(spark, sf_dir, "documents"), "source", "doc_id", "n_chars"
    )


from ...operators.sampling import (  # noqa: E402
    duck_top_p_token_mass_sql,
    top_p_token_mass,
)
from .profile import _DUCK_QUALITY  # noqa: E402


@query(
    "x136_top_p_tokens",
    oracle=duck_top_p_token_mass_sql(
        "documents", "source", _DUCK_QUALITY, "doc_id", "text", 0.6
    ),
)
def x136_top_p_tokens(spark, sf_dir):
    """Per-source top-p selection by TOKEN mass (sampling.
    top_p_token_mass, p=0.6): the best docs covering 60% of every
    source's tokens — the budget-semantics sibling of x30's top
    fraction of DOCS. Integer cumulative sums, one IEEE boundary
    comparison, per-source windows."""
    from ...functions import text as tx

    return top_p_token_mass(
        table(spark, sf_dir, "documents"), "source",
        tx.quality_score("text"), "doc_id", "text", 0.6,
    )


from ...operators.sampling import (  # noqa: E402
    duck_winsorized_mean_sql,
    winsorized_mean,
)


@query(
    "x145_winsorized_mean",
    oracle=duck_winsorized_mean_sql("documents", "source", _DUCK_QUALITY, 0.05),
)
def x145_winsorized_mean(spark, sf_dir):
    """Per-source winsorized mean quality (sampling.winsorized_mean,
    p=0.05): values clamped to the source's [p5, p95] interpolated
    percentiles before averaging — the outlier-resistant location
    estimate that still moves with the bulk (unlike x130's median),
    the robust dashboard number one pathological page can't swing.
    percentile ≡ quantile_cont (the q42 equivalence), decimal-
    accumulated mean (the x125 discipline), one ≤|sources| agg each
    side of a map-only clamp."""
    from ...functions import text as tx

    return winsorized_mean(
        table(spark, sf_dir, "documents"), "source",
        tx.quality_score("text"), p=0.05,
    )


@query(
    "x152_chunk_overlap_audit",
    oracle="""
    WITH w AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    c AS MATERIALIZED (
      SELECT doc_id, ws,
             CAST(ceil(greatest(len(ws) - 64, 0) / 48.0) AS INT) + 1 AS n_chunks
      FROM w
    ),
    e AS (
      SELECT doc_id, unnest(generate_series(1, n_chunks)) AS i, ws FROM c
    ),
    per AS (
      SELECT doc_id,
             count(*) AS n_chunks,
             any_value(len(ws)) AS doc_tokens,
             sum(least(64, len(ws) - (i-1)*48)) AS chunk_tokens
      FROM e GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(doc_tokens AS BIGINT) AS doc_tokens,
           CAST(chunk_tokens AS BIGINT) AS chunk_tokens,
           CAST(chunk_tokens - doc_tokens AS BIGINT) AS overlap_tokens,
           round(CAST(chunk_tokens AS DOUBLE) / CAST(doc_tokens AS DOUBLE), 9)
             AS dup_factor
    FROM per ORDER BY doc_id
    """,
)
def x152_chunk_overlap_audit(spark, sf_dir):
    """Chunk-boundary DUPLICATION accounting for the x24 overlapping
    windows (64/48): per doc, how many tokens the stride overlap
    re-emits (chunk_tokens − doc_tokens) and the duplication factor a
    token sees per epoch — the number a token-budget planner (x46/x107)
    must multiply through before trusting its epoch math, and the
    direct cost of the overlap that makes chunk boundaries trainable.
    Aggregates the REAL chunk operator's output (not a closed form), so
    a chunking bug shows up here as an accounting mismatch."""
    from ...operators.chunking import chunk_documents

    docs = table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", "text", win=64, stride=48)
    per = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("doc_tokens")
    )
    return (
        per.join(toks, "doc_id")
        .select(
            "doc_id",
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
            F.col("doc_tokens").cast("bigint").alias("doc_tokens"),
            F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
            (F.col("chunk_tokens") - F.col("doc_tokens"))
            .cast("bigint")
            .alias("overlap_tokens"),
            F.round(
                F.col("chunk_tokens").cast("double")
                / F.col("doc_tokens").cast("double"),
                9,
            ).alias("dup_factor"),
        )
        .orderBy("doc_id")
    )
