"""x-series, dedup family: exact/normalized/passage dedup, MinHash-LSH,
SimHash, n-gram Jaccard, embedding near-dup, SemDeDup, bucketed LSH,
incremental crawl dedup, dup components, duplication-rate trend."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ...catalog import table  # noqa: F401
from ...functions import text as tx  # noqa: F401
from ...functions import vectors  # noqa: F401
from ...operators import decontam, dedup, multimodal, similarity  # noqa: F401
from .. import query  # noqa: F401
from ..util import duck_ts_str, ts_str  # noqa: F401
from ._shared import _det_centers, _DUCK_SHINGLES, _EMB_DIM  # noqa: F401


@query(
    "x01_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY canonical_id
    """,
)
def x01_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the md5 digest (16-byte shuffle key
    regardless of document size)."""
    return dedup.exact_dedup(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    ).orderBy("canonical_id")


@query(
    "x02_dedup_minhash_lsh",
    oracle=dedup.duck_minhash_lsh_sql(
        "documents", "doc_id", "text", threshold=0.35
    ),
)
def x02_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64) + LSH(16 bands × 4) near-dup pairs, est Jaccard ≥ 0.35,
    in the `portable` arm: md5-prefix token hashes and Horner band folds
    that duck_minhash_lsh_sql mirrors integer-for-integer — the whole
    sketch pipeline (shingles → signatures → banding → verification) is
    hash-checked. Recall vs the exact x04 pairs stays asserted in
    tests/test_dedup.py."""
    return dedup.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        threshold=0.35,
        portable=True,
    ).orderBy("id_a", "id_b")


@query(
    "x03_dedup_simhash",
    oracle=dedup.duck_simhash_sql("documents", "doc_id", "text"),
)
def x03_dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs (Hamming ≤ 3 via 4×16-bit banding), in
    the `portable` arm (md5-prefix token hashes) so duck_simhash_sql
    mirrors every majority bit, chunk, and Hamming count exactly."""
    return dedup.simhash_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", portable=True
    ).orderBy("id_a", "id_b")


@query(
    "x04_dedup_ngram_jaccard",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
    FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING jaccard >= 0.3
    ORDER BY id_a, id_b
    """,
)
def x04_dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-shingle Jaccard join (inverted-index self-join;
    shuffle key = shingle, so pairs sharing no shingle never materialize)."""
    return dedup.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=3, threshold=0.3
    ).orderBy("id_a", "id_b")


@query(
    "x05_dedup_embedding",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({vectors.duck_cosine('a.embedding', 'b.embedding', _EMB_DIM)}, 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {vectors.duck_cosine('a.embedding', 'b.embedding', _EMB_DIM)} >= 0.45
    ORDER BY id_a, id_b
    """,
)
def x05_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact pair scan baseline; the
    bucketed LSH path is x06/similarity.lsh_topk)."""
    return dedup.embedding_dup_pairs(
        table(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=0.45
    ).orderBy("id_a", "id_b")


@query(
    "x18_dup_components",
    oracle=f"""
    WITH RECURSIVE
    s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.3
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    )
    SELECT src AS doc_id, min(dst) AS component FROM reach
    GROUP BY src ORDER BY doc_id
    """,
)
def x18_dup_components(spark, sf_dir):
    """Near-dup CLUSTERS from pair output: connected components over the
    exact-Jaccard pairs (operators/graph.py min-label propagation,
    localCheckpoint per round), component = min reachable doc_id — the
    canonical-document assignment a dedup pipeline actually keeps. The
    oracle computes the same transitive closure with a recursive CTE."""
    from ...operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    from ._shared import shared_jaccard_pairs

    pairs = shared_jaccard_pairs(spark, sf_dir)
    comp = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )
    return comp.select(F.col("id").alias("doc_id"), "component").orderBy(
        "doc_id"
    )


def _x26_oracle(sf_dir: str) -> str | None:
    centers = _det_centers(6, sf_dir)
    if centers is None:
        return None
    dl = similarity.duck_dist_list("embedding", centers)
    cos = vectors.duck_cosine("a.embedding", "b.embedding", _EMB_DIM)
    return f"""
    WITH d AS (SELECT vec_id, embedding, {dl} AS dl FROM embeddings),
    c AS (SELECT vec_id, embedding, {similarity.duck_assign('dl')} AS cell FROM d)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
    FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {cos} >= 0.45
    ORDER BY id_a, id_b
    """


@query("x26_dedup_semantic", oracle=_x26_oracle)
def x26_dedup_semantic(spark, sf_dir):
    """SemDeDup-style clustered embedding dedup: the 100 TB scale path for
    x05 — a KMeans coarse quantizer shrinks the pair space to within-cell,
    so emitted cosines are EXACT (precision 1.0 vs x05 by construction);
    recall vs the exact baseline is asserted in tests/test_dedup.py.
    Oracle-checkable form: the quantizer is fit deterministically
    (fit_quantizer_det — the oracle re-fits byte-identical centroids from
    the same table and embeds them as SQL literals) and cell assignment
    is the pure-expression argmin (mirrored by duck_dist_list); pair
    scoring stays the per-cell BLAS gram — the scale path — whose float64
    cosines agree with the oracle's sequential folds to well under the
    emitted round-6 precision. max_cell_size arms the skew guard (inert
    on healthy corpora). The all-expression twin
    (semantic_dedup_pairs_expr) is equality-tested against this arm."""
    from ._shared import shared_quantizer

    emb = table(spark, sf_dir, "embeddings")
    q = shared_quantizer(spark, sf_dir, 6)
    return dedup.semantic_dedup_pairs(
        emb, "vec_id", "embedding", threshold=0.45,
        quantizer=q, assign="expr", max_cell_size=100_000,
    ).orderBy("id_a", "id_b")


_DUCK_NEW = "doc_id % 5 = 0"


@query(
    "x29_incremental_dedup",
    oracle=f"""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS d FROM documents WHERE NOT ({_DUCK_NEW})
    ),
    fresh AS (
      SELECT doc_id, md5(text) AS d FROM documents
      WHERE {_DUCK_NEW} AND md5(text) NOT IN (SELECT d FROM hist)
    )
    SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
    FROM fresh GROUP BY d
    ORDER BY canonical_id
    """,
)
def x29_incremental_dedup(spark, sf_dir):
    """Incremental dedup (dedup.incremental_dedup): today's crawl batch
    anti-joined against the historical corpus's md5 fingerprint store,
    then exact-deduped within itself — the recurring-ingest shape where
    the full-corpus dedup (x01) has already run on everything older.
    Both sides reduce to 16-byte digests before the join; the historical
    store carries no broadcast hint (it is corpus-scale)."""
    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    return dedup.incremental_dedup(
        docs.filter(is_new), docs.filter(~is_new), "doc_id", "text"
    ).orderBy("canonical_id")


@query(
    "x77_incremental_near_dedup",
    oracle=dedup.duck_incremental_near_dedup_sql(
        "documents", "doc_id", "text", "doc_id % 5 = 0"
    ),
)
def x77_incremental_near_dedup(spark, sf_dir):
    """Incremental NEAR-dup dedup (dedup.incremental_near_dedup): x29's
    recurring-crawl shape upgraded from byte-exact md5 to MinHash
    similarity — today's batch (doc_id % 5 == 0) is probed against the
    historical corpus's persisted MinHash sketch_store, so a re-crawled
    page whose timestamp rotated is still caught. History is touched
    ONLY through its signatures (band hashes re-derive by array math —
    no historical text is read); per new doc the status is
    dup_of_history / dup_in_batch (smaller-id pair grain) / kept.
    Portable hash arm, so the DuckDB oracle mirrors every integer."""
    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    store = dedup.sketch_store(
        docs.filter(~is_new), "doc_id", "text", portable=True
    )
    return dedup.incremental_near_dedup(
        docs.filter(is_new), store, "doc_id", "text", portable=True
    ).orderBy("doc_id")


@query(
    "x35_normalized_dedup",
    oracle=r"""
    SELECT min(doc_id) AS canonical_id, count(*) AS n_copies,
           count(DISTINCT md5(text)) AS n_raw_variants
    FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
    ORDER BY canonical_id
    """,
)
def x35_normalized_dedup(spark, sf_dir):
    """Exact dedup under normalization (dedup.normalized_dedup): lowercase
    + collapse non-alphanumeric runs + trim before digesting — merges
    re-punctuated/case-shifted copies that byte-exact x01 keeps apart;
    n_raw_variants shows how many raw contents each group merged."""
    return dedup.normalized_dedup(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    ).orderBy("canonical_id")


@query(
    "x36_passage_dedup",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             [array_to_string(ws[(i-1)*20 + 1 : i*20], ' ')
              for i in range(1, CAST(ceil(len(ws)/20.0) AS BIGINT) + 1)]
               AS spans
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    e AS (
      SELECT doc_id, unnest(range(len(spans))) AS pos, unnest(spans) AS span
      FROM s
    ),
    r AS (
      SELECT doc_id, pos, span,
             row_number() OVER (PARTITION BY md5(span) ORDER BY doc_id, pos)
               AS rn
      FROM e
    )
    SELECT doc_id, count(*) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                               ORDER BY pos), '') AS text_dedup
    FROM r GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def x36_passage_dedup(spark, sf_dir):
    """Passage-level dedup (dedup.passage_dedup): 20-token spans, keep
    only each span content's corpus-wide first occurrence (min (doc,pos)),
    rebuild documents from their kept spans — removes cross-document
    boilerplate below document granularity (Lee et al. 2022's span-dedup
    recipe). One shuffle on the span digest + one doc-id groupBy."""
    return dedup.passage_dedup(
        table(spark, sf_dir, "documents"), "doc_id", "text", span_tokens=20
    ).orderBy("doc_id")


def _x37_oracle() -> str:
    from ...operators import similarity as _sim
    from ...operators.dedup import duck_bucket_key

    planes = _sim.hyperplanes(_EMB_DIM, 6, 42)
    bk = duck_bucket_key("embedding", planes)
    cos = vectors.duck_cosine("a.embedding", "b.embedding", _EMB_DIM)
    return f"""
    WITH bk_t AS (SELECT vec_id, embedding, {bk} AS bk FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
    FROM bk_t a JOIN bk_t b ON a.bk = b.bk AND a.vec_id < b.vec_id
    WHERE {cos} >= 0.45
    ORDER BY id_a, id_b
    """


@query("x37_dedup_lsh_bucketed", oracle=_x37_oracle())
def x37_dedup_lsh_bucketed(spark, sf_dir):
    """Bucketed LSH embedding near-dup (dedup.lsh_bucketed_dup_pairs):
    the clustered-dedup SHAPE — one shuffle on a bucket key, exact cosine
    only within a bucket — under a DETERMINISTIC sign-bit partitioner
    that the DuckDB oracle reproduces expression-for-expression, so the
    whole scale path is hash-checked (x26's KMeans variant is rows-only
    by nature; this is its oracle-backed sibling)."""
    return dedup.lsh_bucketed_dup_pairs(
        table(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        dim=_EMB_DIM, threshold=0.45, n_planes=6, seed=42,
    ).orderBy("id_a", "id_b")


from ..util import duck_ts_str, ts_str


@query(
    "x52_dedup_trend",
    oracle=f"""
    SELECT {duck_ts_str("date_trunc('hour', ts)")} AS window_start,
           count(*) AS n_events,
           count(DISTINCT props) AS n_distinct,
           round(1.0 - count(DISTINCT props)::DOUBLE / count(*), 6) AS dup_rate
    FROM events GROUP BY 1 ORDER BY window_start
    """,
)
def x52_dedup_trend(spark, sf_dir):
    """Duplication-rate trend over event time — the recurring-crawl
    health monitor (a rising hourly dup rate is the first sign a crawler
    started re-fetching): per hour, event count, distinct payloads, and
    the dup rate. One exchange on the bounded hour key with map-side
    partial counts; the DISTINCT is per-window (payload cardinality
    bounded by window volume, never corpus-wide)."""
    df = table(spark, sf_dir, "events")
    return (
        df.groupBy(F.date_trunc("hour", "ts").alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("props").alias("n_distinct"),
            F.round(
                1.0 - F.count_distinct("props").cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
        )
        .select(
            ts_str("_w").alias("window_start"), "n_events", "n_distinct", "dup_rate"
        )
        .orderBy("window_start")
    )


@query(
    "x75_sketch_accuracy",
    oracle=dedup.duck_minhash_error_audit_sql(
        "documents", "doc_id", "text", threshold=0.2
    ),
)
def x75_sketch_accuracy(spark, sf_dir):
    """MinHash estimator-error audit (dedup.minhash_error_audit): for
    every LSH candidate pair, |signature estimate − exact Jaccard of the
    same hashed-shingle sets| binned at 0.05 — the check that the sketch
    is trustworthy on THIS corpus before its threshold deletes data
    (expected stddev ≈ sqrt(J(1−J)/64) ≈ 0.06; mass outside ±2σ flags a
    broken hash family or band plan). Work ∝ candidate pairs (banding
    join), histogram is a ≤ 20-key groupBy."""
    return dedup.minhash_error_audit(
        table(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.2
    )


@query(
    "x80_corpus_diff",
    oracle=dedup.duck_corpus_diff_sql(
        "documents",
        "doc_id",
        "text",
        old_pred="doc_id % 7 != 0",
        new_select=(
            "SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN upper(text) "
            "ELSE text END AS text FROM documents WHERE doc_id % 3 != 0"
        ),
    ),
)
def x80_corpus_diff(spark, sf_dir):
    """Corpus snapshot diff (dedup.corpus_diff): the release-to-release
    changelog — added / removed / changed / unchanged per doc id, with
    content compared by md5 digest so the text never shuffles (each side
    reduces to (id, 16-byte digest) before ONE full-outer join on the
    id key). Old snapshot = doc_id % 7 != 0; new snapshot = doc_id % 3
    != 0 with every 11th doc's text edited — exercising all four
    statuses."""
    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.upper("text"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.corpus_diff(old, new, "doc_id", "text").orderBy("doc_id")


@query(
    "x82_containment_pairs",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) / any_value(a.n) AS containment
    FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id != b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING containment >= 0.6
    ORDER BY id_a, id_b
    """,
)
def x82_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dup pairs (dedup.containment_pairs):
    |Sa ∩ Sb| / |Sa| ≥ 0.6 over word-3-shingles, DIRECTED — the
    quote/excerpt/syndication detector that symmetric Jaccard misses
    when a short doc sits inside a long one. Same inverted-index shuffle
    law as x04 (pairs sharing no shingle never materialize). The pair
    frame is SESSION-SHARED with x92's source rollup (identical k=3 /
    t=0.6 params — shared_containment_pairs), so the co-occurrence
    shuffle runs once per session."""
    from ._shared import shared_containment_pairs

    return shared_containment_pairs(
        spark, sf_dir, k=3, threshold=0.6
    ).orderBy("id_a", "id_b")


@query(
    "x87_group_sketch_overlap",
    oracle=dedup.duck_group_sketch_overlap_sql(
        "documents", "source", "text"
    ),
)
def x87_group_sketch_overlap(spark, sf_dir):
    """Per-source corpus sketches + pairwise overlap estimates
    (dedup.group_sketch_overlap): each source's MinHash sketch is the
    position-wise MIN of its docs' signatures (MinHash mergeability:
    sig(A∪B) = min(sigA, sigB)), and sketch agreement estimates the
    Jaccard of the sources' union shingle sets — the sketch-cost
    screening twin of the exact x50 span matrix for deciding which
    source pairs deserve the expensive cross-dedup. Map-only signatures,
    ONE bounded (source × 64) groupBy, pair join entirely on the sketch
    frame. Portable arm → integer-exact dyadic estimates, fully
    hash-checked."""
    from ._shared import shared_doc_sigs

    return dedup.group_sketch_overlap(
        table(spark, sf_dir, "documents"), "source", "text", portable=True,
        sig_frame=shared_doc_sigs(spark, sf_dir),
    ).orderBy("g_a", "g_b")


@query(
    "x90_threshold_sweep",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS j
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING j >= 0.02
    )
    SELECT round(least(floor(round(j / 0.05, 9)) * 0.05, 0.95), 6) AS band_lo,
           count(*) AS n_pairs
    FROM pairs GROUP BY 1 ORDER BY band_lo
    """,
)
def x90_threshold_sweep(spark, sf_dir):
    """Dedup threshold-sweep report (dedup.jaccard_threshold_sweep):
    near-dup pair counts per 0.05-wide Jaccard band above a 0.02 floor,
    from ONE x04 inverted-index pair pass — the report read before
    committing a dedup threshold (the sf corpus shows the classic
    bimodal shape: a weak-overlap haze near 0, a near-dup spike at
    0.95+, and a gap between — the gap IS the threshold). The sweep
    costs the same as a single thresholded run; the banding is a
    ≤ 1/band_width-key groupBy."""
    return dedup.jaccard_threshold_sweep(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        k=3, band_width=0.05, min_jaccard=0.02,
    )


@query(
    "x92_syndication_matrix",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
            FROM documents)
    ),
    inv AS (SELECT doc_id, source, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             any_value(a.source) AS src_a, any_value(b.source) AS src_b
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id != b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / any_value(a.n) >= 0.6
    )
    SELECT src_a AS source_contained, src_b AS source_containing,
           count(*) AS n_pairs
    FROM pairs WHERE src_a != src_b
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def x92_syndication_matrix(spark, sf_dir):
    """Syndication-direction matrix: per ORDERED source pair, how many
    docs of the first source are ≥ 60% shingle-contained in a doc of
    the second (x82's directed containment rolled up to source grain) —
    the "who copies from whom" report that x50's symmetric span matrix
    cannot express: a feed aggregator shows up as a heavy
    source_containing column, its victims as heavy source_contained
    rows. Same inverted-index law as x82; the rollup is a bounded
    source-pair groupBy. Reads the SESSION-SHARED x82 pair frame
    (shared_containment_pairs, identical params) — one co-occurrence
    shuffle serves both reports."""
    from ._shared import shared_containment_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = shared_containment_pairs(spark, sf_dir, k=3, threshold=0.6)
    src = docs.select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"),
                F.col("source").alias("source_contained"),
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"),
                F.col("source").alias("source_containing"),
            ),
            "id_b",
        )
        .filter(F.col("source_contained") != F.col("source_containing"))
        .groupBy("source_contained", "source_containing")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_contained", "source_containing")
    )


def _x93_oracle() -> str:
    from ...operators.dedup import _duck_minhash_parts
    from ...operators.similarity import _dlit  # noqa: F401

    p = _duck_minhash_parts("text", 64, 16, 3, 42)
    agree = (
        "len([i for i in range(1, 65) if t.sig[i] = b.sig[i]])"
    )
    return f"""
    WITH th AS (SELECT doc_id AS _id, {p['tok']} AS th,
                       (doc_id % 5 = 0) AS _ev FROM documents),
    shn AS (SELECT _id, _ev, {p['shing']} AS sh FROM th),
    sig AS (SELECT _id, _ev, {p['sig']} AS sig FROM shn),
    b AS (SELECT sig FROM sig WHERE _ev AND list_min(sig) != 2147483647),
    t AS (SELECT _id, sig FROM sig WHERE NOT _ev)
    SELECT t._id AS doc_id, count(*) AS n_matches
    FROM t JOIN b ON {agree} >= 32
    GROUP BY t._id ORDER BY doc_id
    """


@query("x93_neardup_blocklist_screen", oracle=_x93_oracle())
def x93_neardup_blocklist_screen(spark, sf_dir):
    """The sketch blocklist screen under the oracle contract: per
    training doc, how many blocklist-slice (doc_id % 5 == 0 — the x77
    "new crawl" slice, large enough that the screen actually fires at
    this SF) sketches its MinHash
    signature agrees with at est ≥ 0.5 (flagged docs only) — the same
    contract the `neardup_gate` task evaluates per row, hash-checked
    integer-for-integer (portable hashes; agreement floor
    ceil(0.5·64) = 32; empty-shingle blocklist entries excluded at fit
    exactly as fit_blocklist_sketches does). This batch entry runs the
    RELATIONAL arm (sketch_screen_matches: posexplode + broadcast
    (sketch, pos, value) join — work ∝ actual position collisions, not
    blocklist size; measured ~10× on this screen), result-identical to
    the gate's per-row expression arm (equality-pinned in
    tests/test_dedup.py — the streaming gate keeps the pure expression,
    where no shuffle is allowed)."""
    from ._shared import shared_doc_sigs

    docs = table(spark, sf_dir, "documents")
    sigs = shared_doc_sigs(spark, sf_dir)
    is_block = F.col("doc_id") % 5 == 0
    sketches = dedup.fit_blocklist_sketches(
        docs.filter(is_block), "text", portable=True,
        sig_frame=sigs.filter(is_block),
    )
    return dedup.sketch_screen_matches(
        docs.filter(~is_block), "doc_id", "text", sketches,
        threshold=0.5, portable=True,
        sig_frame=sigs.filter(~is_block),
    ).orderBy("doc_id")


def _x94_oracle() -> str:
    from ...operators.dedup import _duck_minhash_parts
    from ...operators.similarity import _dlit

    p_old = _duck_minhash_parts("text", 64, 16, 3, 42)
    new_text = (
        "CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END"
    )
    p_new = _duck_minhash_parts(new_text, 64, 16, 3, 42)
    return f"""
    WITH tho AS (SELECT source AS _g, {p_old['tok']} AS th
                 FROM documents WHERE doc_id % 7 != 0),
    shno AS (SELECT _g, {p_old['shing']} AS sh FROM tho),
    sigo AS (SELECT _g, {p_old['sig']} AS sig FROM shno),
    eo AS (SELECT _g, generate_subscripts(sig, 1) AS _p,
                  unnest(sig) AS _v FROM sigo),
    mo AS (SELECT _g, _p, min(_v) AS _m FROM eo GROUP BY _g, _p),
    thn AS (SELECT source AS _g, {p_new['tok']} AS th
            FROM documents WHERE doc_id % 3 != 0),
    shnn AS (SELECT _g, {p_new['shing']} AS sh FROM thn),
    sign_ AS (SELECT _g, {p_new['sig']} AS sig FROM shnn),
    en AS (SELECT _g, generate_subscripts(sig, 1) AS _p,
                  unnest(sig) AS _v FROM sign_),
    mn AS (SELECT _g, _p, min(_v) AS _m FROM en GROUP BY _g, _p)
    SELECT mo._g AS source,
           CASE WHEN min(mo._m) = 2147483647 OR min(mn._m) = 2147483647
                THEN NULL
                ELSE sum(CASE WHEN mo._m = mn._m THEN 1 ELSE 0 END)
                     / {_dlit(64)}
           END AS est_overlap,
           CASE WHEN min(mo._m) = 2147483647 OR min(mn._m) = 2147483647
                THEN NULL
                ELSE 1.0 - sum(CASE WHEN mo._m = mn._m THEN 1 ELSE 0 END)
                     / {_dlit(64)}
           END AS turnover
    FROM mo JOIN mn ON mo._g = mn._g AND mo._p = mn._p
    GROUP BY mo._g ORDER BY source
    """


@query("x94_source_turnover", oracle=_x94_oracle())
def x94_source_turnover(spark, sf_dir):
    """Per-source content turnover between snapshots
    (dedup.group_sketch_turnover): the old and new snapshots' per-source
    union-set sketches (mergeable-min MinHash, x87's construction)
    compared position-wise — turnover = 1 − est Jaccard(old content,
    new content), the release metric x80's per-id diff cannot see when
    re-crawled pages change ids (the sketch keys on CONTENT, not ids).
    Same snapshot slices as x80 (old = %7≠0; new = %3≠0 with every 11th
    doc edited). Map-only signatures, one bounded (source × 64) groupBy
    per side, join on the sketch frames; dyadic-exact estimates."""
    from ._shared import shared_doc_sigs

    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 3 != 0).select(
        "source",
        F.when(F.col("doc_id") % 11 == 0, F.upper("text"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # Both sides read the shared fitted frame for PLAIN-text docs; the
    # new side recomputes only the %11 EDITED slice (its text genuinely
    # changed) and unions it in — the incremental-signature discipline
    # a recurring crawl applies (re-hash what changed, read the rest).
    sigs = shared_doc_sigs(spark, sf_dir)
    new_sigs = sigs.filter(
        (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 11 != 0)
    ).select("source", "_sig").unionByName(
        docs.filter(
            (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 11 == 0)
        ).select(
            "source",
            dedup.minhash_signature(
                F.upper("text"), 64, 3, 42, portable=True
            ).alias("_sig"),
        )
    )
    return dedup.group_sketch_turnover(
        old, new, "source", "text", portable=True,
        old_sig_frame=sigs.filter(F.col("doc_id") % 7 != 0),
        new_sig_frame=new_sigs,
    ).orderBy("source")


def _x100_oracle() -> str:
    from ...operators.dedup import _duck_minhash_parts

    p = _duck_minhash_parts("text", 64, 16, 3, 42)
    plan_rows = ", ".join(
        "({}, {}, CAST({!r} AS DOUBLE))".format(
            b,
            64 // b,
            round((1.0 / b) ** (1.0 / (64 // b)), 9) if b > 1 else 1.0,
        )
        for b in (64, 32, 16, 8, 4, 2, 1)
    )
    return f"""
    WITH sdoc AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sdoc),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS j
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING j >= 0.2
    ),
    th AS (SELECT doc_id AS _id, {p['tok']} AS th FROM documents),
    shn AS (SELECT _id, {p['shing']} AS sh FROM th),
    sig AS (SELECT _id, {p['sig']} AS sig FROM shn),
    e AS (SELECT _id, generate_subscripts(sig, 1) AS _p, unnest(sig) AS _v
          FROM sig),
    plans(bands, rows_per_band, s_threshold) AS (VALUES {plan_rows}),
    pa AS (
      SELECT pr.id_a, pr.id_b, pr.j, a._p,
             CASE WHEN a._v = b._v THEN 1 ELSE 0 END AS agree
      FROM pairs pr
      JOIN e a ON a._id = pr.id_a
      JOIN e b ON b._id = pr.id_b AND b._p = a._p
    ),
    pb AS (
      SELECT pa.*, plans.bands, plans.rows_per_band, plans.s_threshold,
             (pa._p - 1) // plans.rows_per_band AS band
      FROM pa CROSS JOIN plans
    ),
    ba AS (
      SELECT id_a, id_b, j, bands, rows_per_band, s_threshold, band,
             min(agree) AS _ba
      FROM pb
      GROUP BY id_a, id_b, j, bands, rows_per_band, s_threshold, band
    ),
    c AS (
      SELECT id_a, id_b, j, bands, rows_per_band, s_threshold,
             max(_ba) AS _c
      FROM ba
      GROUP BY id_a, id_b, j, bands, rows_per_band, s_threshold
    )
    SELECT bands, rows_per_band, s_threshold,
      CAST(count(*) FILTER (WHERE j >= 0.5) AS BIGINT) AS n_dup_pairs,
      CAST(coalesce(sum(_c) FILTER (WHERE j >= 0.5), 0) AS BIGINT)
        AS n_dup_caught,
      CAST(count(*) FILTER (WHERE j < 0.5) AS BIGINT) AS n_weak_pairs,
      CAST(coalesce(sum(_c) FILTER (WHERE j < 0.5), 0) AS BIGINT)
        AS n_weak_caught,
      CASE WHEN count(*) FILTER (WHERE j >= 0.5) > 0 THEN
        round(CAST(coalesce(sum(_c) FILTER (WHERE j >= 0.5), 0) AS DOUBLE)
              / CAST(count(*) FILTER (WHERE j >= 0.5) AS DOUBLE), 9)
      END AS recall,
      CASE WHEN count(*) FILTER (WHERE j < 0.5) > 0 THEN
        round(CAST(coalesce(sum(_c) FILTER (WHERE j < 0.5), 0) AS DOUBLE)
              / CAST(count(*) FILTER (WHERE j < 0.5) AS DOUBLE), 9)
      END AS weak_catch_rate
    FROM c GROUP BY bands, rows_per_band, s_threshold
    ORDER BY bands DESC
    """


@query("x100_lsh_plan_sweep", oracle=_x100_oracle())
def x100_lsh_plan_sweep(spark, sf_dir):
    """Empirical LSH plan sweep (dedup.lsh_plan_sweep): for every
    banding plan (b × r = 64), the MEASURED recall on true near-dup
    pairs and false-candidate rate on weak pairs — each pair's
    collision evaluated exactly from its real MinHash signatures (a
    band collides iff all r positions agree) — beside the theoretical
    S-curve threshold (1/b)^(1/r), computed driver-side so no
    engine-specific pow() touches the comparison. The (b, r) decision
    report: theory says where the recall cliff should sit, the measured
    columns say where it sits on THIS corpus. One x04 pair pass + one
    map-only signature pass; the sweep frame is pairs × 64 × 7 plans,
    bounded by the candidate-pair law."""
    from ._shared import shared_doc_sigs

    return dedup.lsh_plan_sweep(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        n_hashes=64, k=3, min_jaccard=0.2, dup_threshold=0.5,
        portable=True, sig_frame=shared_doc_sigs(spark, sf_dir),
    )


@query(
    "x103_pair_budget_estimate",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM s),
    dfq AS (SELECT s, count(*) AS df FROM inv GROUP BY s)
    SELECT CAST(pow(2, floor(log2(CAST(df AS DOUBLE)))) AS BIGINT)
             AS df_bucket_lo,
           count(*) AS n_shingles,
           CAST(sum(df * (df - 1) // 2) AS BIGINT)
             AS pair_candidates
    FROM dfq GROUP BY df_bucket_lo ORDER BY df_bucket_lo
    """,
)
def x103_pair_budget_estimate(spark, sf_dir):
    """Pre-flight pair-pass cost estimate (dedup.pair_budget_estimate):
    the EXACT co-occurrence-row count the x04 inverted-index self-join
    would produce, per power-of-2 shingle-df bucket, from one
    vocabulary-bounded (shingle → df) aggregation — each shingle
    contributes df·(df−1)/2 candidate rows, so the report prices the
    join WITHOUT running it. The capacity-planning gate a dedup
    scheduler consults before choosing inverted-index vs
    prefix-filtered plans (x04's two arms) or imposing a hot-shingle
    cap; all integer arithmetic end-to-end."""
    return dedup.pair_budget_estimate(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=3
    )


@query(
    "x110_triangle_census",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    e AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*))
             >= 0.3
    ),
    adj AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
    w AS (
      SELECT x.b AS wa, y.b AS wc
      FROM adj x JOIN adj y ON x.a = y.a AND x.b < y.b
    ),
    cw AS (
      SELECT count(*) AS closed FROM w
      WHERE EXISTS (SELECT 1 FROM e WHERE e.a = w.wa AND e.b = w.wc)
    ),
    tot AS (SELECT count(*) AS nw FROM w),
    ne AS (SELECT count(*) AS n_edges FROM e)
    SELECT CAST(ne.n_edges AS BIGINT) AS n_edges,
           CAST(tot.nw - cw.closed AS BIGINT) AS n_wedges,
           CAST(cw.closed // 3 AS BIGINT) AS n_triangles,
           CASE WHEN tot.nw > 0 THEN
             round(3.0 * (cw.closed // 3)
                   / ((tot.nw - cw.closed) + 3.0 * (cw.closed // 3)), 9)
           END AS closure_rate,
           CAST(0 AS BIGINT) AS n_capped_vertices
    FROM ne CROSS JOIN tot CROSS JOIN cw
    """,
)
def x110_triangle_census(spark, sf_dir):
    """Triangle census of the near-dup graph (graph.triangle_census
    over the x04 exact-Jaccard pairs at t=0.3): edges, open wedges,
    triangles, and the global clustering coefficient 3T/(wedges) — the
    transitivity audit completing the graph family (x62 sizes, x89
    degrees, x71 centrality): near-dup similarity SHOULD be transitive,
    so a wedge-rich/triangle-poor graph means the threshold sits on a
    cliff. Standard distributed triangle join: wedges built once per
    middle vertex (endpoint-ordered), closed by a semi-join against
    the edge set; work ∝ Σ deg² — the pair-engine law."""
    from ...operators.graph import triangle_census

    docs = table(spark, sf_dir, "documents")
    from ._shared import shared_jaccard_pairs

    pairs = shared_jaccard_pairs(spark, sf_dir)
    return triangle_census(pairs)


@query(
    "x113_winnow_pair_screen",
    oracle=dedup.duck_winnow_pair_screen_sql(
        "documents", "doc_id", "text", k=3, w=4, min_shared=2
    ),
)
def x113_winnow_pair_screen(spark, sf_dir):
    """Winnowing-fingerprint near-dup screen (dedup.winnow_pair_screen,
    the MOSS algorithm — Schleimer et al. SIGMOD'03): candidate pairs
    sharing ≥ 2 window-minimum fingerprints of word-3-grams at window
    w=4. The GUARANTEED-detection middle ground of the dedup family:
    any pair sharing a ≥ w+k−1 = 6-token run surfaces with certainty
    (x02's banding is probabilistic) while the inverted index carries
    only ~2/(w+1) = 40% of x04's shingle keys (same pair-count law, so
    x103's pre-flight estimate prices this join too). Per-row array
    expression → ONE fingerprint-keyed exchange → map-side-combined
    pair counts; integer-exact end to end."""
    return dedup.winnow_pair_screen(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        k=3, w=4, min_shared=2, portable=True,
    )


@query(
    "x115_sorted_neighborhood",
    oracle=dedup.duck_sorted_neighborhood_sql(
        "documents", "doc_id", "text", window=3, key_len=20, threshold=0.3
    ),
)
def x115_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup (dedup.sorted_neighborhood_pairs —
    Hernández & Stolfo's SNM): rank the corpus by a normalized 20-char
    prefix key (value_bucketed_rank — NO single-task window), verify
    exact word-3-shingle Jaccard on rank-window pairs (w=3). The
    blocking strategy whose candidate count is EXACTLY n·w regardless
    of duplication skew — the property x04/x113 buy with estimators and
    caps — traded against prefix-divergence recall (multi-key passes
    are the standard remedy). Range join rewritten as w equi-joins on
    rank+d; verification bounded at n·w pairs; hash-checked."""
    return dedup.sorted_neighborhood_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        window=3, key_len=20, threshold=0.3,
    )


def _x118_oracle() -> str:
    """Full-recompute oracle for the INCREMENTAL arm: MinHash(64, 16
    bands, portable) pairs over the WHOLE mutated corpus + recursive-CTE
    connected components — the incremental merge must reproduce this
    exactly (min-label CC composes over pairs(hist×hist) ∪ delta pairs)."""
    from ...operators.dedup import _duck_minhash_parts
    from ...operators.similarity import _dlit

    p = _duck_minhash_parts("text", 64, 16, 3, 42)
    thr = f"{p['agree']} / {_dlit(64)} >= {_dlit(0.35)}"
    return f"""
    WITH RECURSIVE
    th AS (SELECT doc_id AS _id, {p['tok']} AS th FROM documents),
    shn AS (SELECT _id, {p['shing']} AS sh FROM th),
    sig AS (SELECT _id, {p['sig']} AS sig FROM shn),
    ex AS (SELECT _id, bd.band AS band, bd.bh AS bh
           FROM (SELECT _id, unnest({p['bandlist']}) AS bd FROM sig)),
    cand AS (SELECT DISTINCT a._id AS id_a, b._id AS id_b
             FROM ex a JOIN ex b
             ON a.band = b.band AND a.bh = b.bh AND a._id < b._id),
    pairs AS (SELECT id_a, id_b
              FROM cand JOIN sig sa ON cand.id_a = sa._id
                        JOIN sig sb ON cand.id_b = sb._id
              WHERE {thr}),
    und AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    )
    SELECT src AS doc_id, min(dst) AS component,
           src % 7 = 0 AS is_new
    FROM reach GROUP BY src ORDER BY doc_id
    """


@query("x118_incremental_audit", oracle=_x118_oracle())
def x118_incremental_audit(spark, sf_dir):
    """INCREMENTAL dedup-graph maintenance (r8 verdict Next #2): the
    recurring-crawl production form of the shared audit pass. History
    (doc_id % 7 != 0) already holds component labels and a persisted
    MinHash sketch_store; today's batch (doc_id % 7 == 0) probes the
    STORE for its pairs (dedup.delta_minhash_pairs — no historical text
    is re-read, x77's discipline at pair grain) and
    audit.incremental_audit_merge folds those edges into the existing
    labels by contracting touched components to their label-nodes and
    running CC on the REDUCED graph (bounded by |batch| + |touched
    components|, never the corpus). The ORACLE is the full recompute
    over the mutated corpus — pairwise estimators + min-label CC make
    incremental ≡ full exactly, and the hash compare proves it. The
    reference's KV-state get-or-create pattern (`state/kv.go:45-80`)
    applied to the dedup graph."""
    from ...operators.audit import incremental_audit_merge

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 7 == 0
    delta = docs.filter(is_new)
    # ONE signature pass over history serves both the day-1 pair graph
    # and the delta probe — and it is the SESSION-SHARED signature frame
    # (same 64/k=3/seed=42/portable params), so the whole sketch family
    # (x87/x93/x94/x100/x118) pays the corpus hash once per session; in
    # production this is the durable streaming/sigstore table. The
    # day-1 LABELS are likewise the session-fitted shared frame
    # (shared_history_labels — r9): production READS yesterday's label
    # table, it never recomputes it, so what this entry measures after
    # the one-time fit is exactly the steady-state increment: delta
    # probe + reduced-graph merge.
    from ._shared import shared_doc_sigs, shared_history_labels

    store = (
        shared_doc_sigs(spark, sf_dir)
        .filter(~(F.col("doc_id") % 7 == 0))
        .select(F.col("doc_id").alias("_id"), "_sig")
    )
    old_comp = shared_history_labels(spark, sf_dir, threshold=0.35)
    dpairs = dedup.delta_minhash_pairs(
        delta, store, "doc_id", "text", threshold=0.35, portable=True
    )
    merged = incremental_audit_merge(
        old_comp, delta.select("doc_id"), dpairs, id_col="doc_id"
    )
    return merged.select(
        F.col("id").alias("doc_id"),
        "component",
        (F.col("id") % 7 == 0).alias("is_new"),
    ).orderBy("doc_id")


@query(
    "x119_snm_multikey",
    oracle=dedup.duck_multikey_snm_sql(
        "documents", "doc_id", "text", window=3, key_len=20, threshold=0.3
    ),
)
def x119_snm_multikey(spark, sf_dir):
    """MULTI-KEY sorted-neighborhood dedup (r8 verdict Next #3 —
    Hernández & Stolfo's standard recall remedy for x115's prefix-
    divergence trade): three blocking passes over three normalized sort
    orders — text prefix (the x115 key), REVERSED-text prefix (heads
    diverge, tails agree), and token-SORTED prefix (word reorders) —
    candidate sets unioned and de-duplicated before ONE exact-Jaccard
    verification. Candidates stay bounded at exactly n·window·3
    regardless of duplication skew (the skew-immunity x115 introduced,
    now with measured recall lift — SCALE.md). Hash-checked against the
    same three-order construction in DuckDB."""
    return dedup.sorted_neighborhood_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        window=3, key_len=20, threshold=0.3,
        keys=dedup._SNM_KEYS,
    )


def _x120_oracle() -> str:
    """DuckDB mirror of the choose_blocking pricing table: each
    discipline's candidate-pair cost from its OWN key histogram (the
    x103 co-occurrence law — shingles / band buckets / winnowed
    fingerprints; SNM by arithmetic), the same recall constants, the
    same eligibility/budget/choice booleans."""
    from ...operators.dedup import (
        _duck_minhash_parts,
        _P31,
        _SHINGLE_A,
        _DUCK_TOKEN_HASH,
    )

    p = _duck_minhash_parts("text", 64, 16, 3, 42)
    s_curve = round(1.0 - (1.0 - 0.5 ** 4) ** 16, 6)
    sh_e = "th[i]"
    for j in range(1, 3):
        sh_e = f"(({sh_e}) * {_SHINGLE_A} + th[i+{j}]) % {_P31}"
    w = 4
    return f"""
    WITH th AS (SELECT doc_id AS _id, {p['tok']} AS th FROM documents),
    shn AS (SELECT _id, {p['shing']} AS sh FROM th),
    exact_c AS (
      SELECT coalesce(sum(m * (m - 1) // 2), 0) AS c
      FROM (SELECT s, count(*) AS m
            FROM (SELECT unnest(sh) AS s FROM shn) GROUP BY s)
    ),
    sig AS (SELECT _id, {p['sig']} AS sig FROM shn),
    ex AS (SELECT _id, bd.band AS band, bd.bh AS bh
           FROM (SELECT _id, unnest({p['bandlist']}) AS bd FROM sig)),
    mh_c AS (
      SELECT coalesce(sum(m * (m - 1) // 2), 0) AS c
      FROM (SELECT band, bh, count(*) AS m FROM ex GROUP BY band, bh)
    ),
    kg AS (
      SELECT _id,
             CASE WHEN len(th) >= 3
                  THEN [{sh_e} for i in range(1, len(th) - 1)]
                  ELSE CAST([] AS BIGINT[]) END AS kgh
      FROM th
    ),
    fp AS (
      SELECT _id,
             CASE WHEN len(kgh) >= {w}
                  THEN list_distinct([list_min(kgh[i:i+{w - 1}])
                                      for i in range(1, len(kgh) - {w - 2})])
                  WHEN len(kgh) >= 1 THEN [list_min(kgh)]
                  ELSE CAST([] AS BIGINT[]) END AS f
      FROM kg
    ),
    wn_c AS (
      SELECT coalesce(sum(m * (m - 1) // 2), 0) AS c
      FROM (SELECT f, count(*) AS m
            FROM (SELECT unnest(f) AS f FROM fp) GROUP BY f)
    ),
    n AS (SELECT count(*) AS n FROM documents),
    t AS (
      SELECT 'exact_index' AS discipline,
             CAST((SELECT c FROM exact_c) AS BIGINT) AS cost,
             1.0 AS recall
      UNION ALL
      SELECT 'minhash_bands', CAST((SELECT c FROM mh_c) AS BIGINT),
             {s_curve}
      UNION ALL
      SELECT 'winnow_index', CAST((SELECT c FROM wn_c) AS BIGINT),
             CAST(NULL AS DOUBLE)
      UNION ALL
      SELECT 'sorted_neighborhood',
             CAST((SELECT n FROM n) * 3 * 3 AS BIGINT),
             CAST(NULL AS DOUBLE)
    ),
    e AS (
      SELECT *, recall IS NOT NULL AND recall >= 0.6 AS eligible,
             cost <= 20000 AS within_budget
      FROM t
    )
    SELECT discipline, cost, recall, eligible, within_budget,
           eligible AND cost = (SELECT min(cost) FROM e WHERE eligible)
             AS chosen
    FROM e ORDER BY discipline
    """


@query("x120_blocking_choice", oracle=_x120_oracle())
def x120_blocking_choice(spark, sf_dir):
    """The choose_blocking PLANNER itself, hash-verified (r8 verdict
    Next #5 carried to oracle grade): price the four blocking
    disciplines over the documents corpus — exact inverted index /
    MinHash(64,16) bands / winnowing(k=3,w=4) / 3-key
    sorted-neighborhood — at the (min_recall=0.6, pair_budget=20,000,
    t=0.5) contract and emit one row per discipline with its
    co-occurrence cost, recall bound, eligibility, budget fit, and the
    chosen flag. Every cost comes from a key histogram (one map-only
    pass + bounded agg per discipline; SNM is pure arithmetic), so this
    entry proves the planner's arithmetic cross-engine, not just its
    code path. Result frame is 4 rows — the bounded-collect pattern.
    The pricing histogram is the SESSION-SHARED stats table
    (shared_blocking_stats — same corpus+params as x140's planner call,
    bit-identical counts), so the planner family prices the corpus once
    per session; this entry's cost after the one-time fit is pure
    arithmetic + a 4-row createDataFrame."""
    from ...operators.dedup import choose_blocking
    from ._shared import shared_blocking_stats

    plan = choose_blocking(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        min_recall=0.6, pair_budget=20_000, threshold=0.5,
        portable=True,
        stats=shared_blocking_stats(spark, sf_dir, portable=True),
    )
    rows = [
        (
            name,
            d["cost"],
            d["recall"],
            d["eligible"],
            d["within_budget"],
            name == plan["chosen"],
        )
        for name, d in sorted(plan["disciplines"].items())
    ]
    return spark.createDataFrame(
        rows,
        "discipline string, cost long, recall double, eligible boolean, "
        "within_budget boolean, chosen boolean",
    ).orderBy("discipline")


@query(
    "x121_cluster_split",
    oracle=f"""
    WITH RECURSIVE
    s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.3
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ),
    comp AS (SELECT src AS doc_id, min(dst) AS component
             FROM reach GROUP BY src)
    SELECT doc_id, component,
           CASE WHEN {{b}} < 80 THEN 'train'
                WHEN {{b}} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM comp ORDER BY doc_id
    """.format(b="CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8)) AS UBIGINT) % 100"),
)
def x121_cluster_split(spark, sf_dir):
    """DEDUP-AWARE train/val/test assignment — the FIX whose guard is
    x45 (split-leakage audit): a per-document hash split puts near-dup
    twins on opposite sides of the train/eval fence; splitting at
    CLUSTER granularity makes leakage impossible BY CONSTRUCTION — every
    doc inherits the split of its connected component's label (min
    member id), so a near-dup pair (same component) can never straddle
    splits. Rides the session-shared pair graph + audit pass (ONE CC
    run for the whole audit family); the split itself is the x14
    deterministic hash-bucket rule applied to the component key.
    100 TB: one broadcast-map over the materialized label frame."""
    from ...operators.graph import connected_components
    from ...operators.sampling import split_assign

    docs = table(spark, sf_dir, "documents")
    from ._shared import shared_jaccard_pairs

    comp = connected_components(
        docs.select("doc_id"),
        shared_jaccard_pairs(spark, sf_dir),
        id_col="doc_id",
    )
    return comp.select(
        F.col("id").alias("doc_id"),
        "component",
        split_assign(
            "component", {"train": 0.8, "val": 0.1, "test": 0.1}
        ),
    ).orderBy("doc_id")


@query(
    "x123_edit_verify",
    oracle=dedup.duck_edit_verified_sql(
        "documents", "doc_id", "text", window=3, key_len=20, max_dist=60
    ),
)
def x123_edit_verify(spark, sf_dir):
    """Edit-distance-verified near-dup pairs (dedup.edit_verified_pairs):
    x115's sorted-neighborhood blocking (candidates EXACTLY n·w, skew-
    immune) verified with EXACT character Levenshtein instead of shingle
    Jaccard — the verifier for in-place edit near-dups. Cost guards:
    the |Δlen| ≤ d prefilter rides IN the join (edit distance ≥ length
    gap), and Spark's banded 3-arg levenshtein(a, b, threshold)
    early-exits each DP at the bound. Integer distances are exact
    cross-engine; sim = 1 − lev/max(len) rounds at 6."""
    return dedup.edit_verified_pairs(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        window=3, key_len=20, max_dist=60,
    )


@query(
    "x124_dup_spans",
    oracle=dedup.duck_dup_span_sql("documents", "doc_id", "text", k=8),
)
def x124_dup_spans(spark, sf_dir):
    """Cross-document duplicated-SPAN profile (dedup.dup_span_profile —
    the ExactSubstr diagnostic of Lee et al. 2022 at token-8-gram
    granularity): windows shared by ≥2 distinct docs, merged per doc
    into MAXIMAL spans by gaps-and-islands interval union; reports each
    doc's duplicated-token footprint (the RefinedWeb dup-n-gram
    threshold input). Two digest-keyed exchanges + per-doc windows —
    the honest O(corpus) ExactSubstr cost, no global sort."""
    return dedup.dup_span_profile(
        table(spark, sf_dir, "documents"), "doc_id", "text", k=8
    )


def _x139_oracle() -> str:
    """Final state of the incrementally-maintained label store: after any
    sequence of append-only batches, latest-wins read-back must equal
    the one-shot global computation — labels = min(doc_id) per content
    hash, shard = the deterministic md5 bucket of the id."""
    from ...operators.sampling import duck_hash_bucket

    return f"""
    SELECT d.doc_id AS id,
           min(d.doc_id) OVER (PARTITION BY md5(d.text)) AS component,
           CAST({duck_hash_bucket('d.doc_id', 16)} AS INT) AS shard
    FROM documents d
    ORDER BY id
    """


@query("x139_label_store_readback", oracle=_x139_oracle(), family="protocol")
def x139_label_store_readback(spark, sf_dir):
    """Durable label-table READ-BACK (r9 verdict Next #2's oracle arm):
    ingest the corpus as THREE append-only crawl batches (doc_id % 3),
    maintaining an on-disk SHARDED label store through
    `streaming/labelstore.append_label_patch` — batch 0 bootstraps,
    batches 1-2 append only `incremental_audit_merge(...,
    emit="changed")`'s upsert set (exact-duplicate pairs here, so the
    oracle is one window) — then read the store back latest-wins. The
    invariant the hash compare proves: an incrementally-maintained,
    patch-appended, shard-partitioned store reads back EXACTLY the
    one-shot global labels (min doc_id per content hash), with the
    stored shard matching the deterministic md5 bucket. The durable
    twin of the reference's BoltDB KV state (`state/kv.go:23-37`).

    100 TB shape: each patch is bounded by |batch| + |touched members|
    and lands with ONE exchange on the shard key; the read-back is a
    per-id window over slim label rows; no full-table rewrite ever
    happens (the thing this entry exists to keep true)."""
    import os
    import shutil

    from ...operators.audit import incremental_audit_merge
    from ...streaming.labelstore import (
        append_label_patch,
        read_label_store,
    )
    from pyspark.sql import Window

    base = os.path.join(
        "/tmp", f"gofish_x139_{spark.sparkContext.applicationId}"
    )
    labels_path = os.path.join(base, "labels")
    shutil.rmtree(base, ignore_errors=True)

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("_h")
    )
    for b in range(3):
        fresh = docs.filter(F.col("doc_id") % 3 == b)
        prev = read_label_store(spark, labels_path)
        if prev is None:
            w = Window.partitionBy("_h")
            patch = fresh.select(
                F.col("doc_id").alias("id"),
                F.min("doc_id").over(w).alias("component"),
            )
        else:
            # delta pairs: exact-dup edges touching >= 1 fresh doc (the
            # other side may be historical) — id_a < id_b
            hist = docs.filter(F.col("doc_id") % 3 < b)
            both = hist.unionByName(fresh)
            f2 = fresh.select(
                F.col("doc_id").alias("_fid"), F.col("_h").alias("_fh")
            )
            dpairs = (
                both.join(f2, both["_h"] == f2["_fh"])
                .filter(F.col("doc_id") != F.col("_fid"))
                .select(
                    F.least("doc_id", "_fid").alias("id_a"),
                    F.greatest("doc_id", "_fid").alias("id_b"),
                )
                .distinct()
            )
            patch = incremental_audit_merge(
                prev, fresh.select(F.col("doc_id").alias("id")), dpairs,
                id_col="id", emit="changed",
            )
        append_label_patch(patch, labels_path, batch_id=b, n_shards=16)

    raw = spark.read.parquet(labels_path)
    w = Window.partitionBy("id").orderBy(
        F.col("_batch_id").desc(), F.col("component").asc()
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "id", "component", F.col("shard").cast("int").alias("shard")
        )
        .orderBy("id")
    )


@query(
    "x140_run_blocking_handoff",
    oracle=dedup.duck_minhash_lsh_sql(
        "documents", "doc_id", "text", threshold=0.35
    ),
)
def x140_run_blocking_handoff(spark, sf_dir):
    """Planner → EXECUTION handoff under the oracle contract (r9
    verdict Next #3): choose_blocking prices the four disciplines from
    key histograms (min_recall 0.2 keeps MinHash's S-curve bound
    eligible at t=0.35), run_blocking executes the winner with the
    realized-candidate guard riding the plan (raise_error past estimate
    × slack). On any natural text corpus the band buckets are orders
    of magnitude cheaper than the shingle index, so the chosen
    discipline is the x02 pipeline — SAME oracle, genuinely different
    Spark path (pricing pass + in-plan budget enforcement wrapped
    around the pair join), which is exactly what this entry certifies:
    the priced, guarded route returns bit-identical pairs to the
    direct call. Not a duplicate of x02: a planner or guard bug (wrong
    discipline, wrong params threading, guard corrupting rows) fails
    THIS hash and not x02's. Pricing, the realized-count guard, AND
    the pair join all read the session-shared signature frame (same
    64/k=3/seed=42/portable params) — the corpus is hashed once per
    session, not once per stage. The pricing histogram is likewise the
    session-shared stats table (shared_blocking_stats — the same
    contract-independent counts x120 prices from), so the steady-state
    cost of this entry is the planner's arithmetic + the guarded pair
    join it certifies."""
    from ._shared import shared_blocking_stats, shared_doc_sigs

    docs = table(spark, sf_dir, "documents")
    sigs = shared_doc_sigs(spark, sf_dir).select(
        F.col("doc_id").alias("_id"), "_sig"
    )
    plan = dedup.choose_blocking(
        docs, "doc_id", "text", min_recall=0.2, pair_budget=10**9,
        threshold=0.35, portable=True, sigs=sigs,
        stats=shared_blocking_stats(spark, sf_dir, portable=True),
    )
    assert plan["chosen"] == "minhash_bands", plan
    return dedup.run_blocking(
        docs, "doc_id", "text", plan, sigs=sigs
    ).orderBy("id_a", "id_b")


@query(
    "x142_component_cohesion",
    oracle=f"""
    WITH RECURSIVE
    s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.3
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ),
    comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
    members AS (
      SELECT component, count(*) AS n_members FROM comp
      GROUP BY component HAVING count(*) >= 2
    ),
    edges AS (
      SELECT c.component, count(*) AS n_edges
      FROM pairs p JOIN comp c ON p.id_a = c.doc_id
      GROUP BY c.component
    )
    SELECT m.component,
           CAST(m.n_members AS BIGINT) AS n_members,
           CAST(coalesce(e.n_edges, 0) AS BIGINT) AS n_edges,
           round(CAST(coalesce(e.n_edges, 0) AS DOUBLE)
                 / CAST(m.n_members * (m.n_members - 1) // 2 AS DOUBLE), 9)
             AS density
    FROM members m LEFT JOIN edges e ON m.component = e.component
    ORDER BY m.component
    """,
)
def x142_component_cohesion(spark, sf_dir):
    """Per-cluster edge DENSITY of the dedup graph
    (audit.component_cohesion): edges / C(n,2) per component — the QA
    gauge for transitive-closure over-merging (a chain A~B~C closes
    {A,B,C} even when A≁C; density 1.0 = true clique, low density on a
    big cluster = a merge the threshold shouldn't have closed). Rides
    the session-shared pair graph + audit pass (one CC for the whole
    family); two bounded keyed aggs on top."""
    from ._shared import shared_dedup_audit, shared_jaccard_pairs
    from ...operators.audit import component_cohesion

    pairs = shared_jaccard_pairs(spark, sf_dir)
    audit = shared_dedup_audit(spark, sf_dir)
    return component_cohesion(audit.components, pairs)


@query(
    "x149_maintenance_policy",
    oracle="""
    WITH hist AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS component
      FROM documents WHERE doc_id % 10 != 0
    ),
    delta AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
    pairs AS (
      SELECT least(a.doc_id, b.doc_id) AS id_a,
             greatest(a.doc_id, b.doc_id) AS id_b
      FROM documents a JOIN documents b
        ON md5(a.text) = md5(b.text) AND a.doc_id != b.doc_id
      WHERE b.doc_id % 10 = 0
      GROUP BY 1, 2
    ),
    ends AS (
      SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs
    ),
    touched AS (
      SELECT DISTINCT h.component FROM hist h JOIN ends e
        ON h.doc_id = e.id
    ),
    tstats AS (
      SELECT count(*) AS members, count(DISTINCT h.component) AS comps
      FROM hist h JOIN touched t ON h.component = t.component
    ),
    base AS (
      SELECT (SELECT count(*) FROM hist) AS n_history,
             (SELECT count(*) FROM delta) AS n_delta,
             (SELECT members FROM tstats) AS touched_members,
             (SELECT comps FROM tstats) AS touched_components
    )
    SELECT CASE WHEN CAST(n_delta + touched_members AS DOUBLE)
                     / CAST(n_history + n_delta AS DOUBLE) <= 0.5
                THEN 'incremental' ELSE 'full' END AS action,
           CASE WHEN CAST(n_delta + touched_members AS DOUBLE)
                     / CAST(n_history + n_delta AS DOUBLE) <= 0.5
                THEN 'bounded_touch' ELSE 'touched_growth' END AS reason,
           CAST(n_history AS BIGINT) AS n_history,
           CAST(n_delta AS BIGINT) AS n_delta,
           CAST(0 AS BIGINT) AS n_edited,
           CAST(touched_components AS BIGINT) AS touched_components,
           CAST(touched_members AS BIGINT) AS touched_members,
           round(CAST(n_delta + touched_members AS DOUBLE)
                 / CAST(n_history + n_delta AS DOUBLE), 6)
             AS incremental_frac
    FROM base
    """,
)
def x149_maintenance_policy(spark, sf_dir):
    """The incremental-vs-full maintenance POLICY under the oracle
    contract (audit.maintenance_plan, r9 verdict Next #5): history =
    doc_id % 10 != 0 with exact-dup min-id labels, delta = the
    remaining tenth (append-only), delta pairs = content-hash edges
    touching the batch. The oracle recomputes every pricing input
    (history size, touched components/members from the endpoint→label
    lookup) and the decision rule itself in SQL — the hash compare
    certifies the policy's arithmetic, not just its direction. The
    decision-procedure-as-code family: x120 prices blocking, x105
    prices salting, THIS prices maintenance."""
    from pyspark.sql import Window

    from ...operators.audit import maintenance_plan

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("_h")
    )
    hist = docs.filter(F.col("doc_id") % 10 != 0)
    w = Window.partitionBy("_h")
    old = hist.select(
        F.col("doc_id").alias("id"),
        F.min("doc_id").over(w).alias("component"),
    )
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    d2 = delta.select(
        F.col("doc_id").alias("_did"), F.col("_h").alias("_dh")
    )
    dpairs = (
        docs.join(d2, docs["_h"] == d2["_dh"])
        .filter(F.col("doc_id") != F.col("_did"))
        .select(
            F.least("doc_id", "_did").alias("id_a"),
            F.greatest("doc_id", "_did").alias("id_b"),
        )
        .distinct()
    )
    p = maintenance_plan(old, delta.select(F.col("doc_id").alias("id")), dpairs)
    return spark.createDataFrame(
        [(
            p["action"], p["reason"], p["n_history"], p["n_delta"],
            p["n_edited"], p["touched_components"], p["touched_members"],
            round(p["incremental_frac"], 6),
        )],
        "action string, reason string, n_history bigint, n_delta bigint, "
        "n_edited bigint, touched_components bigint, "
        "touched_members bigint, incremental_frac double",
    )


def _x150_oracle() -> str:
    """The store contract in SQL: after any append sequence, the
    latest-wins read-back equals the portable MinHash signatures of the
    CURRENT corpus (with the edits applied) — fingerprinted as
    md5(comma-joined sig) so the 64-int signature rides the hash
    compare as one column."""
    p = dedup._duck_minhash_parts("text", 64, 16, 3, 42)
    return f"""
    WITH cur AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN 'edited ' || text
                  ELSE text END AS text
      FROM documents
    ),
    t AS (SELECT doc_id, {p['tok']} AS th FROM cur),
    s AS (SELECT doc_id, {p['shing']} AS sh FROM t),
    g AS (SELECT doc_id, {p['sig']} AS sig FROM s)
    SELECT doc_id, md5(array_to_string(sig, ',')) AS sig_md5
    FROM g ORDER BY doc_id
    """


@query("x150_sigstore_readback", oracle=_x150_oracle(), family="protocol")
def x150_sigstore_readback(spark, sf_dir):
    """Durable SIGNATURE-store read-back under the oracle contract (the
    x139 discipline applied to the sketch table): the corpus ingested
    as three append-only batches (doc_id % 3) through the
    streaming/sigstore writer, then every doc_id % 10 == 0 doc
    RE-APPENDED with edited text (a fourth batch — the latest-wins
    supersede case). The hash compare proves the store reads back the
    portable MinHash signatures of the CURRENT corpus — edits
    supersede, nothing stale survives — integer-for-integer against
    DuckDB's mirror of the whole hash pipeline (fingerprinted as
    md5(joined sig) per doc). Restart semantics are covered by the
    round-9 e2e; THIS entry pins the read-back values themselves."""
    import os
    import shutil

    from ...streaming.sigstore import read_signature_store

    from ._shared import shared_doc_sigs

    base = os.path.join(
        "/tmp", f"gofish_x150_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(base, ignore_errors=True)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = dedup.minhash_signature("text", 64, 3, 42, portable=True)
    # the un-edited batches append rows from the SESSION-SHARED
    # signature frame (identical params 64/k=3/seed=42/portable — the
    # same deterministic arrays, byte-for-byte): production appends
    # from the computed-once signature table, it does not re-hash the
    # corpus per batch (optimization r14, guide §1.2 — the x118
    # discipline applied to the protocol writers). The EDITED batch
    # below still computes its signatures (its text exists nowhere
    # else).
    shared = shared_doc_sigs(spark, sf_dir)

    def write_batch(bdf, batch_id):
        bdf.select(
            "doc_id", sig.alias("_sig")
        ).withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(base)

    for b in range(3):
        shared.filter(F.col("doc_id") % 3 == b).select(
            "doc_id", "_sig"
        ).withColumn("_batch_id", F.lit(b)).write.mode("append").parquet(
            base
        )
    edited = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.concat(F.lit("edited "), F.col("text")).alias("text")
    )
    write_batch(edited, 3)

    store = read_signature_store(spark, base, id_col="doc_id")
    return store.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                ",", F.transform(F.col("_sig"), lambda x: x.cast("string"))
            )
        ).alias("sig_md5"),
    ).orderBy("doc_id")


@query(
    "x151_cluster_source_breadth",
    oracle=f"""
    WITH RECURSIVE
    s AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM s),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.3
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ),
    comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
    j AS (
      SELECT c.component, d.source FROM comp c
      JOIN documents d ON c.doc_id = d.doc_id
    ),
    per AS (
      SELECT component, source, count(*) AS n_src
      FROM j GROUP BY component, source
    ),
    agg AS (
      SELECT component, sum(n_src) AS n_members,
             count(*) AS n_sources, max(n_src) AS top_n
      FROM per GROUP BY component HAVING sum(n_src) >= 2
    )
    SELECT component,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_sources AS BIGINT) AS n_sources,
           round(CAST(top_n AS DOUBLE) / CAST(n_members AS DOUBLE), 9)
             AS top_source_share
    FROM agg ORDER BY component
    """,
)
def x151_cluster_source_breadth(spark, sf_dir):
    """Cross-SOURCE breadth of each near-dup cluster: (n_members,
    n_sources, dominant-source share) per component — the provenance
    view of duplication the cluster-grain x62 histogram and the
    source-pair-grain x92 syndication matrix both miss: a cluster with
    n_sources = 1 is within-crawl duplication (dedup freely), a wide
    low-top-share cluster is SYNDICATED content whose removal shifts
    the source mix (x31/x72 should be re-read after collapsing it).
    Rides the session-shared audit pass; one (component, source)
    exchange + a bounded agg on top."""
    from ._shared import shared_dedup_audit

    audit = shared_dedup_audit(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    per = (
        audit.components.select(
            F.col("id").alias("doc_id"), "component"
        )
        .join(docs, "doc_id")
        .groupBy("component", "source")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    agg = (
        per.groupBy("component")
        .agg(
            F.sum("_n").alias("n_members"),
            F.count(F.lit(1)).alias("n_sources"),
            F.max("_n").alias("_top"),
        )
        .filter(F.col("n_members") >= 2)
    )
    return agg.select(
        "component",
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("n_sources").cast("bigint").alias("n_sources"),
        F.round(
            F.col("_top").cast("double") / F.col("n_members").cast("double"),
            9,
        ).alias("top_source_share"),
    ).orderBy("component")


def _x163_oracle() -> str:
    """Same invariant as x139 — the store reads back the one-shot
    global labels — but the Spark arm folds a COMPACTION into the
    middle of the batch sequence, so the hash compare certifies the
    generation+manifest reader of record, not just raw patches."""
    return """
    SELECT d.doc_id AS id,
           min(d.doc_id) OVER (PARTITION BY md5(d.text)) AS component
    FROM documents d
    ORDER BY id
    """


@query("x163_compacted_store_readback", oracle=_x163_oracle(), family="protocol")
def x163_compacted_store_readback(spark, sf_dir):
    """The r11 compaction discipline under the oracle contract: ingest
    the corpus as three append-only batches like x139, but COMPACT the
    store between batches 1 and 2 (generation directory written, then
    the manifest repointed atomically, then the superseded patches
    pruned — `compact_label_store`), so batch 2's patch lands ON TOP
    of a generation. The read-back goes through the reader of record
    (`read_label_store`: generation + newer patches + latest-wins) and
    must STILL equal the one-shot global labels (min doc_id per
    content hash) — the invariant compaction exists to preserve while
    collapsing read amplification (SCALE.md round-11 part 1: 10.9× →
    1.0 live files per shard). 100 TB shape: compaction work is
    bounded per shard; the repoint is one atomic rename; readers never
    block."""
    import os
    import shutil

    from pyspark.sql import Window

    from ...operators.audit import incremental_audit_merge
    from ...streaming.labelstore import (
        append_label_patch,
        compact_label_store,
        read_compaction_manifest,
        read_label_store,
    )

    base = os.path.join(
        "/tmp", f"gofish_x163_{spark.sparkContext.applicationId}"
    )
    labels_path = os.path.join(base, "labels")
    shutil.rmtree(base, ignore_errors=True)

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("_h")
    )
    for b in range(3):
        fresh = docs.filter(F.col("doc_id") % 3 == b)
        prev = read_label_store(spark, labels_path)
        if prev is None:
            w = Window.partitionBy("_h")
            patch = fresh.select(
                F.col("doc_id").alias("id"),
                F.min("doc_id").over(w).alias("component"),
            )
        else:
            hist = docs.filter(F.col("doc_id") % 3 < b)
            both = hist.unionByName(fresh)
            f2 = fresh.select(
                F.col("doc_id").alias("_fid"), F.col("_h").alias("_fh")
            )
            dpairs = (
                both.join(f2, both["_h"] == f2["_fh"])
                .filter(F.col("doc_id") != F.col("_fid"))
                .select(
                    F.least("doc_id", "_fid").alias("id_a"),
                    F.greatest("doc_id", "_fid").alias("id_b"),
                )
                .distinct()
            )
            patch = incremental_audit_merge(
                prev, fresh.select(F.col("doc_id").alias("id")), dpairs,
                id_col="id", emit="changed",
            )
        append_label_patch(patch, labels_path, batch_id=b, n_shards=16)
        if b == 1:  # fold batches 0-1 into generation 1 mid-sequence
            compact_label_store(spark, labels_path, n_shards=16)
            man = read_compaction_manifest(labels_path)
            assert man is not None and man["gen"] == 1

    return read_label_store(spark, labels_path).orderBy("id")


@query(
    "x169_selective_compaction_readback",
    oracle=_x163_oracle(),
    family="protocol",
)
def x169_selective_compaction_readback(spark, sf_dir):
    """SELECTIVE compaction under the oracle contract (r12 — the r11
    verdict's top scale gap, hash-certified): the x163 flow, but both
    folds are PER-SHARD. After batch 1 only shards 0–7 fold (first
    generation holds HALF the shards; the other half keeps serving
    from raw patches at the covered_default=-1 cut). After batch 2
    shards 4–11 fold: 4–7 re-fold from generation + newer patches,
    8–11 fold for the first time, and shards 0–3 are HARD-LINK-CARRIED
    into generation 2 untouched (zero bytes rewritten — the fold cost
    ∝ hot data property SCALE.md r12 measures at 4.7% of table bytes).
    The reader of record stitches generation + per-shard-cut patches
    via the manifest's covered map and must STILL equal the one-shot
    global labels. Shard membership is a pure id hash, so per-shard
    folds are independent — the invariant this entry pins."""
    import os
    import shutil

    from pyspark.sql import Window

    from ...operators.audit import incremental_audit_merge
    from ...streaming.labelstore import (
        append_label_patch,
        compact_label_store,
        read_compaction_manifest,
        read_label_store,
    )

    base = os.path.join(
        "/tmp", f"gofish_x169_{spark.sparkContext.applicationId}"
    )
    labels_path = os.path.join(base, "labels")
    shutil.rmtree(base, ignore_errors=True)

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("_h")
    )
    for b in range(3):
        fresh = docs.filter(F.col("doc_id") % 3 == b)
        prev = read_label_store(spark, labels_path)
        if prev is None:
            w = Window.partitionBy("_h")
            patch = fresh.select(
                F.col("doc_id").alias("id"),
                F.min("doc_id").over(w).alias("component"),
            )
        else:
            hist = docs.filter(F.col("doc_id") % 3 < b)
            both = hist.unionByName(fresh)
            f2 = fresh.select(
                F.col("doc_id").alias("_fid"), F.col("_h").alias("_fh")
            )
            dpairs = (
                both.join(f2, both["_h"] == f2["_fh"])
                .filter(F.col("doc_id") != F.col("_fid"))
                .select(
                    F.least("doc_id", "_fid").alias("id_a"),
                    F.greatest("doc_id", "_fid").alias("id_b"),
                )
                .distinct()
            )
            patch = incremental_audit_merge(
                prev, fresh.select(F.col("doc_id").alias("id")), dpairs,
                id_col="id", emit="changed",
            )
        append_label_patch(patch, labels_path, batch_id=b, n_shards=16)
        if b == 1:  # first fold: HALF the shards — gen 1 is partial
            compact_label_store(
                spark, labels_path, n_shards=16, shards=list(range(8))
            )
            man = read_compaction_manifest(labels_path)
            assert man is not None and man["gen"] == 1
            assert man["covered_default"] == -1
    # second fold: 4-11 (4-7 re-fold, 8-11 first fold, 0-3 carried)
    compact_label_store(
        spark, labels_path, n_shards=16, shards=list(range(4, 12))
    )
    man = read_compaction_manifest(labels_path)
    assert man["gen"] == 2 and len(man["covered"]) == 12
    return read_label_store(spark, labels_path).orderBy("id")


@query(
    "x174_sig_compaction_readback",
    oracle=_x150_oracle(),
    family="protocol",
)
def x174_sig_compaction_readback(spark, sf_dir):
    """SIG-store compaction under the oracle contract (r13 — the r12
    verdict's top gap: the last store with unbounded append history now
    folds on the shared kernel): the x150 flow — three sharded append
    batches plus an edit batch — with a FULL fold after batch 1 and a
    SELECTIVE fold (shards 0-7 hot, 8-15 hard-link-carried) after the
    edits. The read-back goes through the reader of record
    (`read_signature_store`: generation + per-shard-cut patches +
    latest-wins) and must STILL equal the portable MinHash signatures
    of the CURRENT corpus — edits supersede through two generations.
    100 TB shape: every read now opens ~1 file per shard plus the
    patch tail instead of the whole append history (the labels r11
    win, measured in SCALE.md r13); fold bytes ∝ hot shards only."""
    import os
    import shutil

    from ...streaming.sigstore import (
        append_sig_patch,
        compact_signature_store,
        read_signature_store,
    )
    from ...streaming.storekernel import read_store_manifest

    base = os.path.join(
        "/tmp", f"gofish_x174_{spark.sparkContext.applicationId}"
    )
    store = os.path.join(base, "sigs")
    shutil.rmtree(base, ignore_errors=True)
    from ._shared import shared_doc_sigs

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = dedup.minhash_signature("text", 64, 3, 42, portable=True)
    # un-edited batches append from the session-shared signature frame
    # (same params → identical arrays; the x150 comment applies)
    shared = shared_doc_sigs(spark, sf_dir)

    for b in range(3):
        append_sig_patch(
            shared.filter(F.col("doc_id") % 3 == b).select(
                "doc_id", "_sig"
            ),
            store, b, n_shards=16,
        )
        if b == 1:  # FULL fold mid-sequence: batches 0-1 → generation 1
            compact_signature_store(spark, store, n_shards=16)
            man = read_store_manifest(store)
            assert man is not None and man["gen"] == 1
    edited = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.lit("edited "), F.col("text")).alias("text"),
    )
    append_sig_patch(
        edited.select("doc_id", sig.alias("_sig")), store, 3, n_shards=16
    )
    # SELECTIVE fold: 0-7 re-fold from gen + newer patches; 8-15 carried
    compact_signature_store(
        spark, store, n_shards=16, shards=list(range(8))
    )
    man = read_store_manifest(store)
    assert man["gen"] == 2 and len(man["covered"]) == 8

    return (
        read_signature_store(spark, store, id_col="doc_id")
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(F.col("_sig"), lambda x: x.cast("string")),
                )
            ).alias("sig_md5"),
        )
        .orderBy("doc_id")
    )


def _x164_oracle() -> str:
    """The cross-store commit contract in SQL: the committed view
    joins every labeled id to its signature — one row per doc with the
    one-shot global label AND the portable MinHash fingerprint. A
    reader that could see sig/label skew (a batch's sigs without its
    labels) would break the inner-join cardinality and fail the row
    count before the hash."""
    p = dedup._duck_minhash_parts("text", 64, 16, 3, 42)
    return f"""
    WITH t AS (SELECT doc_id, text, {p['tok']} AS th FROM documents),
    s AS (SELECT doc_id, text, {p['shing']} AS sh FROM t),
    g AS (SELECT doc_id, text, {p['sig']} AS sig FROM s)
    SELECT doc_id AS id,
           min(doc_id) OVER (PARTITION BY md5(text)) AS component,
           md5(array_to_string(sig, ',')) AS sig_md5
    FROM g ORDER BY id
    """


@query("x164_committed_store_readback", oracle=_x164_oracle(), family="protocol")
def x164_committed_store_readback(spark, sf_dir):
    """The r11 ATOMIC CROSS-STORE COMMIT under the oracle contract:
    ingest the corpus as three batches, each appending (1) signatures,
    (2) the label patch, then (3) publishing the pair as ONE manifest
    version (`publish_store_commit`); read back through
    `read_committed_store`, which cuts BOTH stores at the committed
    batch — a reader can never see a batch's signatures without its
    labels. The output inner-joins the committed labels to the
    committed sigs per id, so any skew breaks the row count before the
    hash; values must equal the one-shot global labels plus the
    portable MinHash fingerprint of every doc (the x139 ∪ x150
    invariants through the consistent reader). 100 TB shape: the
    commit is one atomic rename per batch; both read cuts are
    partition-prunable `_batch_id` filters."""
    import os
    import shutil

    from pyspark.sql import Window

    from ...operators.audit import incremental_audit_merge
    from ...streaming.labelstore import (
        append_label_patch,
        publish_store_commit,
        read_committed_store,
        read_label_store,
    )

    base = os.path.join(
        "/tmp", f"gofish_x164_{spark.sparkContext.applicationId}"
    )
    labels_path = os.path.join(base, "labels")
    sig_dir = os.path.join(base, "_sigs")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    from ._shared import shared_doc_sigs

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.md5("text").alias("_h")
    )
    # batch signatures append from the session-shared signature frame
    # (same params → identical arrays; the x150 comment applies)
    shared = shared_doc_sigs(spark, sf_dir)
    for b in range(3):
        fresh = docs.filter(F.col("doc_id") % 3 == b)
        shared.filter(F.col("doc_id") % 3 == b).select(
            F.col("doc_id").alias("_id"), "_sig"
        ).withColumn("_batch_id", F.lit(b)).write.mode("append").parquet(
            sig_dir
        )
        prev = read_label_store(spark, labels_path)
        if prev is None:
            w = Window.partitionBy("_h")
            patch = fresh.select(
                F.col("doc_id").alias("id"),
                F.min("doc_id").over(w).alias("component"),
            )
        else:
            hist = docs.filter(F.col("doc_id") % 3 < b)
            both = hist.unionByName(fresh)
            f2 = fresh.select(
                F.col("doc_id").alias("_fid"), F.col("_h").alias("_fh")
            )
            dpairs = (
                both.join(f2, both["_h"] == f2["_fh"])
                .filter(F.col("doc_id") != F.col("_fid"))
                .select(
                    F.least("doc_id", "_fid").alias("id_a"),
                    F.greatest("doc_id", "_fid").alias("id_b"),
                )
                .distinct()
            )
            patch = incremental_audit_merge(
                prev, fresh.select(F.col("doc_id").alias("id")), dpairs,
                id_col="id", emit="changed",
            )
        append_label_patch(patch, labels_path, batch_id=b, n_shards=16)
        publish_store_commit(base, b)

    view = read_committed_store(spark, base)
    return (
        view["labels"]
        .join(view["sigs"].withColumnRenamed("_id", "id"), "id")
        .select(
            "id",
            "component",
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(F.col("_sig"), lambda x: x.cast("string")),
                )
            ).alias("sig_md5"),
        )
        .orderBy("id")
    )
