"""x-series — large-scale data-pipeline extensions (dedup, similarity,
text analysis, multimodal), per the north-star (BASELINE.json).

Each query exposes one operator from go_fish_spark.operators /
functions over the `documents` / `embeddings` tables. DuckDB oracles mirror
the Spark expression **operation-for-operation in the same order**, so
double-typed outputs are bit-identical and hash-comparable — including the
sketch family: MinHash-LSH and SimHash run their `portable` arms
(md5-prefix token hashes, integer-exact mirrors), and the quantizer ops
(IVF, SemDeDup) embed deterministically-fit centroids as SQL literals
(`fit_quantizer_det` + `duck_dist_list`), so every registry entry carries
a value-hash oracle. tests/test_dedup.py additionally checks sketch recall
against the exact-Jaccard / brute-force baselines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import table
from ..functions import text as tx
from ..functions import vectors
from ..operators import decontam, dedup, multimodal, similarity
from . import query

_EMB_DIM = 64

# Word-3-shingle set in DuckDB, mirroring functions.text.word_shingles.
_DUCK_SHINGLES = (
    "list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] "
    "for i in range(1, len(ws) - 1)])"
)


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
    "x06_ann_cosine_topk",
    oracle=f"""
    SELECT q.vec_id AS query_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {vectors.duck_cosine('c.embedding', 'q.embedding', _EMB_DIM)} DESC,
                      c.vec_id
           ) AS rank,
           c.vec_id AS vec_id,
           round({vectors.duck_cosine('c.embedding', 'q.embedding', _EMB_DIM)}, 6) AS cos
    FROM embeddings c
    JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q ON c.vec_id != q.vec_id
    QUALIFY rank <= 10
    ORDER BY query_id, rank
    """,
)
def x06_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for 5 query vectors: broadcast queries,
    corpus never shuffles, per-partition top-k before the merge."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(emb, queries, k=10).orderBy(
        "query_id", "rank"
    )


def _x13_oracle() -> str:
    from ..operators.dedup import duck_bucket_key

    planes = similarity.hyperplanes(_EMB_DIM, 8, 42)
    bk = duck_bucket_key("embedding", planes)
    cos = vectors.duck_cosine("c.embedding", "q.embedding", _EMB_DIM)
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bk} AS bk FROM embeddings)
    SELECT q.vec_id AS query_id,
           row_number() OVER (
             PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id
           ) AS rank,
           c.vec_id AS vec_id, round({cos}, 6) AS cos
    FROM b c JOIN (SELECT * FROM b WHERE vec_id < 5) q
      ON c.bk = q.bk AND c.vec_id != q.vec_id
    QUALIFY rank <= 10 ORDER BY query_id, rank
    """


@query("x13_ann_lsh", oracle=_x13_oracle())
def x13_ann_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN (the 100 TB scale path for x06: corpus
    shuffles once on an 8-bit bucket key; only bucket collisions are
    scored). The seeded literal planes make the bucket key
    deterministic, so the oracle mirrors it sign-for-sign (x37's
    duck_bucket_key) and the whole approximate search is hash-checked;
    recall vs brute force stays asserted in tests/test_dedup.py."""
    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_topk(
        emb, queries_df, dim=_EMB_DIM, k=10, n_planes=8
    ).orderBy("query_id", "rank")


from ..operators.sampling import duck_hash_bucket


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
    from ..operators.sampling import split_assign

    docs = table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id", split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    return (
        assigned.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("first_doc"))
        .orderBy("split")
    )


def _duck_sample_X(sf_dir: str):
    """Oracle-arm twin of ``similarity.deterministic_sample``: read
    ``sf_dir``'s embeddings with DuckDB in the same hash-total-order — the
    byte-identical fit input any engine reproduces from the same table.
    Returns None if the testdata is absent (→ rows-only fallback)."""
    import numpy as np

    try:
        import duckdb

        con = duckdb.connect()
        vs = con.execute(
            "SELECT CAST(embedding AS DOUBLE[]) AS v "
            f"FROM '{sf_dir}/embeddings.parquet' "
            "ORDER BY md5(CAST(vec_id AS VARCHAR)), CAST(vec_id AS VARCHAR) "
            "LIMIT 100000"
        ).df()["v"]
        return np.stack(vs.to_numpy()).astype(np.float64)
    except Exception:
        return None


def _det_centers(n_cells: int, sf_dir: str, seed: int = 42):
    """Deterministically-fit centroids for the ORACLE arm: the
    :func:`_duck_sample_X` sample through the same seeded numpy k-means —
    byte-identical centers to the Spark arm's ``fit_quantizer_det`` at the
    same SF (asserted in tests). The embeddings tables are regenerated per
    SF (same vec_id ≠ same vector), so the oracle is the CALLABLE form
    (queries.resolve_oracle) and re-fits at whichever SF the compare
    runs."""
    X = _duck_sample_X(sf_dir)
    if X is None:
        return None
    return similarity._kmeans_fit(X, n_cells, seed)


def _x15_oracle(sf_dir: str) -> str | None:
    centers = _det_centers(16, sf_dir)
    if centers is None:
        return None
    dl = similarity.duck_dist_list("embedding", centers)
    cos = vectors.duck_cosine("c.embedding", "p.qv", _EMB_DIM)
    return f"""
    WITH a AS (SELECT vec_id, embedding, dl AS _dl
               FROM (SELECT vec_id, embedding, {dl} AS dl FROM embeddings)),
    asg AS (SELECT vec_id, embedding, {similarity.duck_assign('_dl')} AS cell FROM a),
    qd AS (SELECT vec_id AS query_id, embedding AS qv, {dl} AS dl
           FROM embeddings WHERE vec_id < 5),
    pe AS (SELECT query_id, qv, CAST(unnest(range(0, 16)) AS INT) AS cell,
                  unnest(dl) AS d FROM qd),
    probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT query_id, qv, cell,
               row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS rn
        FROM pe
      ) WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, c.vec_id, {cos} AS cos
      FROM asg c JOIN probe p ON c.cell = p.cell AND c.vec_id != p.query_id
    )
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank,
           vec_id, round(cos, 6) AS cos
    FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank
    """


@query("x15_ann_ivf", oracle=_x15_oracle)
def x15_ann_ivf(spark, sf_dir):
    """IVF ANN (KMeans coarse quantizer, probe 4/16 cells) — the
    inverted-file billion-vector layout, in the oracle-checkable form:
    the quantizer is fit on a hash-total-ordered sample
    (fit_quantizer_det — engine-independent, so the oracle re-fits
    byte-identical centroids from the same table), and BOTH cell
    assignment and probe routing are pure column expressions over the
    centroid literals (ivf_topk_expr) mirrored bit-for-bit by
    duck_dist_list. Recall vs brute force stays asserted in
    tests/test_dedup.py; the pandas-UDF probe arms (driver/distributed)
    remain in similarity.ivf_topk."""
    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    q = similarity.fit_quantizer_det(emb, "vec_id", "embedding", 16)
    return similarity.ivf_topk_expr(
        emb, queries_df, q, k=10, n_probe=4
    ).orderBy("query_id", "rank")


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
    from ..operators.tfidf import tf_idf

    return tf_idf(
        table(spark, sf_dir, "documents"), "doc_id", "text", top_k=3
    ).orderBy("id", "rank")


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
    from ..operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.3)
    comp = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )
    return comp.select(F.col("id").alias("doc_id"), "component").orderBy(
        "doc_id"
    )


@query(
    "x19_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(i * stride AS BIGINT) AS frame_off,
           CAST(least(16, n - i * stride) AS BIGINT) AS frame_len
    FROM (
      SELECT doc_id,
             octet_length(encode(text)) AS n,
             greatest(octet_length(encode(text)) // 4, 1) AS stride
      FROM documents
    )
    CROSS JOIN (SELECT unnest(range(0, 4)) AS i)
    WHERE i * stride < n
    ORDER BY doc_id, frame_idx
    """,
)
def x19_frame_sample(spark, sf_dir):
    """Frame sampling plumbing: each media row fans out to ≤4 evenly-
    strided frame rows via mapInPandas (the 1→N batch shape; fake
    keyframes = byte windows). The offset/length math is a pure function
    of payload size, so the fan-out is fully oracle-checked; the frame
    bytes themselves are dropped from the comparison (binary column)."""
    binary_df = multimodal.ingest_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    frames = multimodal.sample_frames(binary_df, n_frames=4, frame_bytes=16)
    return frames.select(
        "doc_id", "frame_idx", "frame_off", "frame_len"
    ).orderBy("doc_id", "frame_idx")


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


_DUCK_STOP = ", ".join(f"'{w}'" for w in tx.STOPWORDS)


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
    "x11_multimodal_ingest",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS sha
    FROM documents ORDER BY doc_id
    """,
)
def x11_multimodal_ingest(spark, sf_dir):
    """Multimodal ingest plumbing: payload → (content: binary, meta struct
    with byte length + sha256), all JVM-side."""
    df = multimodal.ingest_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    return df.select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.sha").alias("sha")
    ).orderBy("doc_id")


@query(
    "x12_multimodal_decode",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) % 640 + 1                        AS width,
           (octet_length(encode(text)) * 7) % 480 + 1                  AS height,
           (octet_length(encode(text)) % 640 + 1)
             * ((octet_length(encode(text)) * 7) % 480 + 1)            AS n_pixels,
           'fake-decoded'                                              AS status
    FROM documents ORDER BY doc_id
    """,
)
def x12_multimodal_decode(spark, sf_dir):
    """Arrow-batched media decode via mapInPandas (deterministic fake
    codec; real codecs are a marked NotImplementedError integration
    point). Proves the batch shape, schema, and partition-parallel decode
    path."""
    binary_df = multimodal.ingest_binary(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    out = multimodal.decode_features(binary_df, codec="fake")
    return out.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "n_pixels",
        "status",
    ).orderBy("doc_id")


def _duck_curation_oracle() -> str:
    """x20's oracle: the whole curation pipeline composed from the
    per-stage SQL shapes that x07/x08/x01/x04/x18/x14 each hash-matched
    individually."""
    scores = tx.duck_lang_scores("text")
    score_cols = ", ".join(f"{e} AS s_{lang}" for lang, e in scores.items())
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in scores) + ")"
    whens = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in scores)
    quality = """
      0.4 * least(len(ws) / 100.0, 1.0)
      + 0.3 * (1.0 - len(list_filter(ws, w -> w IN ({stop}))) / len(ws))
      + 0.3 * least(((length(text) - (len(ws) - 1)) / len(ws)) / 10.0, 1.0)
    """.format(stop=_DUCK_STOP)
    from ..operators.sampling import duck_hash_bucket

    bucket = duck_hash_bucket("doc_id")
    return f"""
    WITH RECURSIVE
    langs AS (
      SELECT doc_id, text, ws, {score_cols}
      FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
    ),
    best_t AS (SELECT *, {best} AS best FROM langs),
    scored AS (
      SELECT doc_id, text, ws,
             CASE WHEN best <= 0 THEN 'und' {whens} ELSE 'und' END AS lang_pred,
             {quality} AS score
      FROM best_t
    ),
    kept AS (SELECT * FROM scored WHERE lang_pred = 'en' AND score >= 0.5),
    surv AS (
      SELECT doc_id, text, ws, lang_pred, score FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    ),
    sh_t AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM surv),
    inv AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh_t),
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
      SELECT doc_id, doc_id FROM surv
      UNION
      SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
    ),
    comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src)
    SELECT surv.doc_id, lang_pred, score,
           CASE WHEN {bucket} < 80 THEN 'train'
                WHEN {bucket} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM surv JOIN comp USING (doc_id)
    WHERE comp.component = surv.doc_id
    ORDER BY surv.doc_id
    """


@query("x20_curation_pipeline", oracle=_duck_curation_oracle())
def x20_curation_pipeline(spark, sf_dir):
    """END-TO-END curation: the full training-data flow as ONE composed
    DataFrame plan — language ID → quality gate (en, score ≥ 0.5) →
    exact dedup (min doc_id per content hash) → near-dup clustering
    (exact-Jaccard pairs → connected components) → keep each cluster's
    canonical doc → deterministic train/val/test assignment. Every stage
    is the already-oracle-verified operator (x07/x08/x01/x04/x18/x14);
    this query verifies their COMPOSITION hash-exactly."""
    from pyspark.sql import Window

    from ..operators.graph import connected_components
    from ..operators.sampling import split_assign

    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        tx.lang_id("text").alias("lang_pred"),
        tx.quality_score("text").alias("score"),
    )
    kept = scored.filter(
        (F.col("lang_pred") == "en") & (F.col("score") >= 0.5)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    # Persisted via the dedup cache registry so bench/release_caches()
    # can return executor storage between queries.
    surv = dedup._persist(
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    pairs = dedup.ngram_jaccard_pairs(surv, "doc_id", "text", k=3, threshold=0.3)
    comp = connected_components(surv.select("doc_id"), pairs, id_col="doc_id")
    return (
        surv.join(comp, surv["doc_id"] == comp["id"])
        .filter(F.col("doc_id") == F.col("component"))
        .select(
            "doc_id",
            "lang_pred",
            "score",
            split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
        )
        .orderBy("doc_id")
    )


# --- x21-x23: curation hygiene ops (decontamination, repetition, PII) ------

# Eval-benchmark membership: doc_id % 97 == 0 — a deterministic stand-in
# for "the benchmark set" (~1% of docs), identical on both engines.
_DUCK_EVAL = "doc_id % 97 = 0"


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
    from ..operators.chunking import chunk_documents

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
    from ..operators.chunking import pack_documents

    return pack_documents(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        capacity=2048, n_shards=64,
    ).orderBy("doc_id")


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
    emb = table(spark, sf_dir, "embeddings")
    q = similarity.fit_quantizer_det(emb, "vec_id", "embedding", 6)
    return dedup.semantic_dedup_pairs(
        emb, "vec_id", "embedding", threshold=0.45,
        quantizer=q, assign="expr", max_cell_size=100_000,
    ).orderBy("id_a", "id_b")


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
    from ..operators.ngrams import ngram_stats

    return ngram_stats(
        table(spark, sf_dir, "documents"), "doc_id", "text", n=2, top_k=100
    )


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
    from ..operators.sampling import weighted_sample

    df = table(spark, sf_dir, "documents").select(
        "doc_id", tx.quality_score("text").alias("score")
    )
    return weighted_sample(df, "doc_id", "score", scale=0.8).orderBy("doc_id")


# --- x29-x31: recurring-crawl dedup, per-stratum quality bar, mix report ---

# "Historical corpus" vs "new crawl batch": deterministic doc_id split
# (~80% historical), identical on both engines.
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
    from ..operators.sampling import top_fraction_per_group

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
    from ..operators.sampling import rebalance_mix

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tx.tokens("text")).alias("n")
    )
    return (
        rebalance_mix(docs, "doc_id", "source", "n")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


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
    from ..operators.ngrams import unigram_logprob

    return unigram_logprob(
        table(spark, sf_dir, "documents"), "doc_id", "text"
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
    from ..operators import similarity as _sim
    from ..operators.dedup import duck_bucket_key

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
    "x39_embedding_quantization",
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             [embedding[i]::DOUBLE for i in range(1, {_EMB_DIM + 1})] AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             list_max([abs(v[i]) for i in range(1, {_EMB_DIM + 1})]) / 127.0
               AS scale
      FROM v
    ),
    d AS (
      SELECT vec_id, v, scale,
             [greatest(-127.0, least(127.0, floor(v[i] / scale + 0.5))) * scale
              for i in range(1, {_EMB_DIM + 1})] AS deq
      FROM s WHERE scale > 0
    )
    SELECT vec_id,
           round(list_sum([v[i] * v[i] for i in range(1, 17)])
                 / list_sum([v[i] * v[i] for i in range(1, {_EMB_DIM + 1})]),
                 6) AS energy16,
           round(list_sum([v[i] * deq[i] for i in range(1, {_EMB_DIM + 1})])
                 / (sqrt(list_sum([v[i] * v[i] for i in range(1, {_EMB_DIM + 1})]))
                    * sqrt(list_sum([deq[i] * deq[i] for i in range(1, {_EMB_DIM + 1})]))),
                 6) AS cos_int8,
           round(scale, 9) AS scale
    FROM d ORDER BY vec_id
    """,
)
def x39_embedding_quantization(spark, sf_dir):
    """Embedding post-processing audit (functions/vectors.py): per vector,
    the matryoshka energy retained by a 16-dim truncation and the cosine
    between the original and its symmetric-int8 reconstruction — the two
    numbers that decide how an embedding store serves cheaper tiers from
    one stored vector. Pure array expressions (zip_with/aggregate
    HOFs, JVM-side, map-only — at 100 TB this runs at scan speed with
    zero shuffles); the rounding inside quantization is an explicit
    floor(x+0.5) so the DuckDB mirror is bit-identical."""
    emb = table(spark, sf_dir, "embeddings")
    df = (
        emb.withColumn("_scale", vectors.quant_scale("embedding"))
        .filter(F.col("_scale") > 0)
        .withColumn(
            "_deq",
            vectors.dequantize(
                vectors.quantize_int8("embedding", F.col("_scale")),
                F.col("_scale"),
            ),
        )
    )
    return df.select(
        "vec_id",
        F.round(vectors.energy_fraction("embedding", 16), 6).alias("energy16"),
        F.round(vectors.cosine("embedding", F.col("_deq")), 6).alias("cos_int8"),
        F.round(F.col("_scale"), 9).alias("scale"),
    ).orderBy("vec_id")


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
    from ..operators import sampling

    return (
        sampling.epoch_upsample(
            table(spark, sf_dir, "documents"),
            "doc_id", "source", "n_chars", budget_factor=2.0,
        )
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    )


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
    from ..operators.ngrams import novelty_score

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


from ..operators.dsir import dsir_weights, duck_dsir_sql


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


def _x44_oracle(sf_dir: str) -> str | None:
    X = _duck_sample_X(sf_dir)
    if X is None:
        return None
    pq = similarity.ProductQuantizer(similarity._pq_fit(X, m=4, ksub=16, seed=42))
    codes = similarity.duck_pq_codes("embedding", pq)
    dts = similarity.duck_pq_dtables("embedding", pq)
    m = len(pq.books)
    return f"""
    WITH coded AS (SELECT vec_id, {codes} AS codes FROM embeddings),
    q AS (SELECT vec_id AS query_id, {dts} AS dt
          FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_reduce(
               [(q.dt[j])[(c.codes[j]) + 1] for j in range(1, {m + 1})],
               (a, b) -> a + b) AS adist
      FROM coded c, q WHERE c.vec_id != q.query_id
    )
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank,
           vec_id, round(adist, 6) AS adist
    FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank
    """


@query("x44_pq_adc", oracle=_x44_oracle)
def x44_pq_adc(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): the corpus compresses
    to m=4 sub-codes (4×16-way codebooks over 16-dim blocks — the memory
    layout that fits a 100 TB embedding store in cluster RAM), each query
    precomputes its 4×16 ADC distance tables, and candidates cost 4 table
    lookups each. Codebooks are fit deterministically (fit_pq_det, the
    x15/x26 contract), codes and tables are pure column expressions over
    centroid literals, and the oracle re-derives everything from the same
    table — the full compress→search path is hash-checked. The coded
    corpus never shuffles; the query side broadcasts."""
    emb = table(spark, sf_dir, "embeddings")
    pq = similarity.fit_pq_det(emb, "vec_id", "embedding", m=4, ksub=16)
    return similarity.adc_topk(
        emb, emb.filter(F.col("vec_id") < 5), pq, k=10
    ).orderBy("query_id", "rank")


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
    join-back touches only pair ids."""
    from ..operators.sampling import split_assign

    docs = table(spark, sf_dir, "documents")
    return decontam.split_leakage(
        docs, "doc_id", "text",
        split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
        k=3, threshold=0.3,
    ).orderBy("id_a", "id_b")


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
    from ..operators.chunking import token_budget_report

    return token_budget_report(table(spark, sf_dir, "documents"), "text")


def _x47_oracle(sf_dir: str) -> str | None:
    X = _duck_sample_X(sf_dir)
    if X is None:
        return None
    coarse = similarity._kmeans_fit(X, 16, 42)
    D = -2.0 * (X @ coarse.T) + (coarse**2).sum(axis=1)[None, :]
    R = X - coarse[D.argmin(axis=1)]
    pq = similarity.ProductQuantizer(similarity._pq_fit(R, m=4, ksub=16, seed=42))
    cl = similarity.duck_centers_lit(coarse)
    dl = similarity.duck_dist_list("embedding", coarse)
    rv = (
        f"[embedding[i]::DOUBLE - (({cl})[cell + 1])[i] "
        f"for i in range(1, {_EMB_DIM + 1})]"
    )
    codes = similarity.duck_pq_codes("rv", pq)
    dts = similarity.duck_pq_dtables("rv", pq)
    m = len(pq.books)
    return f"""
    WITH a0 AS (SELECT vec_id, embedding, {dl} AS dl FROM embeddings),
    asg AS (SELECT vec_id, embedding, {similarity.duck_assign('dl')} AS cell
            FROM a0),
    resc AS (SELECT vec_id, cell, {rv} AS rv FROM asg),
    coded AS (SELECT vec_id, cell, {codes} AS codes FROM resc),
    qd AS (SELECT vec_id AS query_id, embedding, {dl} AS dl
           FROM embeddings WHERE vec_id < 5),
    pe AS (SELECT query_id, embedding, CAST(unnest(range(0, 16)) AS INT) AS cell,
                  unnest(dl) AS d FROM qd),
    probe AS (
      SELECT query_id, embedding, cell FROM (
        SELECT query_id, embedding, cell,
               row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS rn
        FROM pe) WHERE rn <= 4
    ),
    pres AS (SELECT query_id, cell, {rv} AS rv FROM probe),
    pdt AS (SELECT query_id, cell, {dts} AS dt FROM pres),
    scored AS (
      SELECT p.query_id, c.vec_id,
             list_reduce(
               [(p.dt[j])[(c.codes[j]) + 1] for j in range(1, {m + 1})],
               (a, b) -> a + b) AS adist
      FROM coded c JOIN pdt p ON c.cell = p.cell AND c.vec_id != p.query_id
    )
    SELECT query_id,
           row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rank,
           vec_id, round(adist, 6) AS adist
    FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank
    """


@query("x47_ivfpq", oracle=_x47_oracle)
def x47_ivfpq(spark, sf_dir):
    """IVF-PQ (Jégou et al. 2011): the full billion-vector layout — a
    16-cell coarse quantizer routes queries to 4 probed cells, the corpus
    stores residual PQ codes (4×16-way codebooks trained on cell
    residuals), and scoring is per-probed-cell residual ADC. Both models
    fit deterministically from the hash-ordered sample (fit_ivfpq_det),
    every stage is a pure column expression over centroid literals, and
    the oracle re-derives routing + codes + tables from the same table —
    the composite x15 ∘ x44 path is hash-checked end to end. Both sides
    exchange once on the cell key; raw vectors never shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    coarse, pq = similarity.fit_ivfpq_det(
        emb, "vec_id", "embedding", n_cells=16, m=4, ksub=16
    )
    return similarity.ivfpq_topk_expr(
        emb, emb.filter(F.col("vec_id") < 5), coarse, pq, k=10, n_probe=4
    ).orderBy("query_id", "rank")


from ..operators.sampling import duck_hash_uniform

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
    from ..operators.sampling import temperature_sample

    return (
        temperature_sample(
            table(spark, sf_dir, "documents"), "doc_id", "source", "n_chars",
            tau=0.7,
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "x49_best_quality_canonical",
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
    q AS (
      SELECT doc_id,
             0.4 * least(n_words / 100.0, 1.0)
               + 0.3 * (1.0 - stop_ratio)
               + 0.3 * least(mean_word_len / 10.0, 1.0) AS q
      FROM (
        SELECT doc_id,
               len(ws) AS n_words,
               len(list_filter(ws, w -> w IN ({_DUCK_STOP}))) / len(ws) AS stop_ratio,
               (length(text) - (len(ws) - 1)) / len(ws) AS mean_word_len
        FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
      )
    ),
    r AS (
      SELECT comp.component, comp.doc_id, q.q,
             row_number() OVER (PARTITION BY comp.component
                                ORDER BY q.q DESC, comp.doc_id) AS rn,
             count(*) OVER (PARTITION BY comp.component) AS n_members
      FROM comp JOIN q USING (doc_id)
    )
    SELECT component, doc_id AS canonical_id, n_members,
           round(q, 6) AS best_quality
    FROM r WHERE rn = 1 ORDER BY component
    """,
)
def x49_best_quality_canonical(spark, sf_dir):
    """Quality-argmax canonical selection: collapse each near-dup cluster
    (connected components over the x04 Jaccard pairs, x18's engine) to
    its HIGHEST-quality member instead of the min-id — the curation
    refinement that keeps the cleanest copy of every duplicated document
    (min-id keeps whichever crawl happened first). Deterministic: ties
    break to the lower doc_id; the quality expression is bit-identical
    across engines (x08), so the argmax is oracle-checkable. One window
    over the component key on top of the CC output."""
    from pyspark.sql import Window

    from ..operators.graph import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.3)
    comp = connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
    q = docs.select(F.col("doc_id"), tx.quality_score("text").alias("_q"))
    j = comp.select(F.col("id").alias("doc_id"), "component").join(q, "doc_id")
    w = Window.partitionBy("component").orderBy(F.col("_q").desc(), F.col("doc_id"))
    ranked = (
        j.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy("component")))
    )
    return (
        ranked.filter(F.col("_rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("canonical_id"),
            "n_members",
            F.round("_q", 6).alias("best_quality"),
        )
        .orderBy("component")
    )


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
    from ..operators.ngrams import source_span_overlap

    return source_span_overlap(
        table(spark, sf_dir, "documents"), "source", "text", k=8
    ).orderBy("source_a", "source_b")


def _x51_oracle(sf_dir: str) -> str | None:
    centers = _det_centers(16, sf_dir)
    if centers is None:
        return None
    dl = similarity.duck_dist_list("embedding", centers)
    return f"""
    WITH a AS (SELECT vec_id, {dl} AS dl FROM embeddings),
    asg AS (SELECT vec_id, {similarity.duck_assign('dl')} AS cell,
                   list_min(dl) AS d2 FROM a)
    SELECT cell, count(*) AS n_vectors,
           round(CAST(sum(CAST(round(sqrt(d2), 9) AS DECIMAL(20,9))) AS DOUBLE)
                 / count(*), 6) AS mean_dist
    FROM asg GROUP BY cell ORDER BY cell
    """


@query("x51_cell_balance", oracle=_x51_oracle)
def x51_cell_balance(spark, sf_dir):
    """Quantizer cell-balance report — the health check an IVF index
    needs before serving (x15/x47's routing assumes cells are roughly
    even; a degenerate fit concentrates the corpus in few cells and turns
    probes into scans — exactly the skew x26's cell cap guards). Per
    cell: vector count and mean centroid distance (sqrt of the assignment
    minimum — no second distance pass), accumulated decimal-exact so the
    mean is partitioning-invariant. One exchange on the bounded cell
    key."""
    emb = table(spark, sf_dir, "embeddings")
    q = similarity.fit_quantizer_det(emb, "vec_id", "embedding", 16)
    asg = emb.select(
        F.col("vec_id"), q.dist_expr_arr("embedding").alias("_dl")
    ).select(
        "vec_id",
        F.expr("CAST(array_position(_dl, array_min(_dl)) - 1 AS INT)").alias("cell"),
        F.array_min("_dl").alias("d2"),
    )
    return (
        asg.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum(F.round(F.sqrt("d2"), 9).cast("decimal(20,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_dist"),
        )
        .orderBy("cell")
    )


from .util import duck_ts_str, ts_str


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
    from ..functions.text import bpe_ish_token_count, tokens

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
    from ..functions.text import tokens

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
    from ..operators.sampling import source_cap

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return source_cap(docs, "source", "doc_id", cap=300).orderBy("doc_id")


_BM25_TERMS = ["spark", "window", "hash", "merge"]

from ..operators.retrieval import duck_bm25_sql  # noqa: E402


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
    from ..operators.retrieval import bm25_scores

    docs = table(spark, sf_dir, "documents")
    return bm25_scores(
        docs, "doc_id", "text", _BM25_TERMS
    ).orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(100)


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
    from ..operators.sampling import global_hash_order

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return (
        global_hash_order(docs, "doc_id", seed="seed0")
        .select("position", "doc_id")
        .orderBy("position")
        .limit(100)
    )


@query(
    "x59_knn_classify",
    oracle=f"""
    WITH nn AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round({vectors.duck_cosine('c.embedding', 'q.embedding', _EMB_DIM)}, 6) AS cos,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {vectors.duck_cosine('c.embedding', 'q.embedding', _EMB_DIM)} DESC,
                        c.vec_id) AS rank
      FROM embeddings c
      JOIN (SELECT * FROM embeddings WHERE vec_id < 20) q ON c.vec_id != q.vec_id
      QUALIFY rank <= 10
    ),
    votes AS (
      SELECT nn.query_id, c.label AS _nl, count(*) AS n_votes,
             max(nn.cos) AS top_cos
      FROM nn JOIN embeddings c ON nn.vec_id = c.vec_id
      GROUP BY nn.query_id, c.label
    )
    SELECT query_id, _nl AS label_pred, CAST(n_votes AS BIGINT) AS n_votes,
           round(top_cos, 6) AS top_cos
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY n_votes DESC, _nl) AS r
          FROM votes)
    WHERE r = 1 ORDER BY query_id
    """,
)
def x59_knn_classify(spark, sf_dir):
    """k-NN majority-vote labeling (similarity.knn_classify): predict
    each of the first 20 vectors' labels from their 10 exact-cosine
    nearest labeled neighbors — the labeled-seed-set classifier of a
    curation pipeline. Queries broadcast against the corpus (never
    shuffled), the neighbor table broadcasts into the label join
    (map-only), and only the ≤ queries×k vote rows shuffle. Vote ties
    break to the smaller label; deterministic and hash-checked."""
    from ..operators.similarity import knn_classify

    emb = table(spark, sf_dir, "embeddings")
    return knn_classify(
        emb, emb.filter(F.col("vec_id") < 20), "vec_id", "embedding",
        "label", k=10,
    ).orderBy("query_id")


from ..operators.ngrams import duck_bigram_logprob_sql  # noqa: E402
from ..operators.similarity import (  # noqa: E402
    duck_jl_project_exprs,
    hyperplanes,
    jl_project_expr,
)


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
    from ..operators.ngrams import bigram_logprob

    docs = table(spark, sf_dir, "documents")
    return bigram_logprob(docs, "doc_id", "text", lam=0.7).orderBy("doc_id")


_JL_PLANES = hyperplanes(_EMB_DIM, 16, seed=7)
_JL_DIMS = ", ".join(str(j) for j in range(16))
_JL_EXPRS = ", ".join(duck_jl_project_exprs("embedding", _JL_PLANES, _EMB_DIM))


@query(
    "x61_jl_projection",
    oracle=f"""
    SELECT vec_id, unnest([{_JL_DIMS}]) AS dim,
           unnest([{", ".join(f"round({e}, 6)" for e in duck_jl_project_exprs("embedding", _JL_PLANES, _EMB_DIM))}]) AS val
    FROM embeddings ORDER BY vec_id, dim
    """,
)
def x61_jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64→16
    (similarity.jl_project_expr, seeded Gaussian planes): the
    dimensionality cut that shrinks every downstream embedding op's
    distance work 4× with JL-bounded distortion. Pure per-row map (zero
    shuffles, no UDF, planes are parsed literals); output exploded to
    (vec_id, dim, val) scalars for hashing."""
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.posexplode(jl_project_expr("embedding", _JL_PLANES)).alias(
                "dim", "_v"
            ),
        )
        .select("vec_id", "dim", F.round("_v", 6).alias("val"))
        .orderBy("vec_id", "dim")
    )


@query(
    "x62_cluster_size_histogram",
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
    sizes AS (SELECT component, count(*) AS sz FROM comp GROUP BY component)
    SELECT CAST(pow(2, floor(log2(sz))) AS BIGINT) AS bucket_lo,
           count(*) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY 1 ORDER BY bucket_lo
    """,
)
def x62_cluster_size_histogram(spark, sf_dir):
    """Near-dup cluster-size histogram — the dedup AUDIT a pipeline
    publishes alongside its dedup pass: clusters of the x04 Jaccard
    graph (x18's CC engine) binned by power-of-2 size, with doc totals
    per bin. A crawl whose mass sits in large bins is dominated by
    boilerplate/mirrors; the histogram is how that is seen before
    deleting anything. Bin aggregation is a bounded-key groupBy on top
    of the CC output (integer-exact; graph.cluster_size_histogram)."""
    from ..operators.graph import cluster_size_histogram, connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.3)
    comp = connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
    return cluster_size_histogram(comp)


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
    from ..operators.sampling import curriculum_order

    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", tx.quality_score("text").alias("_q")
    )
    return (
        curriculum_order(scored, "doc_id", "_q", n_stages=5, seed="cur0")
        .select("position", "stage", "doc_id")
        .orderBy("position")
    )


def _x64_oracle() -> str:
    from ..operators.dedup import duck_bucket_key

    planes = similarity.hyperplanes(_EMB_DIM, 8, 42)
    bk = duck_bucket_key("embedding", planes)
    cos = vectors.duck_cosine("c.embedding", "q.embedding", _EMB_DIM)
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bk} AS bk FROM embeddings),
    nn AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round({cos}, 6) AS cos,
             row_number() OVER (
               PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id) AS rank
      FROM b c JOIN b q ON c.bk = q.bk AND c.vec_id != q.vec_id
      QUALIFY rank <= 10
    )
    SELECT a.query_id AS id_a, a.vec_id AS id_b, a.cos,
           a.rank AS rank_ab, b.rank AS rank_ba
    FROM nn a JOIN nn b ON a.query_id = b.vec_id AND a.vec_id = b.query_id
    WHERE a.query_id < a.vec_id ORDER BY id_a, id_b
    """


@query("x64_mutual_knn", oracle=_x64_oracle())
def x64_mutual_knn(spark, sf_dir):
    """Mutual-kNN pairs (similarity.mutual_knn_pairs, k=10, LSH arm):
    vector pairs each in the OTHER's within-bucket cosine top-k — the
    symmetric-consistency (hubness-filtering) criterion of bitext
    mining, and a higher-precision near-dup candidate set. The bucket
    EQUI-JOIN (seeded literal planes, x13/x37's mirror) replaces the
    O(n²) all-pairs scan — candidate work ≈ n²/2^planes, held flat by
    the x37 plane-growth law — then ONE self-join of the slim neighbor
    table on the reversed key pair. The brute arm stays available as
    the labeled baseline (tests/test_curation.py checks mutuality
    against it)."""
    from ..operators.similarity import mutual_knn_pairs

    emb = table(spark, sf_dir, "embeddings")
    return mutual_knn_pairs(
        emb, "vec_id", "embedding", k=10, method="lsh", dim=_EMB_DIM,
        n_planes=8,
    ).orderBy("id_a", "id_b")


def _x65_centroids(sf_dir: str):
    """Per-label mean centroids for the ORACLE arm, re-fit from the same
    parquet through DuckDB with the SAME decimal(38,12) per-(label,dim)
    sums the Spark fit uses (fit_label_centroids) — decimal accumulation
    is exact and order-independent, so both engines produce byte-equal
    float64 centroids from float(sum)/count."""
    import os

    import duckdb

    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        return None, None
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT label, d, sum(CAST(v AS DECIMAL(38,12))) AS s, count(*) AS n
        FROM (
          SELECT label,
                 generate_subscripts(embedding, 1) - 1 AS d,
                 unnest(embedding) AS v
          FROM read_parquet('{path}') WHERE vec_id % 5 != 0
        ) GROUP BY label, d
        """
    ).fetchall()
    import numpy as np

    labels = sorted({r[0] for r in rows})
    idx = {l: i for i, l in enumerate(labels)}
    cent = np.zeros((len(labels), _EMB_DIM), dtype=np.float64)
    for l, d, s, n in rows:
        cent[idx[l], d] = float(s) / n
    return labels, cent


def _x65_oracle(sf_dir: str) -> str | None:
    labels, cent = _x65_centroids(sf_dir)
    if labels is None:
        return None
    pred = similarity.duck_nearest_centroid_label("embedding", labels, cent)
    return f"""
    SELECT label, {pred} AS label_pred, CAST(count(*) AS BIGINT) AS n
    FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2
    """


@query("x65_nearest_centroid", oracle=_x65_oracle)
def x65_nearest_centroid(spark, sf_dir):
    """Nearest-centroid (Rocchio) classification: per-label mean vectors
    fit on the vec_id%5≠0 slice (decimal-exact, order-independent —
    fit_label_centroids), every vector classified by a PURE column
    expression over the centroid literals (nearest_centroid_label — no
    join/UDF/state, so the same expression scores a live stream), and
    the (label, label_pred) confusion matrix reported. The oracle re-fits
    byte-equal centroids from the same parquet via DuckDB's decimal sums
    — the x15/x26 cross-engine re-fit pattern."""
    from ..operators.similarity import fit_label_centroids, nearest_centroid_label

    emb = table(spark, sf_dir, "embeddings")
    labels, cent = fit_label_centroids(
        emb.filter(F.col("vec_id") % 5 != 0), "label", "embedding", _EMB_DIM
    )
    pred = nearest_centroid_label("embedding", labels, cent)
    return (
        emb.select("label", pred.alias("label_pred"))
        .groupBy("label", "label_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "label_pred")
    )
