"""Shared constants/helpers for the x-series extension families —
DuckDB oracle fragments (shingle/stopword mirrors) and the deterministic
cross-engine quantizer fit used by every centroid-literal oracle."""

from __future__ import annotations

from ...functions import text as tx
from ...operators import similarity


_EMB_DIM = 64

# Word-3-shingle set in DuckDB, mirroring functions.text.word_shingles.


_DUCK_SHINGLES = (
    "list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] "
    "for i in range(1, len(ws) - 1)])"
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


_DUCK_STOP = ", ".join(f"'{w}'" for w in tx.STOPWORDS)


_DUCK_EVAL = "doc_id % 97 = 0"


# --- shared fitted MinHash signature frame (round-8 perf item) --------------
#
# x87 / x93 / x94(old side) / x100 all consume per-document MinHash
# signatures of the SAME corpus at the SAME params (64 hashes, k=3,
# seed=42, portable). Fitting them once per (session, sf_dir) and
# persisting the slim (doc_id, source, _sig) frame is the x66
# shared-audit pattern applied to the sketch family: every consumer
# reads the materialized frame instead of re-tokenizing + 64×-hashing
# the corpus. At 100 TB this frame is the signature TABLE a pipeline
# writes once (one map-only pass) and every sketch audit scans — the
# cache here is the session-local form of that materialization.

_SIG_FRAMES: dict = {}


def shared_doc_sigs(
    spark,
    sf_dir: str,
    n_hashes: int = 64,
    k: int = 3,
    seed: int = 42,
    portable: bool = True,
):
    """Session-cached per-document MinHash signature frame over
    ``sf_dir``'s documents table: columns (doc_id, source, _sig), persisted
    on first use (MEMORY_AND_DISK — ~n_hashes ints per doc, far smaller
    than the text it replaces). Keyed by (applicationId, sf_dir, params)
    so a new session or SF refits."""
    from pyspark import StorageLevel

    from ...catalog import table
    from ...operators.dedup import minhash_signature

    key = (
        spark.sparkContext.applicationId, sf_dir, n_hashes, k, seed,
        portable,
    )
    # evict entries from other (dead) sessions so a long-lived process
    # that cycles SparkSessions never accumulates persisted frames —
    # the cache is bounded to the LIVE application's SF dirs
    for stale in [k_ for k_ in _SIG_FRAMES if k_[0] != key[0]]:
        try:
            _SIG_FRAMES.pop(stale).unpersist()
        except Exception:
            pass
    frame = _SIG_FRAMES.get(key)
    if frame is None:
        frame = (
            table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "source",
                minhash_signature(
                    "text", n_hashes, k, seed, portable
                ).alias("_sig"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _SIG_FRAMES[key] = frame
    return frame


# --- shared dedup-audit pass (round-8 perf item) ----------------------------
#
# x49 / x62 / x66 / x72 / x91 all consume the SAME audit products
# (components / canonical / histogram) of the SAME corpus at the same
# (k=3, threshold=0.3, quality_score) parameters, and each used to
# rebuild the pair graph and re-run connected components. dedup_audit
# already shares WITHIN a query (the x66 pattern); this caches the pass
# per (session, sf_dir) so the whole audit FAMILY pays the pair graph
# and the CC iteration once — the label frame is localCheckpoint-ed by
# connected_components, so every later consumer scans the materialized
# RDD. At 100 TB this is the audit table a release pipeline writes once
# and every report reads.

_AUDIT_PASSES: dict = {}


def shared_dedup_audit(spark, sf_dir: str):
    """Session-cached :func:`~go_fish_spark.operators.audit.dedup_audit`
    over ``sf_dir``'s documents (doc_id/text, quality_score, k=3,
    t=0.3). Keyed by (applicationId, sf_dir); dead-session entries are
    evicted (their checkpointed RDDs are GC-reclaimed once
    unreferenced)."""
    from ...catalog import table
    from ...functions import text as tx
    from ...operators.audit import dedup_audit

    key = (spark.sparkContext.applicationId, sf_dir)
    for stale in [k_ for k_ in _AUDIT_PASSES if k_[0] != key[0]]:
        _AUDIT_PASSES.pop(stale, None)
    if key not in _AUDIT_PASSES:
        _AUDIT_PASSES[key] = dedup_audit(
            table(spark, sf_dir, "documents"), "doc_id", "text",
            tx.quality_score("text"),
            pairs=shared_jaccard_pairs(spark, sf_dir),
        )
    return _AUDIT_PASSES[key]


# --- shared exact-Jaccard pair graph (round-8 perf item, part 2) ------------
#
# x04 defines the pair pass; x18 / x71 / x89 / x110 and the shared
# audit pass all consume the SAME (doc_id, text, k=3, t=0.3) pair graph
# and each used to re-run the shingle self-join. One persisted slim
# (id_a, id_b, jaccard) frame per (session, sf_dir) — at 100 TB this is
# the pair TABLE a dedup pipeline materializes once and every graph
# audit reads.

_PAIR_FRAMES: dict = {}


def shared_jaccard_pairs(spark, sf_dir: str):
    """Session-cached exact word-3-shingle Jaccard pairs (t=0.3) over
    ``sf_dir``'s documents — the x04 pair graph as a materialized slim
    frame. Keyed by (applicationId, sf_dir); dead-session entries
    unpersisted."""
    from pyspark import StorageLevel

    from ...catalog import table
    from ...operators.dedup import ngram_jaccard_pairs

    key = (spark.sparkContext.applicationId, sf_dir)
    for stale in [k_ for k_ in _PAIR_FRAMES if k_[0] != key[0]]:
        try:
            _PAIR_FRAMES.pop(stale).unpersist()
        except Exception:
            pass
    frame = _PAIR_FRAMES.get(key)
    if frame is None:
        frame = ngram_jaccard_pairs(
            table(spark, sf_dir, "documents"), "doc_id", "text",
            k=3, threshold=0.3,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _PAIR_FRAMES[key] = frame
    return frame
