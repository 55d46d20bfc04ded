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


# --- session caches (round-8 perf item, round-9 hardening) ------------------
#
# x87 / x93 / x94 / x100 consume per-document MinHash signatures of the
# SAME corpus at the SAME params; x49 / x62 / x66 / x72 / x91 consume
# the SAME audit products; x18 / x71 / x89 / x110 the SAME pair graph.
# Fitting each once per (session, corpus) and persisting the slim frame
# is the x66 shared-audit pattern applied family-wide: at 100 TB these
# are the signature / pair / audit TABLES a pipeline writes once (one
# map-only pass each) and every report reads — the caches are the
# session-local form of that materialization.
#
# Round-9 hardening (r8 verdict #1 + ADVICE):
#   * BOUNDED: each cache is an LRU capped at _SESSION_CACHE_MAX
#     (dir, params) entries per live app — eviction unpersists, so a
#     long-lived multi-corpus service cannot accumulate persisted
#     frames without bound.
#   * FINGERPRINTED: keys carry (mtime_ns, size) of the corpus file, so
#     regenerating data at the same path within one session refits
#     instead of silently serving stale frames.
#   * RELEASABLE: release_session_caches() drops + unpersists
#     everything explicitly (the audit pass included — no GC reliance).

from collections import OrderedDict

_SESSION_CACHE_MAX = 4  # (sf_dir, params) entries per cache per live app


def _corpus_fingerprint(sf_dir: str, tbl: str = "documents") -> tuple:
    """Cheap data-identity stamp for cache keys: (mtime_ns, size) of the
    corpus file (or a sorted tuple of per-file stamps for a directory
    table). Regenerated data ⇒ new stamp ⇒ cache miss + refit."""
    import glob as _glob
    import os as _os

    path = _os.path.join(sf_dir, f"{tbl}.parquet")
    try:
        if _os.path.isdir(path):
            return tuple(
                sorted(
                    (_os.path.basename(p), st.st_mtime_ns, st.st_size)
                    for p in _glob.glob(_os.path.join(path, "*"))
                    for st in [_os.stat(p)]
                )
            )
        st = _os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return ("missing",)


class _SessionCache:
    """Tiny LRU over (app_id, fingerprint, …params) → value with an
    unpersist hook run on every eviction path (dead-app sweep, LRU
    overflow, explicit release)."""

    def __init__(self, release_fn):
        self._d: OrderedDict = OrderedDict()
        self._release = release_fn

    def _drop(self, key) -> None:
        val = self._d.pop(key, None)
        if val is not None:
            try:
                self._release(val)
            except Exception:
                pass  # best-effort: a dead JVM makes unpersist moot

    def get_or_fit(self, key, fit_fn):
        # evict entries from other (dead) sessions first, then bound the
        # live app's footprint to the LRU cap. Keys are
        # (app_id, fingerprint, …params): an entry with the SAME app and
        # params but a DIFFERENT fingerprint is the superseded frame of
        # regenerated data — drop (and unpersist) it BEFORE fitting,
        # both for correctness hygiene and because Spark's CacheManager
        # matches cached data by logical plan: a still-persisted stale
        # frame over the same path would be silently reused by the
        # refit's persist().
        for stale in [
            k
            for k in self._d
            if k[0] != key[0]
            or (k[2:] == key[2:] and k[1] != key[1])
        ]:
            self._drop(stale)
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        val = fit_fn()
        self._d[key] = val
        while len(self._d) > _SESSION_CACHE_MAX:
            self._drop(next(iter(self._d)))
        return val

    def clear(self) -> None:
        for key in list(self._d):
            self._drop(key)

    def __len__(self) -> int:
        return len(self._d)


def _unpersist_frame(frame) -> None:
    frame.unpersist()


def _release_audit(audit) -> None:
    # components is localCheckpoint-ed (RDD blocks freed once the
    # reference drops); canonical/histogram are derivations. Best-effort
    # unpersist all three so nothing waits on GC.
    for f in (audit.components, audit.canonical, audit.histogram):
        try:
            f.unpersist()
        except Exception:
            pass


def _release_curation(pass_) -> None:
    surv, audit = pass_
    try:
        surv.unpersist()
    except Exception:
        pass
    _release_audit(audit)


_SIG_FRAMES = _SessionCache(_unpersist_frame)
_PAIR_FRAMES = _SessionCache(_unpersist_frame)
_AUDIT_PASSES = _SessionCache(_release_audit)
_CURATION_PASSES = _SessionCache(_release_curation)


def release_session_caches() -> None:
    """Explicitly drop + unpersist every session-cached shared frame
    (signatures, pair graph, audit pass, curation pass). The long-lived
    multi-corpus service these caches model calls this between corpora;
    tests call it to assert the caches cannot leak."""
    for cache in (
        _SIG_FRAMES, _PAIR_FRAMES, _AUDIT_PASSES, _LABEL_FRAMES,
        _CURATION_PASSES, _PQ_SWEEPS, _DET_FITS, _PLAN_STATS,
    ):
        cache.clear()


def shared_curation_pass(spark, sf_dir: str):
    """Session-cached (survivors, audit) of the flagship curation flow:
    language ID + quality gate (en, score ≥ 0.5) → exact dedup (min
    doc_id per content hash; survivor frame persisted) → ONE
    :func:`~go_fish_spark.operators.audit.dedup_audit` pass over the
    SURVIVORS (k=3, t=0.3). This is the label/selection TABLE a real
    pipeline materializes once per corpus snapshot and every consumer
    (x20's published selection, downstream reports) reads — fitting it
    per-consumer would re-run the pair join and the iterative CC, the
    costliest duplicated work in the registry (the r9→r10 x20 warm-rep
    regression was exactly this re-fit). Keyed by (applicationId, data
    fingerprint, sf_dir); bounded LRU, evictions unpersist both the
    survivor frame and the audit pass."""
    from pyspark import StorageLevel

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ...catalog import table
    from ...functions import text as tx
    from ...operators.audit import dedup_audit

    key = (
        spark.sparkContext.applicationId, _corpus_fingerprint(sf_dir),
        sf_dir, "curation",
    )

    def fit():
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
        surv = (
            kept.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        audit = dedup_audit(
            surv, "doc_id", "text", F.col("score"), k=3, threshold=0.3
        )
        return (surv, audit)

    return _CURATION_PASSES.get_or_fit(key, fit)


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
    than the text it replaces). Keyed by (applicationId, data
    fingerprint, sf_dir, params); bounded LRU, evictions unpersist."""
    from pyspark import StorageLevel

    from ...catalog import table
    from ...operators.dedup import minhash_signature

    key = (
        spark.sparkContext.applicationId, _corpus_fingerprint(sf_dir),
        sf_dir, n_hashes, k, seed, portable,
    )

    def fit():
        return (
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

    return _SIG_FRAMES.get_or_fit(key, fit)


def shared_dedup_audit(spark, sf_dir: str):
    """Session-cached :func:`~go_fish_spark.operators.audit.dedup_audit`
    over ``sf_dir``'s documents (doc_id/text, quality_score, k=3,
    t=0.3). Keyed by (applicationId, data fingerprint, sf_dir); bounded
    LRU, evictions unpersist the pass's frames."""
    from ...catalog import table
    from ...functions import text as tx
    from ...operators.audit import dedup_audit

    key = (
        spark.sparkContext.applicationId, _corpus_fingerprint(sf_dir),
        sf_dir,
    )

    def fit():
        return dedup_audit(
            table(spark, sf_dir, "documents"), "doc_id", "text",
            tx.quality_score("text"),
            pairs=shared_jaccard_pairs(spark, sf_dir),
        )

    return _AUDIT_PASSES.get_or_fit(key, fit)


def shared_jaccard_pairs(spark, sf_dir: str):
    """Session-cached exact word-3-shingle Jaccard pairs (t=0.3) over
    ``sf_dir``'s documents — the x04 pair graph as a materialized slim
    frame. Keyed by (applicationId, data fingerprint, sf_dir); bounded
    LRU, evictions unpersist."""
    from pyspark import StorageLevel

    from ...catalog import table
    from ...operators.dedup import ngram_jaccard_pairs

    key = (
        spark.sparkContext.applicationId, _corpus_fingerprint(sf_dir),
        sf_dir,
    )

    def fit():
        return ngram_jaccard_pairs(
            table(spark, sf_dir, "documents"), "doc_id", "text",
            k=3, threshold=0.3,
        ).persist(StorageLevel.MEMORY_AND_DISK)

    return _PAIR_FRAMES.get_or_fit(key, fit)


def shared_containment_pairs(
    spark, sf_dir: str, k: int = 3, threshold: float = 0.6
):
    """Session-cached DIRECTED containment pairs (|Sa∩Sb|/|Sa| ≥
    ``threshold`` over word-``k``-shingles) over ``sf_dir``'s documents
    — the x82 pair frame as a materialized slim product. x82 reports it
    and x92 rolls it up to source grain with IDENTICAL parameters, so
    the inverted-index pair join (the expensive co-occurrence shuffle)
    runs once per session instead of once per entry (optimization r14,
    the shared_jaccard_pairs discipline). Keyed by (applicationId, data
    fingerprint, sf_dir, k, threshold); bounded LRU, evictions
    unpersist."""
    from pyspark import StorageLevel

    from ...catalog import table
    from ...operators.dedup import containment_pairs

    key = (
        spark.sparkContext.applicationId, _corpus_fingerprint(sf_dir),
        sf_dir, "containment", k, threshold,
    )

    def fit():
        return containment_pairs(
            table(spark, sf_dir, "documents"), "doc_id", "text",
            k=k, threshold=threshold,
        ).persist(StorageLevel.MEMORY_AND_DISK)

    return _PAIR_FRAMES.get_or_fit(key, fit)


_LABEL_FRAMES = _SessionCache(_unpersist_frame)


def shared_history_labels(spark, sf_dir: str, threshold: float = 0.35):
    """Session-cached DAY-1 component labels of the recurring-crawl demo
    family: the history slice (doc_id % 7 != 0) pair graph (MinHash LSH
    at ``threshold`` over the shared signature frame) closed by
    connected components, persisted. This is the PERSISTED LABEL TABLE
    the incremental-maintenance discipline is premised on — production
    reads yesterday's labels, it never recomputes them — so with this
    frame cached, x118's measured cost is genuinely the delta probe +
    reduced-graph merge, exactly the steady-state the operator models.
    Keyed by (applicationId, data fingerprint, sf_dir, threshold);
    bounded LRU, evictions unpersist."""
    from pyspark import StorageLevel

    from pyspark.sql import functions as F

    from ...catalog import table
    from ...operators import dedup as _dedup
    from ...operators.graph import connected_components

    key = (
        spark.sparkContext.applicationId, _corpus_fingerprint(sf_dir),
        sf_dir, threshold,
    )

    def fit():
        hist = table(spark, sf_dir, "documents").filter(
            ~(F.col("doc_id") % 7 == 0)
        )
        store = (
            shared_doc_sigs(spark, sf_dir)
            .filter(~(F.col("doc_id") % 7 == 0))
            .select(F.col("doc_id").alias("_id"), "_sig")
        )
        pairs = _dedup.minhash_lsh_pairs(
            hist, "doc_id", "text", threshold=threshold, portable=True,
            sigs=store,
        )
        return connected_components(
            hist.select("doc_id"), pairs, id_col="doc_id"
        ).persist(StorageLevel.MEMORY_AND_DISK)

    return _LABEL_FRAMES.get_or_fit(key, fit)


# --- shared blocking-cost stats (optimization round 14) ---------------------

_PLAN_STATS = _SessionCache(lambda v: None)


def shared_blocking_stats(
    spark,
    sf_dir: str,
    k: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    winnow_w: int = 4,
    portable: bool = True,
):
    """Session-cached :func:`~go_fish_spark.operators.dedup.blocking_cost_stats`
    over ``sf_dir``'s documents — the choose_blocking pricing histogram
    ({"e","m","w","n_docs"} exact candidate counts). A pure function of
    (corpus, k, n_hashes, bands, winnow_w, portable) and INDEPENDENT of
    the recall contract, so every planner call over the corpus (x120's
    tight-budget contract, x140's execution handoff) reads ONE stats
    table — this is the statistics table a production catalog maintains
    (ANALYZE once, plan many). The cached value is the 4-number dict —
    driver-side, no persisted frames. Pricing reads the session-shared
    signature frame (same 64/k/seed/portable params ⇒ byte-identical
    signatures ⇒ bit-identical band histogram — the shared-sigs
    equivalence contract), so the corpus is hashed once per session
    across the whole sketch family."""
    from pyspark.sql import functions as F

    from ...catalog import table
    from ...operators import dedup as _dedup

    key = (
        spark.sparkContext.applicationId, _corpus_fingerprint(sf_dir),
        sf_dir, "bstats", k, n_hashes, bands, winnow_w, portable,
    )

    def fit():
        sigs = shared_doc_sigs(
            spark, sf_dir, n_hashes=n_hashes, k=k, portable=portable
        ).select(F.col("doc_id").alias("_id"), "_sig")
        return _dedup.blocking_cost_stats(
            table(spark, sf_dir, "documents"), "text",
            k=k, n_hashes=n_hashes, bands=bands, winnow_w=winnow_w,
            portable=portable, sigs=sigs,
        )

    return _PLAN_STATS.get_or_fit(key, fit)


# --- shared deterministic model fits (optimization round 14) ----------------
#
# Every ANN-family entry (x15/x44/x47/x51/x79/x85/x148/x157, the ANN
# protocol entries x165-x167/x170, and the semantic-dedup x26) fits the
# SAME deterministic model over the SAME embeddings table per run:
# deterministic_sample is a TakeOrdered + Arrow toPandas pass, then a
# seeded numpy k-means / PQ fit on the driver. The fit is a pure
# function of (table bytes, id_col, vec_col, params) — the oracle arm
# re-derives byte-identical centroids from the table (the x15/x26
# contract) — so caching it per (applicationId, corpus fingerprint,
# params) is the session-local form of the MODEL TABLE a production
# index maintains (annstore.publish_ann_model persists exactly these
# objects): fit once per corpus snapshot, read by every consumer.
# This is the shared_doc_sigs discipline applied to model fits (guide
# §1.2 step 1: don't recompute what the pipeline computes once).
# Cached values are driver-side numpy objects (a few KB) — no persisted
# frames, so the release hook is a no-op; the LRU bound still applies.

_DET_FITS = _SessionCache(lambda v: None)


def _emb_fit_key(spark, sf_dir: str, *params) -> tuple:
    return (
        spark.sparkContext.applicationId,
        _corpus_fingerprint(sf_dir, "embeddings"),
        sf_dir,
    ) + params


def shared_emb_sample(spark, sf_dir: str, train_cap: int = 100_000):
    """Session-cached ``deterministic_sample`` over ``sf_dir``'s
    embeddings — the ONE fit input every deterministic model in the
    family derives from (optimization r15: the quantizer, PQ, IVF-PQ
    and sweep fits each re-collected the identical hash-total-ordered
    sample; it is a pure function of (corpus, train_cap), so it is
    collected once per session)."""
    from ...catalog import table

    key = _emb_fit_key(spark, sf_dir, "sample", train_cap)
    return _DET_FITS.get_or_fit(
        key,
        lambda: similarity.deterministic_sample(
            table(spark, sf_dir, "embeddings"),
            "vec_id", "embedding", train_cap,
        ),
    )


def _shared_coarse_np(
    spark, sf_dir: str, n_cells: int, train_cap: int, seed: int
):
    """Session-cached coarse k-means centers (numpy) — the shared half
    of every (n_cells, train_cap, seed)-aligned coarse model: the plain
    quantizer, each IVF-PQ pair, and the x175 sweep all fit the same
    ``_kmeans_fit(sample, n_cells, seed)``."""
    key = _emb_fit_key(
        spark, sf_dir, "coarse_np", n_cells, train_cap, seed
    )
    return _DET_FITS.get_or_fit(
        key,
        lambda: similarity._kmeans_fit(
            shared_emb_sample(spark, sf_dir, train_cap), n_cells, seed
        ),
    )


def shared_quantizer(
    spark, sf_dir: str, n_cells: int,
    train_cap: int = 100_000, seed: int = 42,
):
    """Session-cached ``fit_quantizer_det`` over ``sf_dir``'s embeddings
    (vec_id/embedding) — byte-identical to the direct call (same sample,
    same seeded k-means; pinned by test_shared_fits_cached_and_identical)."""
    key = _emb_fit_key(spark, sf_dir, "quant", n_cells, train_cap, seed)
    return _DET_FITS.get_or_fit(
        key,
        lambda: similarity.Quantizer(
            _shared_coarse_np(spark, sf_dir, n_cells, train_cap, seed)
        ),
    )


def shared_pq(
    spark, sf_dir: str, m: int, ksub: int,
    train_cap: int = 100_000, seed: int = 42,
):
    """Session-cached ``fit_pq_det`` over ``sf_dir``'s embeddings."""
    from ...catalog import table

    key = _emb_fit_key(spark, sf_dir, "pq", m, ksub, train_cap, seed)
    return _DET_FITS.get_or_fit(
        key,
        lambda: similarity.fit_pq_det(
            table(spark, sf_dir, "embeddings"), "vec_id", "embedding",
            m, ksub, train_cap, seed,
            sample=shared_emb_sample(spark, sf_dir, train_cap),
        ),
    )


def shared_ivfpq(
    spark, sf_dir: str, n_cells: int = 16, m: int = 4, ksub: int = 16,
    train_cap: int = 100_000, seed: int = 42,
):
    """Session-cached ``fit_ivfpq_det`` (coarse, pq) over ``sf_dir``'s
    embeddings — the model pair the ANN store family publishes. Rides
    the shared sample and the shared coarse centers; the composition is
    definitionally the fit_ivfpq_det tail
    (``similarity.coarse_residual_models``), so the models stay
    byte-identical to the direct call."""
    key = _emb_fit_key(
        spark, sf_dir, "ivfpq", n_cells, m, ksub, train_cap, seed
    )
    return _DET_FITS.get_or_fit(
        key,
        lambda: similarity.coarse_residual_models(
            shared_emb_sample(spark, sf_dir, train_cap),
            _shared_coarse_np(spark, sf_dir, n_cells, train_cap, seed),
            m, ksub, seed,
        ),
    )


# x175 consumes the PQ parameter sweep — a MEASURED table (6 plans ×
# one recall instrument each) whose cost is the per-plan model fits +
# one unioned search action. The cached value is the COLLECTED row
# list (a few hundred bytes — no persisted frame to unpersist), the
# session-local form of the sweep report a planner materializes once
# per corpus snapshot and every choose_ann call reads.

_PQ_SWEEPS = _SessionCache(lambda rows: None)

_X175_PLANS = (
    (2, 16, 4), (4, 8, 4), (4, 16, 4),
    (8, 16, 4), (16, 16, 4), (4, 16, 8),
)


def shared_pq_sweep(spark, sf_dir: str, plans: tuple = _X175_PLANS):
    """Session-cached :func:`similarity.pq_plan_sweep` rows over
    ``sf_dir``'s embeddings (queries = vec_id < 8, k=10, 16 cells).
    Keyed by (applicationId, data fingerprint, sf_dir, plans); bounded
    LRU. Returns a plain list of Rows — rebuild the DataFrame with
    ``spark.createDataFrame(rows, PQ_SWEEP_SCHEMA)``."""
    from pyspark.sql import functions as F

    from ...catalog import table

    key = (
        spark.sparkContext.applicationId,
        _corpus_fingerprint(sf_dir, "embeddings"),
        sf_dir, plans,
    )

    def fit():
        emb = table(spark, sf_dir, "embeddings")
        # session-shared fit inputs (optimization r15, pure reuse): the
        # sweep's sample is the family's shared sample, and each
        # distinct (m, ksub) residual-PQ model is the session-cached
        # shared_ivfpq pair at the sweep's own (n_cells=16, train_cap,
        # seed) — byte-identical to the sweep's internal fits (pinned
        # by test_pq_sweep_shared_fits_byte_identical), and any later
        # shared_ivfpq consumer of an aligned plan reuses them
        return similarity.pq_plan_sweep(
            emb, emb.filter(F.col("vec_id") < 8), _EMB_DIM, plans=plans,
            sample=shared_emb_sample(spark, sf_dir),
            pq_models={
                (m, ksub): shared_ivfpq(
                    spark, sf_dir, n_cells=16, m=m, ksub=ksub
                )[1]
                for m, ksub, _np_ in plans
            },
        ).collect()

    return _PQ_SWEEPS.get_or_fit(key, fit)


PQ_SWEEP_SCHEMA = similarity.PQ_SWEEP_SCHEMA  # one schema of record
