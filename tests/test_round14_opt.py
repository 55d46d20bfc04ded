"""Round-14 OPTIMIZATION tests: the footer-statistics fast paths in the
store kernel must be row-for-row equivalent to the Spark scan arms they
replace, and the single-action spectrum sums must equal the two-action
form's. Each test drives both arms over the same on-disk store and
compares outcomes exactly."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from go_fish_spark.streaming import storekernel as sk


def _mk_store(spark, tmp_path, n_shards=4):
    """Three stamped sharded appends over ids 0..59 (the kernel append
    shape: constant _batch_id per file, shard partition dirs)."""
    from go_fish_spark.sources.sharding import with_shard

    store = os.path.join(str(tmp_path), "store")
    for b in range(3):
        df = (
            spark.range(b * 20, b * 20 + 20)
            .select(
                F.col("id").cast("long").alias("id"),
                (F.col("id") * 10 + b).cast("long").alias("val"),
            )
        )
        (
            with_shard(df, "id", n_shards)
            .withColumn("_batch_id", F.lit(b))
            .repartition("shard")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(store)
        )
    return store


def test_file_footer_batch_reads_constant_stamp(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    seen = set()
    for shard, f in sk._key_dir_files(store, "shard"):
        b, ok = sk._file_footer_batch(f)
        assert ok and b is not None
        seen.add(b)
    assert seen == {0, 1, 2}


def test_file_footer_batch_absent_column(spark, tmp_path):
    p = os.path.join(str(tmp_path), "legacy")
    spark.range(5).select(F.col("id").alias("id")).coalesce(1).write.parquet(p)
    files = sk._root_parquet_files(p)
    assert files
    b, ok = sk._file_footer_batch(files[0])
    assert ok and b is None  # pre-discipline file: provably no stamp


def _scan_arm_prune(spark, path, covered, key_col, covered_by_key,
                    merge_schema=False, prune_null_batch=False):
    """Force the original Spark scan arm by making the footer arm
    decline (monkeypatch-free: call with a transient stats-breaker is
    fragile, so temporarily swap the footer fn)."""
    orig = sk._prune_covered_files_footer
    sk._prune_covered_files_footer = lambda *a, **k: None
    try:
        return sk.prune_covered_files(
            spark, path, covered, key_col=key_col,
            covered_by_key=covered_by_key, merge_schema=merge_schema,
            prune_null_batch=prune_null_batch,
        )
    finally:
        sk._prune_covered_files_footer = orig


def _surviving(path):
    out = []
    for dirpath, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(
                    os.path.relpath(os.path.join(dirpath, f), path)
                )
    return sorted(out)


@pytest.mark.parametrize("covered_by_key", [None, {"0": 1, "1": 0}])
def test_footer_prune_matches_scan(spark, tmp_path, covered_by_key):
    a = _mk_store(spark, tmp_path / "a")
    b = _mk_store(spark, tmp_path / "b")
    # same file population in both clones (writes are deterministic in
    # content; names differ — compare by (shard dir, footer batch))
    na = sk.prune_covered_files(
        spark, a, 0, key_col="shard", covered_by_key=covered_by_key
    )
    nb = _scan_arm_prune(spark, b, 0, "shard", covered_by_key)
    assert na == nb

    def keyed(path):
        return sorted(
            (os.path.dirname(rel), sk._file_footer_batch(
                os.path.join(path, rel))[0])
            for rel in _surviving(path)
        )

    assert keyed(a) == keyed(b)


def test_footer_prune_flat_layout_matches_scan(spark, tmp_path):
    for sub in ("a", "b"):
        p = os.path.join(str(tmp_path), sub)
        for b in range(3):
            (
                spark.range(5)
                .withColumn("_batch_id", F.lit(b))
                .coalesce(1)
                .write.mode("append")
                .parquet(p)
            )
    pa, pb = os.path.join(str(tmp_path), "a"), os.path.join(str(tmp_path), "b")
    na = sk.prune_covered_files(spark, pa, 1, key_col=None)
    nb = _scan_arm_prune(spark, pb, 1, None, None)
    assert na == nb == 2  # batches 0 and 1 covered

    def batches(path):
        return sorted(
            sk._file_footer_batch(os.path.join(path, rel))[0]
            for rel in _surviving(path)
        )

    assert batches(pa) == batches(pb) == [2]


def test_footer_prune_falls_back_for_data_column_key(spark, tmp_path):
    # key_col that is a real DATA column (non-partition): the scan arm's
    # uniqueness guard must still raise — the footer arm must decline.
    p = os.path.join(str(tmp_path), "flatkey")
    (
        spark.range(10)
        .select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("k"),
            F.lit(0).cast("long").alias("_batch_id"),
        )
        .coalesce(1)
        .write.parquet(p)
    )
    with pytest.raises(ValueError, match="not\\s+constant|refusing to prune"):
        sk.prune_covered_files(
            spark, p, 5, key_col="k", covered_by_key={"0": 5}
        )


def _scan_covered(spark, store, man, committed, sel, n_shards=4):
    cut = (
        F.col("_batch_id") <= int(committed) if committed is not None else None
    )
    live = sk.live_keyed_rows(spark, store, extra_filter=cut)
    if live is None:
        return None
    if sel is not None:
        live = live.filter(F.col("shard").isin(sorted(sel)))
    return live.agg(F.max("_batch_id").alias("m")).collect()[0]["m"]


@pytest.mark.parametrize(
    "committed,sel",
    [(None, None), (1, None), (None, [0, 1]), (2, [0])],
)
def test_covered_from_footers_matches_scan(spark, tmp_path, committed, sel):
    store = _mk_store(spark, tmp_path)
    man = sk.read_store_manifest(store)
    assert man is None
    fast, ok = sk._covered_from_footers(store, man, committed, sel)
    assert ok
    assert fast == _scan_covered(spark, store, man, committed, sel)


def test_covered_from_footers_after_fold(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    # selective fold of shards 0-1, then one more append — the footer
    # covered must honor the per-shard cut map exactly like the scan
    n = sk.compact_keyed_store(
        spark, store, key_cols=["id"], shard_key="id", n_shards=4,
        shards=[0, 1],
    )
    assert n > 0
    from go_fish_spark.sources.sharding import with_shard

    (
        with_shard(
            spark.range(100, 110).select(
                F.col("id").cast("long").alias("id"),
                F.lit(7).cast("long").alias("val"),
            ),
            "id", 4,
        )
        .withColumn("_batch_id", F.lit(5))
        .repartition("shard")
        .write.mode("append")
        .partitionBy("shard")
        .parquet(store)
    )
    man = sk.read_store_manifest(store)
    for committed, sel in [(None, None), (5, [0, 1, 2]), (None, [1])]:
        fast, ok = sk._covered_from_footers(store, man, committed, sel)
        assert ok
        assert fast == _scan_covered(spark, store, man, committed, sel)


def test_covered_footer_declines_on_root_files(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    # drop a legacy flat file at the root — mixed layout must decline
    spark.range(3).withColumn("_batch_id", F.lit(0)).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(str(tmp_path), "flat"))
    src = sk._root_parquet_files(os.path.join(str(tmp_path), "flat"))[0]
    shutil.copy(src, os.path.join(store, "legacy.parquet"))
    _fast, ok = sk._covered_from_footers(store, None, None, None)
    assert not ok


def test_compact_keyed_store_footer_fold_roundtrip(spark, tmp_path):
    """End-to-end: a fold on the footer fast path reads back exactly the
    latest-wins rows (the x163-family invariant at unit scale)."""
    store = _mk_store(spark, tmp_path)
    sk.compact_keyed_store(
        spark, store, key_cols=["id"], shard_key="id", n_shards=4
    )
    man = sk.read_store_manifest(store)
    assert man is not None and man["covered_max_batch"] == 2
    live = sk.live_keyed_rows(spark, store)
    rows = {
        r["id"]: r["val"]
        for r in sk.latest_wins(
            live, ["id"], [F.col("val").asc()], ["id", "val"]
        ).collect()
    }
    assert rows == {i: i * 10 + (i // 20) for i in range(60)}


def test_shared_fits_cached_and_identical(spark):
    from go_fish_spark.catalog import table
    from go_fish_spark.operators import similarity
    from go_fish_spark.queries.extensions._shared import (
        release_session_caches,
        shared_ivfpq,
        shared_quantizer,
    )

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "embeddings.parquet")):
        pytest.skip("testdata missing")
    release_session_caches()
    q1 = shared_quantizer(spark, sf, 4)
    q2 = shared_quantizer(spark, sf, 4)
    assert q1 is q2  # session-cached: same fit object
    direct = similarity.fit_quantizer_det(
        table(spark, sf, "embeddings"), "vec_id", "embedding", 4
    )
    import numpy as np

    assert np.array_equal(q1._centers, direct._centers)
    c1, p1 = shared_ivfpq(spark, sf, n_cells=4, m=4, ksub=4)
    c2, p2 = shared_ivfpq(spark, sf, n_cells=4, m=4, ksub=4)
    assert c1 is c2 and p1 is p2
    release_session_caches()
    q3 = shared_quantizer(spark, sf, 4)
    assert q3 is not q1 and np.array_equal(q3._centers, q1._centers)


def test_spectrum_single_action_matches_duck(spark):
    """The merged one-action sum pipeline still matches the oracle-arm
    DuckDB sums → same metrics (the x138 cross-engine contract)."""
    from go_fish_spark.operators.profile import (
        _spectrum_metrics,
        duck_spectrum_sums,
        embedding_spectrum_audit,
    )

    sf = "/root/testdata/sf0.001"
    path = os.path.join(sf, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip("testdata missing")
    from go_fish_spark.catalog import table

    dim = 64
    m_spark = embedding_spectrum_audit(
        table(spark, sf, "embeddings"), "embedding", dim,
        id_col="vec_id", max_fit=200,
    )
    n, sx, sxx = duck_spectrum_sums(
        path, "embedding", dim, id_col="vec_id", max_fit=200
    )
    m_duck = _spectrum_metrics(n, sx, sxx, dim)
    assert m_spark == m_duck


def _snm_multikey_reference(df, id_col, text_col, window, key_len,
                            threshold, k, keys):
    """The pre-r14 multi-key SNM shape: one full rank pipeline PER key,
    candidate union, cross-pass dedupe, one verification join — kept
    here as the equivalence reference for the single-rank rewrite."""
    from go_fish_spark.operators.dedup import (
        _persist,
        _snm_key_expr,
        word_shingles,
    )
    from go_fish_spark.operators.sampling import value_bucketed_rank

    d = df.sparkSession.range(1, window + 1).select(
        F.col("id").alias("_d")
    )
    shingles = _persist(
        df.select(
            F.col(id_col).alias("_id"),
            word_shingles(text_col, k).alias("_sh"),
        )
    )
    cand = None
    for kind in keys:
        base = df.select(
            F.col(id_col).alias("_id"),
            _snm_key_expr(text_col, kind, key_len).alias("_key"),
        )
        ranked = value_bucketed_rank(
            base, F.substring("_key", 1, 1), ["_key", "_id"], out="_r"
        ).select("_id", "_r")
        a = ranked.select(
            F.col("_id").alias("_ida"), F.col("_r").alias("_ra")
        ).crossJoin(F.broadcast(d))
        b = ranked.select(
            F.col("_id").alias("_idb"), F.col("_r").alias("_rb")
        )
        p = a.join(b, F.col("_ra") + F.col("_d") == F.col("_rb")).select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    inter = F.size(F.array_intersect("_sha", "_shb"))
    denom = F.size("_sha") + F.size("_shb") - inter
    jac = F.when(denom > 0, inter / denom)
    return (
        cand.join(
            shingles.select(
                F.col("_id").alias("id_a"), F.col("_sh").alias("_sha")
            ),
            "id_a",
        )
        .join(
            shingles.select(
                F.col("_id").alias("id_b"), F.col("_sh").alias("_shb")
            ),
            "id_b",
        )
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(
            (F.col("jaccard") >= threshold) & F.col("jaccard").isNotNull()
        )
        .orderBy("id_a", "id_b")
    )


def test_snm_single_rank_matches_per_kind_loop(spark):
    """The r14 single-rank multi-key SNM must produce EXACTLY the
    per-kind loop's verified pairs — including on rows with NULL/empty/
    colliding sort keys and sub-k-token texts (NULL-jaccard drops)."""
    from go_fish_spark.operators.dedup import (
        _SNM_KEYS,
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "zeta epsilon delta gamma beta alpha"),
        (4, "gamma beta alpha delta zeta epsilon"),
        (5, ""),                       # empty text → empty key
        (6, "   "),                    # whitespace → empty key
        (7, None),                     # NULL text → NULL key
        (8, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (9, "short doc"),              # sub-k tokens → empty shingles
        (10, "short doc"),
        (11, "omega psi chi phi upsilon tau"),
        (12, "tau upsilon phi chi psi omega"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted_neighborhood_pairs(
        df, "doc_id", "text", window=3, key_len=10, threshold=0.2,
        keys=_SNM_KEYS,
    ).collect()
    want = _snm_multikey_reference(
        df, "doc_id", "text", window=3, key_len=10, threshold=0.2,
        k=3, keys=_SNM_KEYS,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) > 0  # the corpus must actually exercise the path


def test_snm_single_rank_matches_on_corpus(spark):
    """Same equivalence over the real sf0.001 documents corpus at the
    x119 parameters."""
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        pytest.skip("testdata missing")
    from go_fish_spark.catalog import table
    from go_fish_spark.operators.dedup import (
        _SNM_KEYS,
        sorted_neighborhood_pairs,
    )

    docs = table(spark, sf, "documents")
    got = sorted_neighborhood_pairs(
        docs, "doc_id", "text", window=3, key_len=20, threshold=0.3,
        keys=_SNM_KEYS,
    ).collect()
    want = _snm_multikey_reference(
        docs, "doc_id", "text", window=3, key_len=20, threshold=0.3,
        k=3, keys=_SNM_KEYS,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) > 0


def test_blocking_cost_stats_matches_inline_pricing(spark):
    """choose_blocking(stats=blocking_cost_stats(...)) must equal the
    inline-priced plan exactly (same costs, same decision), and the
    sigs-fed histogram must equal the text-path histogram."""
    from go_fish_spark.operators.dedup import (
        blocking_cost_stats,
        choose_blocking,
        minhash_signature,
    )

    rows = [(i, f"alpha beta gamma doc {i} {'dup' if i % 3 == 0 else i}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inline = choose_blocking(
        df, "doc_id", "text", min_recall=0.2, pair_budget=10**6,
        threshold=0.35, portable=True,
    )
    stats = blocking_cost_stats(df, "text", portable=True)
    pre = choose_blocking(
        df, "doc_id", "text", min_recall=0.2, pair_budget=10**6,
        threshold=0.35, portable=True, stats=stats,
    )
    assert inline == pre
    sigs = df.select(
        F.col("doc_id").alias("_id"),
        minhash_signature("text", 64, 3, 42, True).alias("_sig"),
    )
    stats_sigs = blocking_cost_stats(df, "text", portable=True, sigs=sigs)
    assert stats_sigs == stats


def test_shared_blocking_stats_cached(spark):
    """shared_blocking_stats returns the SAME dict object within a
    session (one pricing job) and refits after release."""
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        pytest.skip("testdata missing")
    from go_fish_spark.queries.extensions._shared import (
        release_session_caches,
        shared_blocking_stats,
    )

    release_session_caches()
    s1 = shared_blocking_stats(spark, sf, portable=True)
    s2 = shared_blocking_stats(spark, sf, portable=True)
    assert s1 is s2
    release_session_caches()
    s3 = shared_blocking_stats(spark, sf, portable=True)
    assert s3 is not s1 and s3 == s1


def test_split_leakage_shared_pairs_matches_inline(spark):
    """split_leakage(pairs=<precomputed>) must equal the inline-pair
    form row for row (the x45 shared-frame contract)."""
    from go_fish_spark.operators.decontam import split_leakage
    from go_fish_spark.operators.dedup import ngram_jaccard_pairs
    from go_fish_spark.operators.sampling import split_assign

    rows = [
        (i, "alpha beta gamma delta epsilon " + ("dup" if i % 4 == 0 else str(i)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    split = split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    inline = split_leakage(
        df, "doc_id", "text", split, k=3, threshold=0.3
    ).orderBy("id_a", "id_b").collect()
    pre = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3)
    shared = split_leakage(
        df, "doc_id", "text", split, k=3, threshold=0.3, pairs=pre
    ).orderBy("id_a", "id_b").collect()
    assert [tuple(r) for r in shared] == [tuple(r) for r in inline]
    assert len(inline) > 0


def test_shared_containment_pairs_cached_and_equal(spark):
    """shared_containment_pairs serves ONE persisted frame per session
    and equals the direct containment_pairs output exactly."""
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "documents.parquet")):
        pytest.skip("testdata missing")
    from go_fish_spark.catalog import table
    from go_fish_spark.operators.dedup import containment_pairs
    from go_fish_spark.queries.extensions._shared import (
        release_session_caches,
        shared_containment_pairs,
    )

    release_session_caches()
    f1 = shared_containment_pairs(spark, sf, k=3, threshold=0.6)
    f2 = shared_containment_pairs(spark, sf, k=3, threshold=0.6)
    assert f1 is f2
    got = sorted(tuple(r) for r in f1.collect())
    want = sorted(
        tuple(r)
        for r in containment_pairs(
            table(spark, sf, "documents"), "doc_id", "text",
            k=3, threshold=0.6,
        ).collect()
    )
    assert got == want and len(want) > 0
    release_session_caches()
