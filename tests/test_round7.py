"""Round-7 operators: value-bucketed exact ranks, BPE merge candidates,
empirical LSH plan sweep, trimmed group mean, MMR diversified retrieval,
pair-budget estimation, and the stream disorder profile.
(The sf-corpus oracle compares are q85-q88/x99-x103 in the registry
self-check; these pin golden values and invariants on constructed
inputs.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_value_bucketed_rank_matches_global_window(spark):
    """Ranks from the distributed bucket+offset shape must equal a plain
    global row_number, for any bucket coarsening, and be invariant to
    repartitioning."""
    from pyspark.sql import Window

    from go_fish_spark.operators.sampling import value_bucketed_rank

    df = spark.createDataFrame(
        [(i, (i * 7919) % 100) for i in range(500)], "id long, v int"
    )
    expect = {
        r.id: r.rn
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
        ).collect()
    }
    for bucket in (F.col("v"), F.floor(F.col("v") / 13), F.lit(0)):
        got = {
            r.id: r.rank
            for r in value_bucketed_rank(
                df.repartition(7), bucket, [F.col("v"), F.col("id")]
            ).collect()
        }
        assert got == expect


def test_bpe_merge_candidates_golden(spark):
    """Pair counts are vocab counts weighted by word frequency; ties
    break on the pair string; sub-2-char words contribute nothing."""
    from go_fish_spark.operators.ngrams import bpe_merge_candidates

    df = spark.createDataFrame(
        [(1, "aab aab x"), (2, "aab ab")], "doc_id long, text string"
    )
    # vocab: aab×3 (pairs aa, ab), ab×1 (pair ab), x×1 (no pair)
    out = [
        (r.pair, r.n_occurrences)
        for r in bpe_merge_candidates(df, "text", top_k=10).collect()
    ]
    assert out == [("ab", 4), ("aa", 3)]


def test_lsh_plan_sweep_recall_monotone_and_exact_on_identical(spark):
    """More bands (shorter rows) can only catch MORE pairs: recall is
    non-increasing as bands decrease. Identical docs (J=1, all positions
    agree) are caught by EVERY plan."""
    from go_fish_spark.operators.dedup import lsh_plan_sweep

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, t), (2, t), (3, t + " lambda mu nu xi"),
            (4, "totally different words entirely here now okay then")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lsh_plan_sweep(
        df, "doc_id", "text", min_jaccard=0.2, dup_threshold=0.5,
        portable=True,
    ).collect()
    assert len(out) == 7
    by_bands = {r.bands: r for r in out}
    assert by_bands[64].rows_per_band == 1 and by_bands[1].rows_per_band == 64
    # identical pair (1,2) collides under every plan => caught >= 1
    assert all(r.n_dup_caught >= 1 for r in out)
    # recall non-increasing from 64 bands down to 1
    recalls = [r.recall for r in sorted(out, key=lambda r: -r.bands)]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    # s-curve thresholds strictly increase as rows_per_band grows
    ths = [r.s_threshold for r in sorted(out, key=lambda r: r.rows_per_band)]
    assert all(a < b for a, b in zip(ths, ths[1:]))


def test_trimmed_group_mean_ignores_outliers(spark):
    """A single huge outlier moves the raw mean but not the trimmed
    mean; groups too small to trim (floor(n*frac)=0) keep all rows."""
    from go_fish_spark.operators.profile import trimmed_group_mean

    rows = [("a", i, 1.0) for i in range(19)] + [("a", 99, 1000.0)]
    rows += [("b", 1, 2.0), ("b", 2, 4.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {
        r.g: r
        for r in trimmed_group_mean(
            df, "g", F.col("v"), "id", trim_frac=0.05
        ).collect()
    }
    assert out["a"].n_trimmed_each == 1
    assert out["a"].trimmed_mean == 1.0          # outlier trimmed
    assert out["a"].raw_mean == pytest.approx(50.95)
    assert out["b"].n_trimmed_each == 0          # too small to trim
    assert out["b"].trimmed_mean == 3.0 == out["b"].raw_mean
    with pytest.raises(ValueError, match="trim_frac"):
        trimmed_group_mean(df, "g", F.col("v"), "id", trim_frac=0.5)


def test_mmr_diversify_prefers_diverse_over_redundant(spark):
    """Query [1,0]: candidates two near-copies of the query direction
    and one orthogonal-ish vector. Plain top-2 would take both copies;
    MMR's second pick must be the diverse vector."""
    from go_fish_spark.operators.retrieval import mmr_diversify

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.3, 0.0]),    # near the query
        (2, [0.9, 0.31, 0.0]),   # near-duplicate of 1
        (3, [0.9, 0.0, 0.3]),    # equally relevant, orthogonal spread
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = mmr_diversify(
        df, "vec_id", "embedding", query_id=0, top_n=3, k=3, lam=0.5
    ).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].vec_id == 1          # most similar first
    assert out[1].vec_id == 3          # diversity beats the near-dup
    assert out[2].vec_id == 2


def test_pair_budget_estimate_golden(spark):
    """Each shingle with df docs contributes exactly df·(df−1)/2
    candidate rows; the bucket totals must equal the realized
    co-occurrence row count of the inverted-index join."""
    from go_fish_spark.operators.dedup import pair_budget_estimate

    t = "alpha beta gamma delta"          # shingles: a-b-g, b-g-d
    rows = [(1, t), (2, t), (3, t), (4, "alpha beta gamma nine")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 'alpha beta gamma' df=4 → 6 pairs; 'beta gamma delta' df=3 → 3;
    # 'beta gamma nine' df=1 → 0
    out = {
        r.df_bucket_lo: (r.n_shingles, r.pair_candidates)
        for r in pair_budget_estimate(df, "doc_id", "text", k=3).collect()
    }
    assert out == {1: (1, 0), 2: (1, 3), 4: (1, 6)}
    total_est = sum(p for _, p in out.values())
    inv = df.selectExpr(
        "doc_id", "explode(array_distinct(transform(sequence(1, size(split(text,' '))-2), "
        "i -> concat_ws(' ', slice(split(text,' '), i, 3)))) ) AS s"
    )
    realized = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.s") == F.col("b.s"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .count()
    )
    assert total_est == realized


def test_disorder_profile_golden_and_block_invariance(spark):
    """A stream with one event arriving late lands in the right
    power-of-2 second bucket; the block size must not change the result
    (the two-level running max is exact across block boundaries)."""
    from go_fish_spark.operators.profile import disorder_profile

    # arrival order a=0..4; the event arriving at a=3 carries a
    # timestamp 130 s behind the running max set at a=2.
    rows = [
        ("t", 0, "2026-01-01 00:00:00"),
        ("t", 1, "2026-01-01 00:01:00"),
        ("t", 2, "2026-01-01 00:05:00"),
        ("t", 3, "2026-01-01 00:02:50"),   # 130 s late → bucket 128
        ("t", 4, "2026-01-01 00:06:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, a long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    for block in (2, 3, 8192):
        out = {
            r.disorder_bucket_lo_sec: r.n_events
            for r in disorder_profile(
                df, "event_type", "a", "ts", block=block
            ).collect()
        }
        assert out == {-1: 4, 128: 1}, f"block={block}: {out}"


def test_group_centroid_drift_identity_and_one_sided(spark):
    """Identical snapshots → cos 1 / drift 0 per label; labels present
    in only one snapshot are omitted."""
    from go_fish_spark.operators.similarity import group_centroid_drift

    rows = [(1, 0, [1.0, 2.0, 3.0]), (2, 0, [3.0, 2.0, 1.0]),
            (3, 1, [0.5, 0.5, 0.5])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {
        r.label: r
        for r in group_centroid_drift(df, df, "label", "embedding").collect()
    }
    assert set(out) == {0, 1}
    assert all(r.centroid_cos == 1.0 and r.drift == 0.0 for r in out.values())
    assert out[0].n_old == 2 and out[0].n_new == 2

    only_new = spark.createDataFrame(
        [(9, 7, [1.0, 0.0, 0.0])], "vec_id long, label int, embedding array<float>"
    )
    out2 = group_centroid_drift(
        df, df.unionByName(only_new), "label", "embedding"
    ).collect()
    assert {r.label for r in out2} == {0, 1}  # label 7 one-sided → omitted


def test_key_skew_audit_buckets_and_nulls(spark):
    """Power-of-2 bucket histogram over exact group sizes; NULL keys
    count as one real group."""
    from go_fish_spark.operators.profile import key_skew_audit

    rows = (
        [("a",)] * 1 + [("b",)] * 3 + [("c",)] * 4 + [("d",)] * 5
        + [(None,)] * 2
    )
    df = spark.createDataFrame(rows, "k string")
    out = {
        r.group_size_bucket_lo: (r.n_keys, r.n_rows)
        for r in key_skew_audit(df, "k").collect()
    }
    # sizes: a=1 → bucket 1; b=3, null=2 → bucket 2; c=4, d=5 → bucket 4
    assert out == {1: (1, 1), 2: (2, 5), 4: (2, 9)}


def test_quota_apportion_exact_sum_and_fair_shares(spark):
    """Hamilton apportionment: quotas sum to exactly k; every cell is
    within 1 slot of its proportional share; remainder ties break on
    stratum order."""
    from go_fish_spark.operators.sampling import quota_apportion

    rows = [("a",)] * 7 + [("b",)] * 7 + [("c",)] * 5 + [("d",)] * 1
    df = spark.createDataFrame(rows, "g string")
    for k in (3, 10, 17):
        out = {
            r.g: (r.n_docs, r.quota)
            for r in quota_apportion(df, ["g"], k=k).collect()
        }
        total = sum(n for n, _ in out.values())
        assert sum(q for _, q in out.values()) == k
        for g, (n, q) in out.items():
            share = k * n / total
            assert abs(q - share) < 1, (k, g, q, share)
    # k=10 over sizes 7/7/5/1 of 20: shares 3.5/3.5/2.5/0.5 — bases
    # 3/3/2/0 leave 2 slots; remainders tie at .5 → 'a' then 'b' win.
    out10 = {
        r.g: r.quota for r in quota_apportion(df, ["g"], k=10).collect()
    }
    assert out10 == {"a": 4, "b": 4, "c": 2, "d": 0}


def test_kmv_distinct_small_group_exact_and_estimate_sane(spark):
    """A group with fewer than k distinct shingles reports its exact
    count (zero error — the sketch holds the whole set); a larger group
    estimates within a loose KMV error bound."""
    import random

    from go_fish_spark.operators.profile import kmv_distinct_audit

    rng = random.Random(7)
    words = [f"w{rng.randrange(10_000)}" for _ in range(3000)]
    big = " ".join(words)
    rows = [("small", "alpha beta gamma delta epsilon"), ("big", big)]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        r.source: r
        for r in kmv_distinct_audit(
            df, "source", "text", k_shingle=3, k_min=64
        ).collect()
    }
    assert out["small"].n_exact == 3
    assert out["small"].kmv_estimate == 3.0
    assert out["small"].rel_err == 0.0
    assert out["big"].n_exact > 64
    assert out["big"].rel_err < 0.5  # loose bound; ~1/sqrt(64) expected


def test_triangle_census_golden(spark):
    """A 4-clique (4 triangles... no — C(4,3)=4) plus a pendant edge:
    exact edge/wedge/triangle counts and clustering coefficient;
    duplicated and reversed edge declarations canonicalize away."""
    from go_fish_spark.operators.graph import triangle_census

    # K4 on {1,2,3,4} (6 edges, 4 triangles, 12 closed wedges) plus
    # pendant 4-5 (adds 3 open wedges centered at 4... and wedges at 5? none)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(4, 5), (5, 4), (4, 5)]  # pendant + dup + reversed
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    r = triangle_census(df).collect()[0]
    assert r.n_edges == 7
    assert r.n_triangles == 4
    # wedges: K4 middles: each vertex has C(3,2)=3 wedges → 12, all
    # closed; vertex 4 also pairs 5 with {1,2,3} → 3 open wedges;
    # vertex 5 has degree 1 → none.
    assert r.n_wedges == 3
    assert r.closure_rate == round(12 / 15, 9)

    # edgeless graph: all zeros, NULL closure
    empty = spark.createDataFrame([(1, 1)], "id_a long, id_b long")
    r0 = triangle_census(empty).collect()[0]
    assert (r0.n_edges, r0.n_wedges, r0.n_triangles) == (0, 0, 0)
    assert r0.closure_rate is None


def test_round7_robustness_edges(spark):
    """Round-7 edge hardening: (a) value_bucketed_rank keeps NULL-bucket
    rows (null-safe offset join — no silent row loss) ranking them
    first; (b) mmr_diversify stops early when candidates run out
    instead of crashing; (c) trimmed_group_mean excludes NULL scores
    from both the sum AND the denominator."""
    from pyspark.sql import Window

    from go_fish_spark.operators.profile import trimmed_group_mean
    from go_fish_spark.operators.retrieval import mmr_diversify
    from go_fish_spark.operators.sampling import value_bucketed_rank

    # (a) NULL buckets survive and rank first (asc-nulls-first)
    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, 1)], "id long, v int"
    )
    got = {
        r.id: r.rank
        for r in value_bucketed_rank(
            df, F.col("v"), [F.col("v"), F.col("id")]
        ).collect()
    }
    assert got == {1: 1, 3: 2, 4: 3, 2: 4}  # all 4 rows, nulls first

    # (b) k larger than the candidate pool → truncated result, no crash
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.1, 0.9])],
        "vec_id long, embedding array<float>",
    )
    out = mmr_diversify(
        emb, "vec_id", "embedding", query_id=0, top_n=10, k=8, lam=0.7
    ).collect()
    assert [r.vec_id for r in out] == [1, 2]  # only 2 candidates exist

    # (c) NULL scores excluded from trimmed and raw means
    q = spark.createDataFrame(
        [("g", 1, 2.0), ("g", 2, 4.0), ("g", 3, None)],
        "src string, id long, v double",
    )
    r = trimmed_group_mean(q, "src", F.col("v"), "id", trim_frac=0.05)
    row = r.collect()[0]
    assert row.n_docs == 2 and row.raw_mean == 3.0 == row.trimmed_mean


def test_triangle_census_degree_cap(spark):
    """The wedge-budget guard: capping excludes hot vertices as wedge
    MIDDLES (their triangles drop, truncation reported via
    n_capped_vertices), while an un-binding cap changes nothing."""
    from go_fish_spark.operators.graph import triangle_census

    # K4 + pendant: vertex degrees 3,3,3,4,1
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    uncapped = triangle_census(df).collect()[0]
    assert uncapped.n_capped_vertices == 0

    loose = triangle_census(df, max_degree=10).collect()[0]
    assert (loose.n_triangles, loose.n_capped_vertices) == (
        uncapped.n_triangles, 0,
    )

    # cap at 3: vertex 4 (degree 4) is no longer a wedge middle — the
    # K4 triangles through middles 1,2,3 remain ({1,2,3} itself plus
    # those with 4 as an ENDPOINT); only middle-4 wedges vanish
    capped = triangle_census(df, max_degree=3).collect()[0]
    assert capped.n_capped_vertices == 1
    assert capped.n_triangles <= uncapped.n_triangles
    assert capped.n_wedges <= uncapped.n_wedges


def test_review_fixes_round7(spark, tmp_path):
    """Round-7 code-review regressions: (a) anomaly_gate survives a
    hand-written zero-std baseline (treated as baseline-less, no ANSI
    DIVIDE_BY_ZERO); (b) group_centroid_drift reports NULL for a
    zero-norm label instead of crashing; (c) mmr_diversify works with
    STRING ids; (d) n_rows=0 certstream reads as empty; (e) JPEG fill
    bytes (0xFF padding) before SOF0 still parse; (f) compact_shards
    recovers the corpus when a crash left it only under __compact_old."""
    import os
    import struct

    import pyspark.sql.functions as F

    # (a) zero-std baseline supplied directly in config
    from go_fish_spark.tasks.registry import get_task

    gate = get_task(
        "anomaly_gate",
        baselines={"a": [5.0, 0.0], "b": [10.0, 2.0]},
        z_threshold=2.0,
    )
    df = spark.createDataFrame(
        [(1, "a", 99.0), (2, "b", 20.0)],
        "event_id long, event_type string, value double",
    )
    out = {r.event_id: r for r in gate.apply(df).collect()}
    assert out[1].zscore is None and not out[1].is_anomaly
    assert out[2].is_anomaly  # the valid baseline still fires

    # (b) zero-norm label → NULL drift, not a crash
    from go_fish_spark.operators.similarity import group_centroid_drift

    emb = spark.createDataFrame(
        [(1, 0, [0.0, 0.0]), (2, 0, [0.0, 0.0]), (3, 1, [1.0, 2.0])],
        "vec_id long, label int, embedding array<float>",
    )
    d = {r.label: r for r in group_centroid_drift(
        emb, emb, "label", "embedding"
    ).collect()}
    assert d[0].centroid_cos is None and d[0].drift is None
    assert d[1].centroid_cos == 1.0

    # (c) string ids through MMR
    from go_fish_spark.operators.retrieval import mmr_diversify

    semb = spark.createDataFrame(
        [("q", [1.0, 0.0]), ("d1", [0.9, 0.1]), ("d2", [0.1, 0.9])],
        "vec_id string, embedding array<float>",
    )
    got = mmr_diversify(
        semb, "vec_id", "embedding", query_id="q", top_n=5, k=2
    ).collect()
    assert [r.vec_id for r in got] == ["d1", "d2"]

    # (d) zero-row certstream
    from go_fish_spark.sources import pyds

    pyds.register(spark)
    assert (
        spark.read.format("gofish_certstream").option("n_rows", 0).load()
        .count() == 0
    )

    # (e) JPEG with 0xFF fill padding before SOF0
    from go_fish_spark.operators.multimodal import _parse_image_header

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xff\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 600, 800) + b"\x01\x01\x11\x00")
    assert _parse_image_header(b"\xff\xd8" + app0 + sof0) == (
        "jpeg", 800, 600,
    )

    # (f) crash-window recovery: corpus only under __compact_old
    from go_fish_spark.sources import sharding

    path = str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    )
    sharding.write_sharded(docs, path, "doc_id", n_shards=2)
    before = {r.doc_id for r in sharding.read_sharded(spark, path).collect()}
    os.rename(path, path + "__compact_old")  # simulate the crash window
    manifest = sharding.compact_shards(spark, path)
    after = {r.doc_id for r in sharding.read_sharded(spark, path).collect()}
    assert after == before
    assert manifest.count() > 0
    assert not os.path.exists(path + "__compact_old")
