"""Curation-hygiene operators: benchmark decontamination, repetition
signals, PII scrubbing. Golden-value unit tests on constructed inputs (the
sf-corpus oracle compare is x21/x22/x23 in test_correctness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_fish_spark.functions import text as tx
from go_fish_spark.operators import decontam


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contaminated_docs_flags_shared_shingles(spark):
    train = _docs(spark, [
        (1, "the quick brown fox jumps"),       # shares "quick brown fox"
        (2, "totally unrelated words here now"),
        (3, "quick brown fox again and again"),  # shares it too
    ])
    ev = _docs(spark, [(100, "a quick brown fox ran")])
    got = {
        r.doc_id: r.n_hits
        for r in decontam.contaminated_docs(train, ev, "doc_id", "text").collect()
    }
    # doc1 shares {"quick brown fox", "brown fox jumps"?} — eval shingles:
    # {"a quick brown", "quick brown fox", "brown fox ran"} → 1 hit each
    assert got == {1: 1, 3: 1}


def test_decontaminate_keeps_clean_docs_only(spark):
    train = _docs(spark, [
        (1, "the quick brown fox jumps"),
        (2, "totally unrelated words here now"),
    ])
    ev = _docs(spark, [(100, "a quick brown fox ran")])
    kept = decontam.decontaminate(train, ev, "doc_id", "text")
    assert [r.doc_id for r in kept.collect()] == [2]


def test_min_hits_threshold(spark):
    train = _docs(spark, [(1, "one two three four five")])
    ev = _docs(spark, [(9, "one two three four nine")])
    # shared shingles: "one two three", "two three four" → 2 hits
    assert decontam.contaminated_docs(
        train, ev, "doc_id", "text", min_hits=3
    ).count() == 0
    assert decontam.contaminated_docs(
        train, ev, "doc_id", "text", min_hits=2
    ).count() == 1


def test_repetition_metrics_golden(spark):
    df = _docs(spark, [
        (1, "a a a a"),          # 1 distinct of 4 words; 2-grams all "a a"
        (2, "w x y z"),          # no repetition
        (3, "a b a b a"),        # 2-grams: ab,ba,ab,ba → top frac 0.5
        (4, "solo"),             # 1 word → both ratios 0.0
    ])
    m = tx.repetition_metrics("text")
    rows = {r.doc_id: r for r in df.select(
        "doc_id",
        m["dup_word_ratio"].alias("dup"),
        m["top_2gram_frac"].alias("top"),
    ).collect()}
    assert rows[1].dup == 0.75 and rows[1].top == 1.0
    assert rows[2].dup == 0.0 and rows[2].top == 1.0 / 3.0  # 3 distinct 2-grams
    assert rows[3].dup == 0.6 and rows[3].top == 0.5
    assert rows[4].dup == 0.0 and rows[4].top == 0.0


def test_pii_scrub_and_counts_golden(spark):
    df = _docs(spark, [
        (1, "mail bob@corp.example.com or sue@x.io from 192.168.1.17 call 555-123-4567"),
        (2, "no pii at all here"),
    ])
    n = tx.pii_counts("text")
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        n["email"].alias("n_email"),
        n["ipv4"].alias("n_ip"),
        n["phone"].alias("n_phone"),
        tx.scrub_pii("text").alias("scrubbed"),
    ).collect()}
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (2, 1, 1)
    assert out[1].scrubbed == "mail [EMAIL] or [EMAIL] from [IP] call [PHONE]"
    assert (out[2].n_email, out[2].n_ip, out[2].n_phone) == (0, 0, 0)
    assert out[2].scrubbed == "no pii at all here"


def test_chunk_documents_boundaries(spark):
    import pytest

    from go_fish_spark.operators.chunking import chunk_documents

    df = _docs(spark, [
        (1, "a b c"),                       # 3 tokens < win → one chunk
        (2, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
    ])
    out = chunk_documents(df, "doc_id", "text", win=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1
    assert by_doc[1][0].chunk == "a b c" and by_doc[1][0].n_tokens == 3
    # n_chunks = ceil((10-4)/3)+1 = 3; starts 1,4,7 → lengths 4,4,4
    assert [(r.chunk_id, r.n_tokens, r.chunk) for r in by_doc[2]] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(df, "doc_id", "text", win=4, stride=0)


def test_pack_documents_concat_and_cut(spark):
    from go_fish_spark.operators.chunking import pack_documents

    # one shard → a single ordered stream; capacity 5, doc sizes 3,3,3:
    # offsets 0,3,6 → packs 0,0,1 (doc 2 STARTS in pack 0 and overruns)
    df = _docs(spark, [(1, "a b c"), (2, "d e f"), (3, "g h i")])
    out = {r.doc_id: r for r in pack_documents(
        df, "doc_id", "text", capacity=5, n_shards=1
    ).collect()}
    assert [(out[i].shard, out[i].offset, out[i].pack_id) for i in (1, 2, 3)] \
        == [(0, 0, 0), (0, 3, 0), (0, 6, 1)]


def test_pack_documents_shards_are_deterministic(spark):
    from go_fish_spark.operators.chunking import pack_documents

    df = _docs(spark, [(i, "w " * 10) for i in range(50)])
    a = sorted(map(tuple, pack_documents(df, "doc_id", "text").collect()))
    b = sorted(map(tuple, pack_documents(
        df.repartition(7), "doc_id", "text"
    ).collect()))
    assert a == b  # invariant to physical layout


def test_substring_decontam_automaton_equals_join(spark):
    """The Aho-Corasick route (per-row cost independent of |probes|) must
    produce EXACTLY the contains-join's rows — including overlapping
    probes, probe-inside-probe, and repeated occurrences (both count
    DISTINCT probes contained, not occurrences)."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "quick brown quick brown quick brown"),  # repeats: still 1 hit each
            (4, "nothing to see here"),
            (5, "a quick brown fox in a box"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        # overlapping + nested probes: "quick brown" contains "quick";
        # "box" also appears inside no other probe
        [("quick brown",), ("quick",), ("box",), ("zebra",), ("quick",)],
        "probe string",
    )
    j = {
        (r.doc_id, r.n_probe_hits)
        for r in decontam.substring_contaminated_docs(
            docs, probes, "doc_id", "text", method="join"
        ).collect()
    }
    a = {
        (r.doc_id, r.n_probe_hits)
        for r in decontam.substring_contaminated_docs(
            docs, probes, "doc_id", "text", method="automaton"
        ).collect()
    }
    assert j == a
    assert j == {(1, 2), (2, 1), (3, 2), (5, 3)}

    # and on the real corpus with x32's probe construction
    from go_fish_spark.catalog import table
    from conftest import SF_SMALL

    corpus = table(spark, SF_SMALL, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    real_probes = (
        corpus.filter(is_eval)
        .select(F.substring("text", 1, 12).alias("probe"))
        .filter(F.length("probe") >= 12)
    )
    train = corpus.filter(~is_eval)
    jr = sorted(
        tuple(r)
        for r in decontam.substring_contaminated_docs(
            train, real_probes, "doc_id", "text", method="join"
        ).collect()
    )
    ar = sorted(
        tuple(r)
        for r in decontam.substring_contaminated_docs(
            train, real_probes, "doc_id", "text", method="automaton"
        ).collect()
    )
    assert jr == ar and jr


def test_substring_decontam_empty_probe_parity(spark):
    """Null / empty-string probes must be ignored by BOTH methods:
    contains(text, '') matches every doc, so an unfiltered '' in the join
    path would flag the whole corpus while the automaton path (which
    drops falsy probes) would not — breaking the identical-output
    contract."""
    from go_fish_spark.operators import decontam

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "beta epsilon")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [("beta",), ("",), (None,)], "probe string"
    )
    j = {
        (r.doc_id, r.n_probe_hits)
        for r in decontam.substring_contaminated_docs(
            docs, probes, "doc_id", "text", method="join"
        ).collect()
    }
    a = {
        (r.doc_id, r.n_probe_hits)
        for r in decontam.substring_contaminated_docs(
            docs, probes, "doc_id", "text", method="automaton"
        ).collect()
    }
    assert j == a == {(1, 1), (3, 1)}


def test_rebalance_mix_explicit_target_shares(spark):
    """The non-uniform branch: with target_shares={'a': 0.75, 'b': 0.25}
    over equal-sized groups, group 'a' (under its 75% target) must be
    kept WHOLE (rate 1 — no upsampling, so its share can't actually reach
    75%) while 'b' is thinned toward its 25% target; a group absent from
    target_shares gets rate 0 and vanishes."""
    from go_fish_spark.operators.sampling import rebalance_mix

    rows = (
        [(i, "a", 10) for i in range(100)]
        + [(i + 100, "b", 10) for i in range(100)]
        + [(i + 200, "c", 10) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    kept = rebalance_mix(
        df, "doc_id", "source", "n", target_shares={"a": 0.75, "b": 0.25}
    ).groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in kept}
    assert by_src.get("a") == 100          # rate 1: kept whole
    # b: target_tok = 0.25*2500 = 625 of actual 1000 -> rate 0.625;
    # md5-uniform acceptance keeps ~62 of 100 (hash variance ±~15)
    assert 45 <= by_src.get("b", 0) <= 80
    assert "c" not in by_src               # no target share -> rate 0

    # determinism: the kept set is a pure function of (doc_id, rates)
    kept2 = rebalance_mix(
        df, "doc_id", "source", "n", target_shares={"a": 0.75, "b": 0.25}
    ).groupBy("source").count().collect()
    assert {r.source: r["count"] for r in kept2} == by_src


def test_contamination_score_graded_and_zero_rows(spark):
    """x38's operator: overlap is hits/doc-shingles; clean docs appear
    with 0.0, and a doc too short to shingle gets n_shingles=0 →
    overlap 0.0 (not null/div-by-zero)."""
    train = _docs(spark, [
        (1, "the quick brown fox jumps"),   # 3 shingles, 1 hit
        (2, "totally unrelated words here"),
        (3, "too short"),                   # < 3 tokens → no shingles
    ])
    ev = _docs(spark, [(100, "a quick brown fox ran")])
    got = {
        r.doc_id: (r.n_shingles, r.n_hits, r.overlap)
        for r in decontam.contamination_score(
            train, ev, "doc_id", "text"
        ).collect()
    }
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_novelty_score_boilerplate_vs_unique(spark):
    """x41's operator: a doc whose shingles all recur elsewhere scores 0,
    an all-unique doc scores 1, a mixed doc scores the exact fraction."""
    from go_fish_spark.operators.ngrams import novelty_score

    docs = _docs(spark, [
        (1, "copy pasta line one two"),      # shared with doc 2 entirely
        (2, "copy pasta line one two"),
        (3, "entirely fresh unique document text"),
        (4, "copy pasta line plus novel suffix here"),
    ])
    got = {
        r.doc_id: (r.n_shingles, r.n_common, r.novelty)
        for r in novelty_score(docs, "doc_id", "text").collect()
    }
    assert got[1] == (3, 3, 0.0)
    assert got[2] == (3, 3, 0.0)
    assert got[3] == (3, 0, 1.0)
    # doc 4 shares "copy pasta line" only → 1 of 5 shingles common
    assert got[4] == (5, 1, round(1 - 1 / 5, 6))


def test_epoch_upsample_rates_and_epoch_numbering(spark):
    """x40's operator: rf=2 exactly → every row gets epochs {1,2}; an
    under-target group upsamples, group totals land within one draw of
    target; epoch numbering is 1..n."""
    from go_fish_spark.operators.sampling import epoch_upsample

    # two sources, 4:1 token mass → uniform target 2.5 each:
    # rf(big)=0.625, rf(small)=2.5
    rows = [(i, "big", 100) for i in range(8)] + [(100, "small", 200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = epoch_upsample(df, "doc_id", "source", "n_tokens").collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    # the small source's single doc: rf=2.5 → 2 or 3 epochs, numbered 1..n
    small_epochs = sorted(by_doc[100])
    assert small_epochs in ([1, 2], [1, 2, 3])
    # big source: rf<1 → every kept doc has exactly [1]
    for d, eps in by_doc.items():
        if d != 100:
            assert eps == [1]
    # determinism: a second run yields the identical multiset
    out2 = epoch_upsample(df, "doc_id", "source", "n_tokens").collect()
    assert sorted((r.doc_id, r.epoch) for r in out2) == sorted(
        (r.doc_id, r.epoch) for r in out
    )


def test_quantization_roundtrip_bounds(spark):
    """x39's helpers: int8 reconstruction stays within the scale/2 grid
    error per dim (cos ≈ 1), energy fraction is within (0, 1], and the
    all-zero vector is gated out by scale > 0."""
    from go_fish_spark.functions import vectors

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.125]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = (
        df.withColumn("_scale", vectors.quant_scale("embedding"))
        .filter(F.col("_scale") > 0)
        .withColumn(
            "_deq",
            vectors.dequantize(
                vectors.quantize_int8("embedding", F.col("_scale")),
                F.col("_scale"),
            ),
        )
        .select(
            "vec_id",
            vectors.cosine("embedding", F.col("_deq")).alias("cos"),
            vectors.energy_fraction("embedding", 2).alias("en"),
            "_deq",
        )
        .collect()
    )
    assert [r.vec_id for r in out] == [1]
    r = out[0]
    assert r.cos > 0.999
    # scale = 1/127; each reconstructed dim within scale/2 of the original
    for orig, deq in zip([1.0, -0.5, 0.25, 0.125], r._deq):
        assert abs(orig - deq) <= (1.0 / 127) / 2 + 1e-12
    assert 0.0 < r.en <= 1.0
    # first-2-dims energy: (1 + .25) / (1 + .25 + .0625 + .015625)
    assert abs(r.en - 1.25 / 1.328125) < 1e-9


# ---------------------------------------------------------------------------
# x42: Gopher rule gate


def test_gopher_rules_flags_and_keep(spark):
    good = " ".join(["the", "a", "of"] + ["wordy"] * 60)      # 63 words, stopwords ok
    short = "the a tiny doc"                                   # < 50 words
    symbols = " ".join(["the", "a"] + ["###"] * 60)            # symbol ratio + alpha fail
    nostop = " ".join(["zz"] * 60)                             # no stopwords
    df = _docs(spark, [(1, good), (2, short), (3, symbols), (4, nostop)])
    m = tx.gopher_metrics("text")
    flags = tx.gopher_flags(m)
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in flags.items()],
            tx.gopher_keep(flags).alias("keep"),
        ).collect()
    }
    assert out[1].keep
    assert not out[2].ok_word_count and not out[2].keep
    assert not out[3].ok_symbol_ratio and not out[3].ok_alpha_ratio
    assert not out[4].ok_stopwords and not out[4].keep


def test_gopher_duck_mirror_matches(spark, tmp_path):
    """The DuckDB expression table reproduces the Spark flags row-for-row
    on a constructed corpus (the sf-corpus compare is x42 in
    test_correctness)."""
    import duckdb

    rows = [
        (1, " ".join(["the", "a", "of"] + ["wordy"] * 60)),
        (2, "the a tiny doc"),
        (3, " ".join(["the", "a"] + ["###"] * 60)),
        (4, " ".join(["zz"] * 60)),
    ]
    df = _docs(spark, rows)
    m = tx.gopher_metrics("text")
    flags = tx.gopher_flags(m)
    spark_rows = sorted(
        (r.doc_id, tuple(r[k] for k in flags))
        for r in df.select("doc_id", *[c.alias(k) for k, c in flags.items()]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    g = tx.duck_gopher_exprs("text")
    duck_rows = sorted(
        (r[0], tuple(r[1:]))
        for r in con.execute(
            "SELECT doc_id, "
            + ", ".join(g[k] for k in flags)
            + " FROM documents"
        ).fetchall()
    )
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# x43: DSIR importance weights


def test_dsir_weights_prefer_target_like_docs(spark):
    from go_fish_spark.operators.dsir import dsir_weights

    target_vocab = "alpha beta gamma delta epsilon"
    other_vocab = "zeta eta theta iota kappa"
    rows = (
        [(i, target_vocab) for i in range(5)]          # target exemplars
        + [(10 + i, other_vocab) for i in range(5)]    # bulk raw
        + [(100, target_vocab), (101, other_vocab)]    # probes
    )
    df = _docs(spark, rows)
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir_weights(
            df, "doc_id", "text", F.col("doc_id") < 10, n_buckets=64
        ).collect()
    }
    # A doc written in the target vocabulary must out-score one written in
    # the non-target vocabulary, and sit above the corpus-neutral zero.
    assert got[100] > 0 > got[101]


# ---------------------------------------------------------------------------
# x45: split leakage guard


def test_split_leakage_reports_only_cross_split_pairs(spark):
    from go_fish_spark.operators.decontam import split_leakage

    near_a = "the quick brown fox jumps over the lazy dog today"
    near_b = "the quick brown fox jumps over the lazy dog tonight"
    df = _docs(spark, [
        (1, near_a), (11, near_b),        # near-dups across the split line
        (2, near_a), (3, near_b),         # near-dups both in train
        (12, "completely different words with no shared shingles at all"),
    ])
    split = F.when(F.col("doc_id") < 10, F.lit("train")).otherwise(F.lit("test"))
    leaks = split_leakage(df, "doc_id", "text", split, k=3, threshold=0.3).collect()
    got = {(r.id_a, r.id_b): (r.split_a, r.split_b) for r in leaks}
    assert (1, 11) in got and got[(1, 11)] == ("train", "test")
    assert (2, 11) in got and (3, 11) in got   # cross-split near-dups too
    assert (2, 3) not in got                    # same-split pair is not a leak
    assert all(a != b for a, b in got.values())


# ---------------------------------------------------------------------------
# x46: token budget report


def test_token_budget_report_bins_and_cumulative_share(spark):
    from go_fish_spark.operators.chunking import token_budget_report

    df = _docs(spark, [
        (1, "a b c"),            # 3 tokens  -> bin 2
        (2, "a b c d e"),        # 5 tokens  -> bin 4
        (3, " ".join(["w"] * 8)),  # 8 tokens -> bin 8
    ])
    rows = {r.bucket_lo: r for r in token_budget_report(df, "text").collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2].n_docs == 1 and rows[2].tok_total == 3
    assert rows[4].tok_total == 5 and rows[8].tok_total == 8
    assert abs(rows[8].cum_share - 1.0) < 1e-9
    assert abs(rows[2].cum_share - 3 / 16) < 1e-6


# ---------------------------------------------------------------------------
# x48: temperature mixture / x49: quality-argmax canonical


def test_temperature_rates_flatten_toward_uniform(spark):
    from go_fish_spark.operators import sampling

    rows = [(i, "big" if i < 90 else "small", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    # tau=1 reproduces the observed mix: every rate is 1 (no thinning).
    r1 = {r.source: r._rate for r in sampling.temperature_rates(df, "source", "n_tokens", tau=1.0).collect()}
    assert r1 == {"big": 1.0, "small": 1.0}
    # tau=0 is the uniform target: big thinned to 50/90, small kept whole.
    r0 = {r.source: r._rate for r in sampling.temperature_rates(df, "source", "n_tokens", tau=0.0).collect()}
    assert r0["small"] == 1.0
    assert abs(r0["big"] - 50 / 90) < 1e-9
    # intermediate tau lands between
    rt = {r.source: r._rate for r in sampling.temperature_rates(df, "source", "n_tokens", tau=0.5).collect()}
    assert r0["big"] < rt["big"] < 1.0


def test_best_quality_canonical_prefers_quality_over_min_id(spark):
    from pyspark.sql import Window
    from go_fish_spark.operators.dedup import ngram_jaccard_pairs
    from go_fish_spark.operators.graph import connected_components

    # 1 and 2 are near-dups; 2 is longer → higher quality score, so the
    # canonical must be 2 even though min-id is 1.
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = _docs(spark, [
        (1, base),
        (2, base + " with extra high quality context words included here"),
        (3, "entirely different text with no shared shingles anywhere at all"),
    ])
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3)
    comp = connected_components(df.select("doc_id"), pairs, id_col="doc_id")
    q = df.select(F.col("doc_id"), tx.quality_score("text").alias("_q"))
    j = comp.select(F.col("id").alias("doc_id"), "component").join(q, "doc_id")
    w = Window.partitionBy("component").orderBy(F.col("_q").desc(), F.col("doc_id"))
    canon = {
        r.component: r.doc_id
        for r in j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    assert canon[1] == 2     # cluster {1,2} keeps the higher-quality 2
    assert canon[3] == 3


# ---------------------------------------------------------------------------
# x50: source-overlap matrix


def test_source_overlap_counts_shared_spans(spark):
    from go_fish_spark.operators.ngrams import source_span_overlap

    shared = "one two three four five six seven eight"   # exactly one 8-span
    rows = [
        (1, shared + " alpha", "srcA"),
        (2, shared + " beta", "srcB"),
        (3, "totally different words making no shared span at all here", "srcC"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.source_a, r.source_b): r.n_shared
        for r in source_span_overlap(df, "source", "text", k=8).collect()
    }
    assert got == {("srcA", "srcB"): 1}


def test_score_with_ratios_empty_history_scores_missing_lr(spark):
    """Fitting on an empty history yields an empty ratio table; scoring
    must fall back to missing_lr per token (not crash on a void-typed
    empty map literal)."""
    from go_fish_spark.operators import dsir

    df = _docs(spark, [(1, "a b c")])
    empty = dsir.fit_bucket_ratios(
        df.filter(F.lit(False)), "text", F.lit(True), n_buckets=16
    )
    got = dsir.score_with_ratios(
        df, "doc_id", "text", empty, 16, missing_lr=-1.5
    ).collect()
    assert got[0].n_tokens == 3
    assert abs(got[0].dsir_logweight - -1.5) < 1e-9


def test_score_with_ratios_drops_null_text_like_batch_form(spark):
    """NULL-text parity: the batch form's explode drops NULL docs from
    its output; the frozen-ratio form must produce the same row SET."""
    from go_fish_spark.operators import dsir

    df = spark.createDataFrame(
        [(1, "a b"), (2, None)], "doc_id long, text string"
    )
    ratios = dsir.fit_bucket_ratios(df, "text", F.col("doc_id") == 1, n_buckets=16)
    batch_ids = {
        r.doc_id
        for r in dsir.dsir_weights(
            df, "doc_id", "text", F.col("doc_id") == 1, n_buckets=16
        ).collect()
    }
    frozen_ids = {
        r.doc_id
        for r in dsir.score_with_ratios(df, "doc_id", "text", ratios, 16).collect()
    }
    assert batch_ids == frozen_ids == {1}


# ---------------------------------------------------------------------------
# x56: per-source cap / x58: global hash order


def test_source_cap_keeps_under_cap_sources_whole(spark):
    from go_fish_spark.operators.sampling import source_cap

    rows = [(i, "hot") for i in range(20)] + [(100 + i, "cold") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = source_cap(df, "source", "doc_id", cap=5)
    by_src = {r[0]: r[1] for r in kept.groupBy("source").count().collect()}
    assert by_src == {"hot": 5, "cold": 3}
    # survivors of the hot key are exactly the 5 smallest md5(doc_id)
    import hashlib

    expect = sorted(range(20), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
    got = sorted(r.doc_id for r in kept.filter(F.col("source") == "hot").collect())
    assert got == sorted(expect)


def test_source_cap_under_branch_is_map_only(spark):
    """Under-cap rows must flow through a broadcast anti-join — no
    corpus-side exchange on the source key."""
    from go_fish_spark.operators.sampling import source_cap

    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(40)], "doc_id long, source string"
    )
    kept = source_cap(df, "source", "doc_id", cap=100)  # nobody over cap
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert kept.count() == 40


def test_source_cap_caps_null_key_group(spark):
    """Round-5 ADVICE fix: a NULL-keyed group over cap is capped like any
    other key (null-safe over/under split) — and the survivors are the
    same cap-smallest md5(id) prefix the oracle's PARTITION BY picks.
    The frozen-threshold streaming arm must agree on the same input."""
    import hashlib

    from go_fish_spark.operators.sampling import (
        apply_cap_thresholds,
        source_cap,
        source_cap_thresholds,
    )

    rows = [(i, None) for i in range(20)] + [(100 + i, "cold") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = source_cap(df, "source", "doc_id", cap=5)
    by_src = {
        r[0]: r[1]
        for r in kept.groupBy("source").count().collect()
    }
    assert by_src == {None: 5, "cold": 3}
    expect = sorted(
        range(20), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:5]
    got = sorted(
        r.doc_id for r in kept.filter(F.col("source").isNull()).collect()
    )
    assert got == sorted(expect)

    th = source_cap_thresholds(df, "source", "doc_id", cap=5)
    frozen = apply_cap_thresholds(df, th, "source", "doc_id")
    assert sorted(
        (r.doc_id, r.source) for r in frozen.collect()
    ) == sorted((r.doc_id, r.source) for r in kept.collect())


def test_global_hash_order_matches_single_window_rank(spark):
    """The bucketed distributed rank must equal the one-window global
    rank for every row (prefix-order consistency), for any n_buckets."""
    from pyspark.sql import Window

    from go_fish_spark.operators.sampling import global_hash_order

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    key = F.md5(F.concat(F.lit("seed0"), F.lit("|"), F.col("doc_id").cast("string")))
    ref = {
        r.doc_id: r.pos
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy(key, F.col("doc_id")))
        ).collect()
    }
    for nb in (1, 7, 256):
        got = {
            r.doc_id: r.position
            for r in global_hash_order(df, "doc_id", "seed0", n_buckets=nb).collect()
        }
        assert got == ref, f"n_buckets={nb}"


# ---------------------------------------------------------------------------
# x57: BM25 / x59: kNN vote


def test_bm25_matches_hand_computation(spark):
    import math

    from go_fish_spark.operators.retrieval import bm25_scores

    docs = [(1, "a b a c"), (2, "a d"), (3, "d d d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_terms_matched, r.bm25)
           for r in bm25_scores(df, "doc_id", "text", ["a", "d"]).collect()}
    N, avgdl = 3, (4 + 2 + 3) / 3
    def idf(dfreq): return math.log(1.0 + (N - dfreq + 0.5) / (dfreq + 0.5))
    def w(tf, dl, dfreq, k1=1.2, b=0.75):
        return round(idf(dfreq) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl)), 12)
    assert got[1][0] == 1 and abs(got[1][1] - round(w(2, 4, 2), 9)) < 1e-9
    assert got[2][0] == 2 and abs(got[2][1] - round(w(1, 2, 2) + w(1, 2, 2), 9)) < 1e-9
    assert got[3][0] == 1 and abs(got[3][1] - round(w(3, 3, 2), 9)) < 1e-9


def test_knn_classify_majority_and_tiebreak(spark):
    from go_fish_spark.operators.similarity import knn_classify

    # 1-D embeddings: query 0 at origin-ish; neighbors split 2 labels.
    # k=4 voters: labels [1,1,2,2] -> tie -> smaller label (1) wins.
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.99, 0.14], 1), (2, [0.98, 0.19], 1),
        (3, [0.97, 0.24], 2), (4, [0.96, 0.28], 2),
        (5, [-1.0, 0.0], 3),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = knn_classify(emb, emb.filter(F.col("vec_id") == 0), k=4).collect()
    assert len(got) == 1
    assert got[0].label_pred == 1 and got[0].n_votes == 2


# ---------------------------------------------------------------------------
# x60: bigram fluency / x61: JL projection / x62: cluster histogram


def test_bigram_logprob_is_word_order_sensitive(spark):
    """The bigram score must separate natural-order from scrambled text
    even when their unigram bags are IDENTICAL — the failure mode x34's
    unigram score cannot see. Corpus: many copies of one phrase + one
    scrambled permutation of the same words."""
    from go_fish_spark.operators.ngrams import bigram_logprob, unigram_logprob

    phrase = "the quick brown fox jumps"
    scrambled = "fox the jumps quick brown"
    rows = [(i, phrase) for i in range(10)] + [(99, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bg = {r.doc_id: r.avg_logprob for r in bigram_logprob(df, "doc_id", "text").collect()}
    ug = {r.doc_id: r.avg_logprob for r in unigram_logprob(df, "doc_id", "text").collect()}
    assert bg[0] > bg[99]                       # order matters to the bigram LM
    assert abs(ug[0] - ug[99]) < 1e-9           # ...and not to the unigram LM
    # docs with < 2 tokens have no bigram positions and are absent
    df2 = spark.createDataFrame([(1, "solo"), (2, "a b")], "doc_id long, text string")
    assert {r.doc_id for r in bigram_logprob(df2, "doc_id", "text").collect()} == {2}


def test_jl_projection_preserves_pairwise_distance(spark):
    """JL guarantee smoke: 64→16 projection of a handful of random
    vectors keeps pairwise squared distances within a loose distortion
    band (k=16 → se ~ sqrt(2/k) ≈ 0.35; allow ±0.8 relative)."""
    import numpy as np

    from go_fish_spark.operators.similarity import hyperplanes, jl_project_expr

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((6, 64))
    planes = hyperplanes(64, 16, seed=7)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    proj = {
        r.vec_id: np.array(r.p)
        for r in df.select(
            "vec_id", jl_project_expr("embedding", planes).alias("p")
        ).collect()
    }
    for i in range(6):
        for j in range(i + 1, 6):
            d_orig = float(((vecs[i] - vecs[j]) ** 2).sum())
            d_proj = float(((proj[i] - proj[j]) ** 2).sum())
            assert 0.2 * d_orig < d_proj < 1.8 * d_orig, (i, j, d_orig, d_proj)


def test_cluster_size_histogram_bins(spark):
    """Crafted corpus: one 3-clique of near-dups + two singletons. The
    histogram (x62's actual binning expression) must report
    bucket 1: 2 singleton clusters / 2 docs and bucket 2: one 3-member
    cluster / 3 docs (3 -> bin [2,4))."""
    from go_fish_spark.operators import dedup
    from go_fish_spark.operators.graph import (
        cluster_size_histogram,
        connected_components,
    )

    near = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, near + " one"), (2, near + " two"), (3, near + " three"),
        (10, "completely different words with no shared shingles here"),
        (11, "another unrelated document about entirely other topics now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3)
    comp = connected_components(df.select("doc_id"), pairs, id_col="doc_id")
    hist = {
        r.bucket_lo: (r.n_clusters, r.n_docs)
        for r in cluster_size_histogram(comp).collect()
    }
    assert hist == {1: (2, 2), 2: (1, 3)}
    # power-of-2 edges: sizes 1/2/4 land in their own bins, 3 in bin 2
    sizes = spark.createDataFrame(
        [(i, c) for c, n in enumerate([1, 2, 3, 4]) for i in range(n)],
        "id long, component long",
    )
    edge = {
        r.bucket_lo: (r.n_clusters, r.n_docs)
        for r in cluster_size_histogram(
            sizes.select(F.col("id").alias("_x"), "component")
        ).collect()
    }
    assert edge == {1: (1, 1), 2: (2, 5), 4: (1, 4)}


# ---------------------------------------------------------------------------
# x63: curriculum order / x64: mutual kNN / x65: nearest centroid


def test_curriculum_order_stages_then_hash(spark):
    """Stage-major ordering: every stage-0 position precedes every
    stage-1 position, and the whole thing matches the one-window global
    rank reference."""
    import hashlib

    from pyspark.sql import Window

    from go_fish_spark.operators.sampling import curriculum_order

    rows = [(i, (i % 10) / 10.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score double").repartition(6)
    out = curriculum_order(df, "doc_id", "score", n_stages=4, seed="s").collect()
    pos = {r.doc_id: (r.stage, r.position) for r in out}
    assert sorted(p for _, p in pos.values()) == list(range(1, 201))
    # stage-major: positions within a lower stage all precede higher stages
    by_stage = {}
    for s, p in pos.values():
        by_stage.setdefault(s, []).append(p)
    stages = sorted(by_stage)
    for a, b in zip(stages, stages[1:]):
        assert max(by_stage[a]) < min(by_stage[b])
    # exact reference: one-window rank over (stage, md5(seed|id), id)
    def stage_of(score):
        c = min(max(score, 0.0), 1.0)
        return min(int((1.0 - c) * 4), 3)
    ordered = sorted(
        rows,
        key=lambda t: (stage_of(t[1]), hashlib.md5(f"s|{t[0]}".encode()).hexdigest(), t[0]),
    )
    assert {i: p for p, (i, _) in enumerate(ordered, 1)} == {
        i: p for i, (_, p) in pos.items()
    }


def test_mutual_knn_requires_both_directions(spark):
    """Hub vector: many vectors point AT the hub, but the hub's own top-k
    holds only its k nearest — one-directional neighbors of the hub
    beyond rank k must not appear as mutual pairs."""
    from go_fish_spark.operators.similarity import brute_force_topk, mutual_knn_pairs

    import numpy as np

    rng = np.random.default_rng(3)
    # hub at e1; satellites close to the hub; k=2 keeps only 2 per list
    vecs = [np.array([1.0, 0.0]) ]
    for i in range(6):
        v = np.array([1.0, 0.05 * (i + 1)])
        vecs.append(v / np.linalg.norm(v))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    nn = brute_force_topk(df, df, k=2)
    one_dir = {(min(r.query_id, r.vec_id), max(r.query_id, r.vec_id)) for r in nn.collect()}
    mutual = {(r.id_a, r.id_b) for r in mutual_knn_pairs(df, k=2, method="brute").collect()}
    assert mutual <= one_dir and len(mutual) < len(one_dir)
    # every mutual pair really is reciprocal in the one-directional lists
    fwd = {(r.query_id, r.vec_id) for r in nn.collect()}
    for a, b in mutual:
        assert (a, b) in fwd and (b, a) in fwd


def test_ordering_ops_keep_null_rows_dense(spark):
    """NULL score / NULL id rows must stay in the order with dense 1..n
    positions (the review-flagged silent-drop hazard): NULL score lands
    in the last stage, NULL id hashes as the empty string."""
    from go_fish_spark.operators.sampling import curriculum_order, global_hash_order

    df = spark.createDataFrame(
        [(1, 0.9), (2, None), (None, 0.5), (4, 0.1)],
        "doc_id long, score double",
    )
    out = curriculum_order(df, "doc_id", "score", n_stages=3, seed="s").collect()
    assert sorted(r.position for r in out) == [1, 2, 3, 4]
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].stage == 2          # NULL score -> last stage
    assert None in by_id                # NULL id retained

    out2 = global_hash_order(df.select("doc_id"), "doc_id", "s").collect()
    assert sorted(r.position for r in out2) == [1, 2, 3, 4]
    assert any(r.doc_id is None for r in out2)


def test_ordering_ops_tiebreak_col_restores_total_order(spark):
    """Round-5 ADVICE fix: with duplicate ids, (hash, id) is not a total
    order — passing tiebreak_col appends a final deterministic sort key,
    so positions become a pure function of (id, tiebreak) regardless of
    layout."""
    from go_fish_spark.operators.sampling import (
        curriculum_order,
        global_hash_order,
    )

    rows = [(7, f"a-{i}", 0.5) for i in range(6)] + [
        (9, f"b-{i}", 0.9) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    for parts in (1, 5):
        got = {
            r.text: r.position
            for r in global_hash_order(
                df.repartition(parts), "doc_id", "s", tiebreak_col="text"
            ).collect()
        }
        # dense 1..n, and within an id-group ordered by the tiebreak text
        assert sorted(got.values()) == list(range(1, 11))
        seven = [got[f"a-{i}"] for i in range(6)]
        assert seven == sorted(seven)
    out = curriculum_order(
        df, "doc_id", "score", n_stages=2, seed="s", tiebreak_col="text"
    ).collect()
    assert sorted(r.position for r in out) == list(range(1, 11))


def test_scrub_contaminated_spans_golden_and_stream_safe(spark):
    """x76's engine: exactly the tokens covered by a benchmark shingle
    are removed, short docs pass untouched, NULL text stays NULL, and a
    doc that IS a benchmark shingle scrubs to empty (0-token doc)."""
    from go_fish_spark.operators.decontam import scrub_contaminated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "x y z"),
            (3, "c d e"),
            (4, None),
            (5, "aa bb"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.text_scrubbed, r.n_tokens_removed)
        for r in scrub_contaminated_spans(docs, "doc_id", "text", ["c d e"]).collect()
    }
    assert out == {
        1: ("a b f g", 3),
        2: ("x y z", 0),
        3: ("", 3),
        4: (None, 0),
        5: ("aa bb", 0),
    }
    # overlapping contaminated windows scrub their union, not double-count
    docs2 = spark.createDataFrame(
        [(1, "p q r s t")], "doc_id long, text string"
    )
    out2 = scrub_contaminated_spans(
        docs2, "doc_id", "text", ["p q r", "q r s"]
    ).collect()[0]
    assert (out2.text_scrubbed, out2.n_tokens_removed) == ("t", 4)


def test_x20_flagship_runs_one_cc_and_publishes_audit_columns(
    spark, monkeypatch
):
    """Round-5 verdict #5: the composed x20 flagship must route its
    clustering through the shared audit pass — connected_components runs
    exactly ONCE for canonical selection AND the published audit columns
    (n_members + power-of-2 cluster_bucket, the x62-histogram grain:
    the histogram/attrition reports are a bounded groupBy over them)."""
    from conftest import SF_SMALL

    from go_fish_spark.operators import audit as audit_mod
    from go_fish_spark.operators import graph as graph_mod
    from go_fish_spark.queries import REGISTRY
    from go_fish_spark.queries.extensions._shared import (
        release_session_caches,
    )

    # the curation pass is session-cached — clear so the fit (and its
    # single CC run) lands inside this test's counter
    release_session_caches()

    calls = {"n": 0}
    real_cc = graph_mod.connected_components

    def counting_cc(*a, **kw):
        calls["n"] += 1
        return real_cc(*a, **kw)

    monkeypatch.setattr(audit_mod, "connected_components", counting_cc)
    out = REGISTRY["x20_curation_pipeline"].fn(spark, SF_SMALL)
    rows = out.collect()
    assert calls["n"] == 1
    assert {"n_members", "cluster_bucket"} <= set(out.columns)
    # every published row is a canonical doc; its bucket is the
    # histogram bin of its own cluster size
    for r in rows:
        assert r.n_members >= 1
        assert r.cluster_bucket <= r.n_members < 2 * r.cluster_bucket
    # the x62-shape histogram derives from the output with one groupBy
    hist = (
        out.groupBy("cluster_bucket")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .collect()
    )
    assert sum(h.n_clusters for h in hist) == len(rows)


def test_weighted_reservoir_properties(spark):
    """x84 invariants: exactly k rows; deterministic and layout-
    invariant; uniform weights reduce to the md5-hash-order top-k; an
    overwhelming weight is selected; non-positive weights carry no
    sampling mass; k is validated."""
    import pytest

    from go_fish_spark.operators.sampling import (
        hash_uniform,
        weighted_reservoir,
    )

    df = spark.createDataFrame(
        [(i, 1.0 if i != 7 else 1e9) for i in range(50)]
        + [(100, 0.0), (101, -2.0)],
        "doc_id long, w double",
    )
    out = weighted_reservoir(df, "doc_id", "w", k=10)
    rows = out.collect()
    assert len(rows) == 10
    ids = {r.doc_id for r in rows}
    assert 7 in ids            # w=1e9 → key ≈ 0⁻, practically always in
    assert not ids & {100, 101}  # non-positive weights excluded
    rows2 = weighted_reservoir(df.repartition(7), "doc_id", "w", k=10).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))

    # uniform weights: the lottery degenerates to top-k by the raw
    # deterministic uniform (ln is monotone) — cross-check directly
    uni = spark.createDataFrame([(i, 1.0) for i in range(50)], "doc_id long, w double")
    got = {r.doc_id for r in weighted_reservoir(uni, "doc_id", "w", k=5).collect()}
    expect = {
        r.doc_id
        for r in uni.select(
            "doc_id",
            hash_uniform(F.concat(F.lit("aes"), F.col("doc_id").cast("string"))).alias("u"),
        )
        .orderBy(F.col("u").desc(), "doc_id")
        .limit(5)
        .collect()
    }
    assert got == expect

    with pytest.raises(ValueError, match="k must"):
        weighted_reservoir(df, "doc_id", "w", k=0)


def test_source_floor_golden(spark):
    """x86: groups below the floor vanish entirely; boundary (== floor)
    stays; row payloads preserved (semi join)."""
    import pytest

    from go_fish_spark.operators.sampling import source_floor

    df = spark.createDataFrame(
        [(1, "big"), (2, "big"), (3, "big"), (4, "edge"), (5, "edge"),
         (6, "tiny")],
        "doc_id long, source string",
    )
    out = sorted(
        (r.doc_id, r.source) for r in source_floor(df, "source", 2).collect()
    )
    assert out == [(1, "big"), (2, "big"), (3, "big"), (4, "edge"), (5, "edge")]
    assert source_floor(df, "source", 4).count() == 0
    with pytest.raises(ValueError, match="min_docs"):
        source_floor(df, "source", 0)


def test_eval_coverage_golden(spark):
    """x88: full / partial / zero coverage plus the 0-shingle eval doc
    (reports coverage 0.0, not a crash or NULL)."""
    from go_fish_spark.operators.decontam import eval_coverage

    train = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # all 2 of 2? -> 3-shingles
            (2, "alpha beta gamma nine ten"),   # partial
            (3, "one two three four"),          # zero
            (4, "xy z"),                        # < k tokens -> no shingles
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_shingles, r.n_covered, r.coverage)
        for r in eval_coverage(train, evals, "doc_id", "text", k=3).collect()
    }
    # doc 1: shingles {a b g, b g d} both in train -> 2/2
    assert out[1] == (2, 2, 1.0)
    # doc 2: {a b g, b g n, g n t} -> only "alpha beta gamma" covered
    assert out[2] == (3, 1, round(1 / 3, 6))
    assert out[3] == (2, 0, 0.0)
    assert out[4] == (0, 0, 0.0)
