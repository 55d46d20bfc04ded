#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. When the per-query map would overflow
the driver's 2000-char stdout tail window, the stdout line is a compact
summary ({"metric","value","unit","sf","reps","n_queries","n_errors",
"queries_file"}) and the full map lives in BENCH_FULL.json + stderr.

Each query is executed once as a warm-up-free wall-clock measurement of
plan + execute + collect-count (count() keeps the full plan but avoids
driver-side result materialization skew for wide outputs).

NOTE on cross-round comparison: the HEADLINE set GROWS each round (22
queries in r01 → 41 in r02 → 52 in r03 → 81 in r04 → 88 in r05), so the
headline TOTAL is not comparable across rounds — compare per-query
timings. The 52 queries common to r03 and r04 total 38.7 s in r03 and
24.2 s in r04 (same sf0.1, local[32]); r04 → r05 is flat on the 70
capturable common queries (46.6 s → 48.4 s, within the observed ±25%
per-query noise band; no regression exceeds 0.5 s absolute).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# In-run contention adjudication (r13 verdict Next #5): twice running
# (r12 x38–x47 block, r13 x166/x128) the committed driver artifact
# needed after-the-fact noise adjudication because a transient host
# spike blew up a contiguous block of entries. The bench now re-runs —
# ONCE — any entry whose recorded wall exceeds its own committed
# BENCH_FULL history by the cross-round reporting bar (>2x AND >0.3 s,
# the same rule gen_crossround applies), keeps the better time, and
# flags the rerun in the artifact so the cross-round diff sees both.
RERUN_RATIO = 2.0
RERUN_ABS_S = 0.3


def needs_rerun(current: float, history) -> bool:
    """The gen_crossround coarse bar, applied in-run against the entry's
    own committed history: >2x slower AND >0.3 s absolute."""
    if history is None or history <= 0:
        return False
    return (
        current > RERUN_RATIO * history
        and current - history > RERUN_ABS_S
    )


def adjudicate_reruns(
    timings: dict, history: dict, run_once, progress=lambda m: None
) -> dict:
    """Re-run each past-bar outlier once and keep the BETTER median
    candidate. ``run_once(name) -> float`` executes the entry and
    returns its wall; a rerun that itself fails leaves the original
    timing and records the error. Returns {name: {was, rerun, kept,
    history}} for the artifact."""
    rerun_info: dict = {}
    for name in sorted(timings):
        h = history.get(name)
        t = timings[name]
        if not needs_rerun(t, h):
            continue
        try:
            t2 = run_once(name)
        except Exception as exc:  # noqa: BLE001 — keep the original
            rerun_info[name] = {
                "was": t, "history": h,
                "rerun_error": f"{type(exc).__name__}: {exc}"[:200],
            }
            continue
        kept = round(min(t, t2), 3)
        rerun_info[name] = {
            "was": t, "rerun": round(t2, 3), "kept": kept, "history": h,
        }
        timings[name] = kept
        progress(
            f"# rerun {name}: was {t:.3f}s vs history {h:.3f}s -> "
            f"rerun {t2:.3f}s, kept {kept:.3f}s"
        )
    return rerun_info


# Headline set: one per operator family — scan+filter, join+agg, window
# funcs, as-of state join, tumbling window, union, topk, json, dedup/text
# extensions when present.
HEADLINE = [
    "q01_filter_eq",
    "q07_enrich_join",
    "q08_keyed_agg",
    "q10_tumbling_window",
    "q11_fanin_union",
    "q13_join_inner",
    "q14_rollup",
    "q15_window_funcs",
    "q16_topk",
    "q18_scalar_battery",
    "q20_json_extract",
    "q77_variant_json",
    "q79_recursive_series",
    "q21_s2s_asof_join",
    "q22_sessionize",
    "q27_explode_topk",
    "q29_stats",
    "q30_tpch_q1",
    "q33_tpch_q3",
    "q34_tpch_q5",
    "q41_session_window",
    "q76_sliding_window",
    # extensions (skipped gracefully if not yet registered)
    "x01_dedup_exact",
    "x02_dedup_minhash_lsh",
    "x06_ann_cosine_topk",
    # correlated-subquery decorrelation shapes
    "q59_tpch_q4_exists",
    "q62_tpch_q2_corr_min",
    # round-2 TPC-H completions: pure scan-agg, widest join tree,
    # fact⋈fact top-k, HAVING-vs-global-scalar, clustered semantic dedup
    "q69_tpch_q6_forecast",
    "q68_tpch_q8_market_share",
    "q71_tpch_q10_returns",
    "q72_tpch_q11_important",
    "x26_dedup_semantic",
    # text-analysis battery over documents
    "x07_lang_id",
    "x08_quality_score",
    "x09_token_count",
    "x10_fingerprint",
    # multimodal plumbing (binary ingest + Arrow mapInPandas decode)
    "x11_multimodal_ingest",
    "x12_multimodal_decode",
    # curation hygiene (broadcast decontamination, repetition, PII)
    "x21_decontaminate",
    "x22_repetition_filter",
    "x23_pii_scrub",
    # chunking + packing (the training-stream last mile)
    "x24_chunk_documents",
    "x25_pack_documents",
    # the end-to-end curation flagship (lang → quality → dedup →
    # components → canonical → split; ~half its wall is the iterative
    # connected-components rounds)
    "x20_curation_pipeline",
    # round-3: recurring-crawl dedup, per-language quality bar, mix report,
    # verbatim-probe decontamination, mixture rebalancing
    "x29_incremental_dedup",
    "x30_quality_topq",
    "x31_source_mix",
    "x32_substring_decontam",
    "x33_mix_rebalance",
    "x34_unigram_logprob",
    "x35_normalized_dedup",
    "x36_passage_dedup",
    "x37_dedup_lsh_bucketed",
    # round-4: graded contamination, embedding quantization audit,
    # multi-epoch upsampling, cross-corpus novelty
    "x38_contamination_score",
    "x39_embedding_quantization",
    "x40_epoch_upsample",
    "x41_novelty_score",
    # round-4 part 2: heuristic rule gate, DSIR selection weights, PQ/ADC
    # compressed ANN, split-leakage guard, token-budget planning
    "x42_gopher_rules",
    "x43_dsir_weights",
    "x44_pq_adc",
    "x45_split_leakage",
    "x46_token_budget",
    "x47_ivfpq",
    "x48_temperature_mix",
    "x49_best_quality_canonical",
    "x50_source_overlap",
    "x51_cell_balance",
    "x52_dedup_trend",
    "x53_langid_confusion",
    "x54_fertility",
    "x55_data_card",
    # round-4 part 3: hot-domain cap, lexical retrieval, reproducible
    # epoch order, labeled-seed kNN voting
    "x56_source_cap",
    "x57_bm25",
    "x58_training_order",
    "x59_knn_classify",
    # round-4 part 4: order-sensitive LM fluency, JL dimensionality cut,
    # dedup-audit histogram (CC-backed; rides x49's pair-graph cost)
    "x60_bigram_logprob",
    "x61_jl_projection",
    "x62_cluster_size_histogram",
    # round-4 part 5: curriculum schedule, mutual-kNN mining, Rocchio
    "x63_curriculum_order",
    "x64_mutual_knn",
    "x65_nearest_centroid",
    # round-5: shared dedup-audit pass (ONE CC run for histogram +
    # canonical quality — the x49/x62 sharing item from the r04 verdict)
    "x66_dedup_audit",
    # round-5 part 2: corpus-profile family + dup-graph PageRank
    "x67_length_drift",
    "x68_embedding_dim_stats",
    "x69_vocab_growth",
    "x70_boilerplate_affixes",
    "x71_dupgraph_pagerank",
    "x72_source_attrition",
    "x73_pack_efficiency",
    "x74_quality_calibration",
    "x75_sketch_accuracy",
    "x76_decontam_scrub",
    # round-6: incremental near-dup dedup against a persisted sketch
    # store; per-source OOV/vocab-coverage audit
    "x77_incremental_near_dedup",
    "x78_vocab_coverage",
    "x79_ann_recall_audit",
    "x80_corpus_diff",
    "x81_heavy_hitters",
    "x82_containment_pairs",
    "x83_embedding_centroid_report",
    "q80_funnel_steps",
    "x84_weighted_reservoir",
    "x85_cell_balanced_sample",
    "x86_source_floor",
    "q81_lateral_chunk_udtf",
    "x87_group_sketch_overlap",
    "x88_eval_coverage",
    "x89_degree_histogram",
    "x90_threshold_sweep",
    "x91_quality_by_cluster_size",
    "q82_event_paths",
    "x92_syndication_matrix",
    "x93_neardup_blocklist_screen",
    "x94_source_turnover",
    "q83_cohort_retention",
    "q84_transition_entropy",
    "x95_pmi_collocations",
    # round-7 additions: exact distributed ranks (RFM), windowed
    # control-chart, vocab-folded BPE, signature-exact LSH sweep,
    # rank-trimmed robust mean, bounded-greedy MMR
    "q85_rfm_segments",
    "q86_daily_anomaly",
    "x99_bpe_merge_candidates",
    "x100_lsh_plan_sweep",
    "x101_trimmed_quality",
    "x102_mmr_diversify",
    "x103_pair_budget_estimate",
    "q87_disorder_profile",
    "q88_yoy_growth",
    "x104_centroid_drift",
    "x105_key_skew_audit",
    "x107_token_budget_curve",
    "q89_user_lifecycle",
    "q90_funnel_timing",
    "x108_eval_quota",
    "x109_kmv_distinct",
    "x110_triangle_census",
    "q91_certstream_decode",
    "x111_image_meta_roundtrip",
    "q92_pit_training_set",
    # round 8
    "x112_js_divergence",
    "x113_winnow_pair_screen",
    "x114_source_kl",
    "x115_sorted_neighborhood",
    "q93_purchase_attribution",
    "x116_quantile_norm",
    "x117_waterfill_budget",
    # round 9
    "x118_incremental_audit",
    "x119_snm_multikey",
    "x120_blocking_choice",
    "x121_cluster_split",
    # round 9 part 2
    "x122_moore_lewis",
    "x123_edit_verify",
    "x124_dup_spans",
    "x125_silhouette",
    "x127_hard_negatives",
    "x128_pack_purity",
    "x129_zipf_fit",
    "x130_robust_scale",
    "x132_distinct_ngrams",
    "x133_code_likeness",
    "x134_hill_tail_index",
    "x135_score_auc",
    "x136_top_p_tokens",
    "x137_ks_drift",
    "x138_embedding_spectrum",
    # round 10
    "x139_label_store_readback",
    "x140_run_blocking_handoff",
    "x141_auc_gate_readback",
    "x142_component_cohesion",
    "x143_good_turing",
    "x144_roc_points",
    "x145_winsorized_mean",
    "x146_source_gini",
    "x147_oov_rate",
    "x148_ivf_distortion",
    "x149_maintenance_policy",
    "x150_sigstore_readback",
    "x151_cluster_source_breadth",
    "x152_chunk_overlap_audit",
    "x153_ecdf_gate_readback",
    "x154_frame_sample",
    "x155_canonical_ownership",
    "q94_ewma_level",
    "x156_sentiment_profile",
    # round 11
    "x157_ann_choice",
    "x158_gt_gate_readback",
    "x159_gini_gate_readback",
    "x160_oov_gate_readback",
    "x161_wav_meta_roundtrip",
    "x162_mp4_meta_roundtrip",
    "x163_compacted_store_readback",
    "x164_committed_store_readback",
    "x165_ann_store_readback",
    "x166_ann_store_search",
    # round 12
    "x167_ann_search_stream",
    "x168_bpe_train",
    "x169_selective_compaction_readback",
    "x170_ann_selective_fold_readback",
    "x171_bpe_tokenize",
    "x172_bpe_fertility",
    "x173_bloom_decontam",
    "x174_sig_compaction_readback",
    "x175_pq_plan_sweep",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Per-query progress + the full per-query map are written to sidecar
    # files, NOT the process streams: the driver records only the last
    # ~2000 chars of combined output, and 90+ progress lines used to push
    # the summary line out of (or mid-stream into) that tail window
    # (round-5 verdict item 7). The captured tail must be all signal.
    here = os.path.dirname(os.path.abspath(__file__))
    log_path = os.path.join(here, "BENCH_LOG.txt")
    try:
        log_fh = open(log_path, "w")
    except OSError:
        log_fh = sys.stderr  # read-only checkout: fall back to stderr

    def progress(msg: str) -> None:
        print(msg, file=log_fh, flush=True)

    from go_fish_spark.queries import REGISTRY
    from go_fish_spark.session import get_spark

    spark = get_spark(app_name="go-fish-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM / codegen / parquet footer cache so timings measure
    # query execution, not session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from go_fish_spark.catalog import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()

    # Run-quality probe (round-9 verdict #7): SCALE.md documents a
    # same-day run where IDENTICAL code measured 2-3.5x slower from
    # transient host contention. A fixed data-independent job (shuffle +
    # agg over a generated range — no parquet, no session caches) is
    # timed immediately after warmup and again after the last query; a
    # first/last disagreement > 1.5x marks the whole artifact as
    # contended so the cross-round diff knows not to trust the run.
    def _quality_probe() -> float:
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr("id % 997 AS k").groupBy(
            "k"
        ).count().selectExpr("sum(count)").collect()
        return time.perf_counter() - t0

    _quality_probe()  # warm the probe's own codegen/JIT path, untimed
    probe_first = round(min(_quality_probe(), _quality_probe()), 3)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    reps_map: dict[str, list] = {}
    errors: dict[str, str] = {}
    family_of: dict[str, str] = {}
    for name in HEADLINE:
        qd = REGISTRY.get(name)
        if qd is None:
            continue
        # Fault-isolate each query: one analyzing-stage exception must not
        # zero the whole bench (round-2 postmortem — q22 killed the run).
        # The recorded number is the MEDIAN of SPARK_GRAFT_BENCH_REPS runs
        # — default 3 since round 4, so round-over-round deltas are robust
        # to single-run JVM/host noise (observed ±25% on untouched
        # queries). Set to 1 for a quick smoke timing.
        # Round-9 (r8 verdict #1): the artifact also carries per-query
        # COLD (first rep — pays any session-cache fit on first touch)
        # and WARM (fastest later rep — pure steady state) columns, so
        # the one-time shared-frame fitting cost is reconstructable from
        # the committed artifact instead of prose.
        # Round-11 variance floor (r10 verdict #7): entries whose median
        # exceeds 1 s get 5 reps instead of 3, and EVERY entry records
        # its per-rep wall array in BENCH_FULL.json (queries_reps) so
        # the cross-round diff can run a noise-aware separation test
        # instead of the fixed ±25-30% envelope that kept forcing
        # watch-list verdicts on mid-cost entries (x94/x47/x92 in r10).
        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
        reps_slow = max(
            reps, int(os.environ.get("SPARK_GRAFT_BENCH_REPS_SLOW", "5"))
        )
        fam = getattr(qd, "family", "query")
        # Protocol entries run ONE rep (r13 verdict Next #3): each rep
        # rebuilds a multi-batch store lifecycle from scratch, so the
        # 10-entry family was 52-75 s of every bench (reps=3) and the
        # dominant share of the ~45-min close — while its wall measures
        # protocol step count, not the engine, and is constant in
        # corpus size. Noise protection for the single rep comes from
        # the in-run rerun adjudication below plus gen_crossround's
        # separation test; SPARK_GRAFT_BENCH_REPS_PROTOCOL overrides.
        if fam == "protocol":
            reps = max(
                1,
                int(os.environ.get("SPARK_GRAFT_BENCH_REPS_PROTOCOL", "1")),
            )
        try:
            walls = []

            def _run_once() -> None:
                t0 = time.perf_counter()
                df = qd.fn(spark, sf_dir)
                nonlocal_n[0] = df.count()
                walls.append(time.perf_counter() - t0)

            nonlocal_n = [0]
            for _ in range(reps):
                _run_once()
            swalls = sorted(walls)
            # protocol-family entries (durable-store read-backs — r11
            # verdict #5) never escalate to slow reps: their wall is the
            # protocol's round-trip count, constant in corpus size, and
            # the 5-rep upgrade was making them an ever-growing share of
            # headline wall without measuring the engine
            if (
                fam != "protocol"
                and reps > 1
                and swalls[len(swalls) // 2] > 1.0
            ):
                for _ in range(reps_slow - reps):
                    _run_once()
            n = nonlocal_n[0]
            family_of[name] = fam
            cold[name] = round(walls[0], 3)
            if len(walls) > 1:
                warm[name] = round(min(walls[1:]), 3)
            reps_map[name] = [round(w, 3) for w in walls]
            swalls = sorted(walls)
            timings[name] = round(swalls[len(swalls) // 2], 3)
            progress(
                f"# {name}: {timings[name]:.3f}s "
                f"(cold {cold[name]:.3f}s, reps {len(walls)}) rows={n}"
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            progress(f"# {name}: ERROR {errors[name]}")
        from go_fish_spark.operators.dedup import release_caches

        release_caches()  # dedup ops pin signature caches; free between queries

    # In-run contention adjudication (r13 verdict Next #5): compare
    # each recorded median against the committed BENCH_FULL history in
    # the working tree (the previous round's artifact) and give
    # past-bar outliers one more chance inside this same session. The
    # extra wall also lands in queries_reps so the separation test
    # sees it.
    history: dict = {}
    try:
        with open(os.path.join(here, "BENCH_FULL.json")) as fh:
            history = json.load(fh).get("queries", {}) or {}
    except (OSError, ValueError):
        history = {}

    def _rerun_entry(name: str) -> float:
        qd = REGISTRY[name]
        t0 = time.perf_counter()
        qd.fn(spark, sf_dir).count()
        w = time.perf_counter() - t0
        reps_map.setdefault(name, []).append(round(w, 3))
        from go_fish_spark.operators.dedup import release_caches as _rc

        _rc()
        return w

    rerun_info = adjudicate_reruns(
        timings, history, _rerun_entry, progress
    )

    probe_last = round(min(_quality_probe(), _quality_probe()), 3)
    # Direction matters: a LAST probe slower than the first means the
    # host got busier while the queries ran (the r9 SCALE.md incident);
    # a faster last probe is benign long-run JIT/C2 compilation.
    ratio = round(probe_last / max(probe_first, 1e-9), 3)
    bench_quality = {
        "probe_first": probe_first,
        "probe_last": probe_last,
        "ratio": ratio,
        "status": "ok" if ratio <= 1.5 else "contended",
    }
    progress(f"# bench_quality: {json.dumps(bench_quality)}")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Family split (r11 verdict #5): the protocol entries (durable-store
    # read-backs) are reported beside the query headline, not inside it
    # opaquely — their wall measures persistence round-trips, the query
    # families' wall measures the engine. `value` stays the grand total
    # for cross-round continuity; the split makes it decomposable.
    families: dict[str, dict] = {}
    for nm, secs in timings.items():
        f = family_of.get(nm, "query")
        d = families.setdefault(f, {"n": 0, "total": 0.0, "cold": 0.0})
        d["n"] += 1
        d["total"] = round(d["total"] + secs, 3)
        # per-family COLD sum (first-rep walls): the session-cache fits
        # land here, so an amortized family is visible as cold ≫ total
        d["cold"] = round(d["cold"] + cold.get(nm, secs), 3)
    # Cold totals (r14 verdict "What's wrong" #1): the headline sums
    # per-entry MEDIANS, so one-time session-cache builds (shared pair
    # frames, model fits) land in rep 1 and vanish from it. The cold sum
    # — first-rep walls, which PAY every session build on first touch —
    # now travels in the one-line JSON beside the median total, so
    # amortized entries are driver-visible without BENCH_FULL.json.
    cold_total = round(sum(cold.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "families": families,
        "family_of": family_of,
        "cold_total": cold_total,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))),
        # first-rep / best-later-rep walls: cold−warm on the first
        # cache-consuming query ≈ the one-time session-cache fit
        "queries_cold": cold,
        "queries_warm": warm,
        # per-rep wall arrays (r10 verdict #7): medians > 1 s run 5
        # reps; gen_crossround's separation test reads these
        "queries_reps": reps_map,
        "bench_quality": bench_quality,
    }
    if rerun_info:
        # in-run adjudicated outliers (r13 Next #5): was/rerun/kept
        # walls vs the committed history each compared against
        out["rerun"] = rerun_info
    if errors:
        out["errors"] = errors
    # Top per-query movers vs the committed BENCH_FULL history (r14
    # verdict Next #2: PERF.per_query kept coming back empty because the
    # full 200-entry map physically cannot fit the driver's ~2000-char
    # stdout tail window — this compact {name: [now, prev]} slice of the
    # largest material deltas travels on the one line instead; the full
    # map stays in BENCH_FULL.json). Material = the gen_crossround
    # coarse bar (>30% AND >0.15 s), capped at 12 entries.
    movers = {
        n: (timings[n], history[n])
        for n in timings
        if n in history
        and history[n] > 0
        and abs(timings[n] - history[n]) > max(0.15, 0.3 * history[n])
    }
    out["per_query_delta"] = {
        n: [movers[n][0], movers[n][1]]
        for n in sorted(
            movers, key=lambda n: -abs(movers[n][0] - movers[n][1])
        )[:12]
    }
    # Truncation-proofing (round-4 postmortem: the driver keeps only the
    # last 2000 chars of output, and the 81-query JSON line overflowed
    # it, leaving BENCH_r04.json with parsed=null; round-5: progress
    # chatter still made the tail start mid-stream). Contract now:
    #   - the FULL object (complete per-query map) goes ONLY to
    #     BENCH_FULL.json; per-query progress goes ONLY to BENCH_LOG.txt;
    #   - the process streams carry exactly two short lines — a stderr
    #     pointer to the sidecars, and the stdout summary JSON line (the
    #     full object if it fits comfortably inside the tail window,
    #     else a compact summary). The captured tail is all signal.
    full_line = json.dumps(out)
    full_path = os.path.join(here, "BENCH_FULL.json")
    try:
        with open(full_path, "w") as fh:
            fh.write(full_line)
        progress(f"# full: {full_line}")
    except OSError:
        print(f"# full: {full_line}", file=sys.stderr)  # read-only checkout
    print("# per-query map: BENCH_FULL.json; progress: BENCH_LOG.txt", file=sys.stderr)
    if len(full_line) <= 1500:
        print(full_line)
    else:
        summary = {
            k: out[k] for k in ("metric", "value", "unit", "sf", "reps")
        }
        summary["n_queries"] = len(timings)
        summary["n_errors"] = len(errors)
        summary["quality"] = bench_quality["status"]
        summary["families"] = families
        summary["cold_total"] = cold_total
        summary["per_query_delta"] = out["per_query_delta"]
        summary["queries_file"] = "BENCH_FULL.json"
        print(json.dumps(summary))
    from go_fish_spark.session import sweep_tmp_stores

    # own dirs always; other app ids only after 15 min of stillness —
    # a CONCURRENT run's live entry touches its dir every few seconds,
    # so stale_s=0 here could delete it mid-scan
    sweep_tmp_stores(spark.sparkContext.applicationId, stale_s=900.0)
    spark.stop()


if __name__ == "__main__":
    main()
