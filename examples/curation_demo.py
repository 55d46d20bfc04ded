#!/usr/bin/env python
"""End-to-end curation demo over the synthetic documents/embeddings tables.

Shows the Python API for the full training-data flow — the same operators
the x-series registry entries expose, composed directly:

    mix report -> Gopher rule gate -> quality + language gates ->
    exact/normalized dedup -> near-dup clustering -> decontamination ->
    per-source cap -> per-language quality bar -> mixture rebalance ->
    chunk -> pack -> split -> epoch order -> sharded write (+ manifest)

Run:  python examples/curation_demo.py [sf_dir]   (default sf0.001)

Every step prints a one-line row count so the funnel is visible; the
result is a packed, split training stream as a DataFrame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_fish_spark.catalog import table  # noqa: E402
from go_fish_spark.functions import text as tx  # noqa: E402
from go_fish_spark.operators import decontam, dedup  # noqa: E402
from go_fish_spark.operators.chunking import chunk_documents, pack_documents  # noqa: E402
from go_fish_spark.operators.sampling import (  # noqa: E402
    global_hash_order,
    rebalance_mix,
    source_cap,
    split_assign,
    top_fraction_per_group,
)


def curate(spark, sf_dir: str, *, verbose: bool = True):
    def log(stage, df):
        if verbose:
            print(f"{stage:28s} {df.count():>8} rows")
        return df

    docs = log("load", table(spark, sf_dir, "documents"))

    # 1. what are we starting from? (per-source docs/tokens/dup-rate)
    if verbose:
        from go_fish_spark.queries import REGISTRY

        REGISTRY["x31_source_mix"].fn(spark, sf_dir).show(5, truncate=False)

    # 2. Gopher heuristic rule gate (x42) — drop structurally-broken docs
    #    before any scoring spends cycles on them
    gated = log("gopher rule gate", docs.filter(
        tx.gopher_keep(tx.gopher_flags(tx.gopher_metrics("text")))
    ))

    # 3. language + quality gates (pure column expressions)
    scored = gated.select(
        "doc_id", "text", "lang", "source",
        tx.lang_id("text").alias("lang_pred"),
        tx.quality_score("text").alias("score"),
    )
    #    the 0.5 bar is read off the token-budget curve (x107): each
    #    decile threshold is priced in TOKENS — the unit training
    #    budgets are written in — before committing
    if verbose:
        from go_fish_spark.queries import REGISTRY as _REG

        print("token-budget curve (what each quality bar costs):")
        _REG["x107_token_budget_curve"].fn(spark, sf_dir).show(10)
    kept = log("quality+lang gate", scored.filter(
        (F.col("lang_pred") == "en") & (F.col("score") >= 0.5)
    ))

    # 4. exact dedup (keep min doc_id per content digest)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = log("exact dedup", kept.withColumn(
        "_rn", F.row_number().over(w)
    ).filter(F.col("_rn") == 1).drop("_rn"))

    # 5. near-dup clustering via the SHARED audit pass (x66): pair graph
    #    + connected components computed ONCE, then (a) canonical
    #    selection and (b) the audit histogram both read the same
    #    materialized label frame — no second CC run for the report.
    #    The threshold itself comes from evidence, not folklore: the x90
    #    sweep shows the band structure (weak-overlap haze near 0, the
    #    near-dup spike at the top, and the gap between — the gap IS the
    #    threshold).
    if verbose:
        from go_fish_spark.operators.dedup import (
            jaccard_threshold_sweep,
            pair_budget_estimate,
        )

        # pre-flight (x103): price the pair join from the shingle-df
        # histogram BEFORE running it — the capacity check that decides
        # inverted-index vs prefix-filter (and whether to cap hot
        # shingles) on a corpus you haven't paid for yet
        print("pair-budget estimate (price the join first):")
        pair_budget_estimate(uniq, "doc_id", "text").show(8)
        print("jaccard threshold sweep (pick the bar in the gap):")
        jaccard_threshold_sweep(
            uniq, "doc_id", "text", band_width=0.1, min_jaccard=0.05
        ).show(12)
    from go_fish_spark.operators.audit import dedup_audit

    audit = dedup_audit(uniq, "doc_id", "text", tx.quality_score("text"))
    canon = log("near-dup canonical", uniq.join(
        audit.components, uniq["doc_id"] == audit.components["id"]
    ).filter(F.col("doc_id") == F.col("component")).drop("id", "component"))
    if verbose:
        print("dedup-audit cluster-size histogram (same CC pass):")
        audit.histogram.show(5)

    # 6. decontaminate against the (synthetic) benchmark slice
    is_eval = F.col("doc_id") % 97 == 0
    clean = log("decontaminated", decontam.decontaminate(
        canon.filter(~is_eval), docs.filter(is_eval), "doc_id", "text", k=3
    ))

    # 7. hot-domain cap (x56): no single source may contribute more than
    #    400 docs, however the gates fell
    capped = log("per-source cap", source_cap(clean, "source", "doc_id", cap=400))

    # 8. per-language quality bar, then rebalance sources to a uniform
    #    token budget
    topq = log("per-lang top 60%", top_fraction_per_group(
        capped, "lang_pred", "score", 0.6, "doc_id"
    ))
    sized = topq.withColumn("n_tok", F.size(tx.tokens("text")))
    balanced = log("mix rebalanced", rebalance_mix(
        sized, "doc_id", "source", "n_tok"
    ))

    # 9. chunk -> pack -> split: the training stream
    chunks = log("chunked", chunk_documents(
        balanced, "doc_id", "text", win=128, stride=112
    ))
    packed = log("packed", pack_documents(
        chunks.select(
            F.concat_ws("_", "doc_id", "chunk_id").alias("doc_id"),
            F.col("chunk").alias("text"),
        ),
        "doc_id", "text", capacity=2048, n_shards=8,
    ))
    split = packed.select(
        "*", split_assign("doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    )

    # 10. release profile (x67/x70): the distribution-level audits
    #     published next to the corpus — per-source length drift and
    #     shared-boilerplate affixes over the CURATED set
    if verbose:
        from go_fish_spark.operators.profile import (
            boilerplate_affixes,
            length_drift,
        )

        print("per-source length drift (KL vs corpus):")
        length_drift(balanced, "source", "text").orderBy(
            F.col("kl").desc()
        ).show(5)
        n_affix = boilerplate_affixes(
            balanced, "doc_id", "text", k=16, min_docs=2
        ).count()
        print(f"shared 16-char affixes across curated docs: {n_affix}")

        # round-6 audits: heavy-hitter tokens (x81 — MG candidates +
        # exact verify) and the recurring-crawl story (x77): persist the
        # curated set's MinHash sketch store and probe "tomorrow's
        # crawl" against it — history text is never re-read.
        from go_fish_spark.operators.dedup import (
            incremental_near_dedup,
            sketch_store,
        )
        from go_fish_spark.operators.profile import heavy_hitters

        print("heavy-hitter tokens (>1% of all occurrences):")
        heavy_hitters(balanced, "text", k=100).orderBy(
            F.col("n_occurrences").desc(), "token"
        ).show(5)
        store = sketch_store(balanced, "doc_id", "text")
        tomorrow = docs.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id", "text"
        )
        print("tomorrow's crawl vs today's sketch store (x77):")
        incremental_near_dedup(
            tomorrow, store, "doc_id", "text"
        ).groupBy("status").count().orderBy("status").show()

        # round-7 audits: robust per-source health (x101 — the trimmed
        # mean a few spam stubs can't drag) and the eval-slot plan
        # (x108 — Hamilton quotas over the CURATED strata, summing to
        # exactly the eval budget)
        from go_fish_spark.operators.profile import trimmed_group_mean
        from go_fish_spark.operators.sampling import quota_apportion

        print("per-source trimmed-mean quality (x101):")
        trimmed_group_mean(
            balanced, "source", F.col("score"), "doc_id"
        ).orderBy(F.col("trimmed_mean").desc()).show(5)
        print("eval-slot apportionment over curated strata (x108):")
        quota_apportion(balanced, ["lang_pred", "source"], k=50).orderBy(
            F.col("quota").desc(), "source"
        ).show(5)

    # 11. reproducible epoch order (x58): every packed row gets its exact
    #     position in the seeded global shuffle — the order the loader
    #     reads, re-derivable from ids alone
    return log("epoch-ordered", global_hash_order(split, "doc_id", seed="epoch0"))


def deliver(stream, out_path: str):
    """Last mile: land the split training stream as a sharded parquet
    corpus (one file per shard dir + per-shard manifest). The packed
    stream already carries its pack shard — n_shards=None reuses it, so
    the written directories correspond to the shards the pack offsets
    were computed within."""
    from go_fish_spark.sources import sharding

    return sharding.write_sharded(
        stream, out_path, "doc_id", n_shards=None, partition_cols=["split"]
    )


def main() -> None:
    from go_fish_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-demo")
    spark.sparkContext.setLogLevel("ERROR")
    out = curate(spark, sf_dir)
    print("final training stream:")
    out.show(5, truncate=60)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        manifest = deliver(out, f"{td}/corpus")
        print("shard manifest:")
        manifest.orderBy("split", "shard").show(10)
    spark.stop()


if __name__ == "__main__":
    main()
