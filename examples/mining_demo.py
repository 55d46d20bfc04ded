#!/usr/bin/env python
"""Targeted-data mining demo: the retrieval/classification side of the
engine (x57/x59/x61/x64/x65 operators), composed the way a team mines a
large crawl for a specific domain with a small labeled seed set:

    BM25 topic gate (lexical recipe) ->
    frozen-stats form of the same gate (what a live stream would run) ->
    JL 64->16 projection (cheap distance space) ->
    per-label centroids fit on a labeled seed slice (Rocchio) ->
    every vector labeled by a pure expression ->
    mutual-kNN pairs in the projected space (near-dup candidates among
    the mined set)

Run:  python examples/mining_demo.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_fish_spark.catalog import table  # noqa: E402
from go_fish_spark.operators.retrieval import (  # noqa: E402
    bm25_score_with_stats,
    bm25_scores,
    fit_bm25_stats,
)
from go_fish_spark.operators.similarity import (  # noqa: E402
    fit_label_centroids,
    hyperplanes,
    jl_project_expr,
    mutual_knn_pairs,
    nearest_centroid_label,
)


def main() -> None:
    from go_fish_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="mining-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    terms = ["spark", "window", "hash", "merge"]

    # 1. lexical topic gate: score the corpus against the term recipe
    hits = bm25_scores(docs, "doc_id", "text", terms)
    print(f"BM25 gate: {hits.count()} docs match >=1 term")
    hits.orderBy(F.col("bm25").desc(), "doc_id").show(5)

    # 2. the same gate a live stream would run: stats frozen from history
    stats = fit_bm25_stats(docs, "text", terms)
    frozen = bm25_score_with_stats(docs, "doc_id", "text", stats, terms)
    assert frozen.count() == hits.count()  # bit-equal on the fit corpus
    print(f"frozen-stats form agrees: N={stats['N']} avgdl={stats['avgdl']:.2f}")

    # 3. cheap distance space: JL 64->16 (pure per-row map)
    planes = hyperplanes(64, 16, seed=7)
    proj = emb.select(
        "vec_id", "label", jl_project_expr("embedding", planes).alias("pv")
    )

    # 4. Rocchio: centroids from a labeled seed slice, applied everywhere
    seed_slice = proj.filter(F.col("vec_id") % 5 != 0)
    labels, cent = fit_label_centroids(seed_slice, "label", "pv", 16)
    labeled = proj.select(
        "vec_id", "label",
        nearest_centroid_label("pv", labels, cent).alias("label_pred"),
    )
    acc = labeled.agg(
        F.avg((F.col("label") == F.col("label_pred")).cast("double"))
    ).collect()[0][0]
    print(f"Rocchio in projected space: {len(labels)} labels, accuracy {acc:.3f}")

    # 5. near-dup candidates among the mined set: mutual kNN in the
    #    projected space (LSH arm — the scale path)
    pairs = mutual_knn_pairs(proj, "vec_id", "pv", k=5, method="lsh", dim=16)
    print(f"mutual-kNN candidate pairs: {pairs.count()}")
    pairs.orderBy(F.col("cos").desc()).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
