#!/usr/bin/env python
"""Durable ANN index demo — the round-11 production loop composed end
to end from its oracle-verified parts:

    plan  — `similarity.choose_ann` prices brute / LSH / IVF / IVF-PQ
            from corpus statistics under a recall contract and a
            search-FLOP budget (the x157 table) ->
    build — `streaming/annstore.ann_store_stream` ingests embedding
            batches into the cell-partitioned compressed inverted file
            (frozen model manifest + (id, cell, residual PQ codes));
            a restarted query on the same checkpoint appends exactly
            once, an edited vector supersedes (latest-wins) ->
    serve — `run_ann(..., store_dir=...)` routes the winning IVF-PQ
            discipline through `adc_search_store`: probed cell
            PARTITIONS only, ADC over stored codes, the realized-
            candidate guard derived from the store's own histogram
            (x165/x166 hash-verify both halves) ->
    drift — `ann_refit_plan` prices refit vs incremental from cell
            histograms; `refit_ann_store` commits generation N+1 with
            the manifest repointed LAST.

Run:  python examples/ann_index_demo.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_fish_spark.catalog import table  # noqa: E402
from go_fish_spark.operators import similarity as sim  # noqa: E402
from go_fish_spark.session import get_spark  # noqa: E402
from go_fish_spark.streaming import annstore  # noqa: E402

EMB_DIM = 64


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="ann-index-demo")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ann_index_demo_")
    store = os.path.join(work, "index")
    src = os.path.join(work, "in")
    cp = os.path.join(work, "cp")
    os.makedirs(src)
    try:
        emb = table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 5)

        # 1. PLAN: price the disciplines under a recall contract
        plan = sim.choose_ann(
            emb, queries, EMB_DIM, min_recall=0.8, flop_budget=500_000,
            measured_recall={"ivf_probe": 0.9, "ivfpq_adc": 0.85,
                             "lsh_buckets": 0.5},
        )
        costs = {n: d["cost"] for n, d in plan["disciplines"].items()}
        print(f"plan: action={plan['action']} chosen={plan['chosen']} "
              f"costs={costs}")

        # 2. BUILD: stream the corpus into the durable index (batch 0
        # fits + publishes the frozen model; each drain is a restart)
        for b in range(3):
            emb.filter(F.col("vec_id") % 3 == b).write.mode(
                "append"
            ).parquet(src)
            annstore.ann_store_stream(
                spark.readStream.schema(
                    f"vec_id long, embedding array<double>"
                ).parquet(src),
                store, cp, n_cells=16, m=4, ksub=16,
            ).awaitTermination(300)
        n_store = annstore.read_ann_store(spark, store).count()
        doc = annstore.load_ann_manifest(store)
        print(f"store: {n_store} coded vectors, gen {doc['gen']}, "
              f"model version {doc['version']}")

        # 3. SERVE from the store; assert ≡ the direct IVF-PQ search
        coarse, pq, _ = annstore.load_ann_model(store)
        served = sorted(
            map(
                tuple,
                annstore.adc_search_store(
                    spark, store, queries, k=10, n_probe=4
                ).collect(),
            )
        )
        direct = sorted(
            map(
                tuple,
                sim.ivfpq_topk_expr(
                    emb, queries, coarse, pq, k=10, n_probe=4
                ).collect(),
            )
        )
        assert served == direct, "store-served search diverged"
        print(f"serve: {len(served)} top-k rows from the store "
              f"== direct IVF-PQ search")

        # 3b. SERVE AS A STREAM (r12): the same queries through the
        # streaming search arm in two micro-batches, with the live
        # recall monitor ground-truthing a sample per batch; the
        # latest-wins read-back must equal the one-shot store search
        qsrc = os.path.join(work, "q")
        qout = os.path.join(work, "res")
        qcp = os.path.join(work, "qcp")
        os.makedirs(qsrc)
        recalls = []
        for pred in ("vec_id < 3", "vec_id >= 3"):
            queries.filter(pred).write.mode("append").parquet(qsrc)
            annstore.ann_search_stream(
                spark.readStream.schema(
                    "vec_id long, embedding array<double>"
                ).parquet(qsrc),
                store, qout, qcp, k=10, n_probe=4,
                on_batch=lambda i: recalls.append(i.get("recall_at_k")),
                recall_corpus=emb, recall_sample=3,
            ).awaitTermination(300)
        streamed = sorted(
            map(
                tuple,
                annstore.read_search_results(spark, qout).collect(),
            )
        )
        assert streamed == served, "streamed search diverged"
        print(f"stream-serve: {len(streamed)} rows over 2 query "
              f"batches == one-shot store search; live recall@10 per "
              f"batch = {recalls}")

        # 4. DRIFT: price refit on a stable batch vs a skewed one
        stable = annstore.ann_refit_plan(doc, doc["cell_mass"])
        skew = [0] * 16
        skew[0] = 1000
        drifted = annstore.ann_refit_plan(doc, skew)
        print(f"drift: stable batch -> {stable['action']} "
              f"(js={stable['js_divergence']}); skewed batch -> "
              f"{drifted['action']} (js={drifted['js_divergence']})")
        n = annstore.refit_ann_store(spark, store, emb)
        doc2 = annstore.load_ann_manifest(store)
        print(f"refit: re-encoded {n} vectors into gen {doc2['gen']} "
              f"(manifest repointed last)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
