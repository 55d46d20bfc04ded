#!/usr/bin/env python
"""Per-query CORE-COUNT scaling signal (r14 verdict Next #7).

At sf0.1 every entry is scheduling-overhead-bound — the r14 driver
measured 8 cores BEATING 32 — so the driver's scaling block cannot say
which operators parallelize. This script produces the missing signal:

1. replicate the sf0.1 tables 10x with key offsets into /tmp
   (scripts/scale_experiment.build_scaled, extended with the dimension
   tables it didn't copy), the same replica the r9 scale thesis used;
2. run a fixed entry subset ONCE per core count in a FRESH JVM each
   (master local[$cores] — the same knob bench.py honors), same
   methodology as bench.py (fn + count, entry-isolated, caches released
   between entries);
3. print the per-query ratio table for SCALE.md — ratio(8c/32c) >> 1
   means the entry parallelizes; ratio ~ 1 at 10x data is a genuine
   serial bottleneck worth a look, not sf0.1 noise.

Usage: python scripts/scaling_signal.py [--build-only] [--cores 8,32]
       python scripts/scaling_signal.py --child <cores> <sf_dir> <out>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# Entries worth a scaling read: every family with >=1 s committed wall
# plus the cheap-but-canonical shapes; protocol entries excluded (their
# wall is protocol step count, constant in corpus size — adjudicated in
# r13/r14).
SUBSET = [
    "q08_keyed_agg", "q21_s2s_asof_join", "q30_tpch_q1", "q33_tpch_q3",
    "q34_tpch_q5", "q62_tpch_q2_corr_min", "q68_tpch_q8_market_share",
    "q71_tpch_q10_returns", "q85_rfm_segments",
    "x01_dedup_exact", "x04_dedup_ngram_jaccard", "x18_dup_components",
    "x20_curation_pipeline", "x34_unigram_logprob", "x37_dedup_lsh_bucketed",
    "x47_ivfpq", "x50_source_overlap", "x66_dedup_audit",
    "x79_ann_recall_audit", "x82_containment_pairs", "x87_group_sketch_overlap",
    "x90_threshold_sweep", "x94_source_turnover", "x100_lsh_plan_sweep",
    "x118_incremental_audit", "x119_snm_multikey", "x138_embedding_spectrum",
    "x173_bloom_decontam",
]


def build_replica() -> str:
    from pyspark.sql import functions as F  # noqa: F401

    from go_fish_spark.catalog import table
    from go_fish_spark.session import get_spark
    from scripts.scale_experiment import BASE, build_scaled

    spark = get_spark(app_name="scaling-signal-build")
    spark.sparkContext.setLogLevel("ERROR")
    out = build_scaled(spark, 10)
    # dimension tables build_scaled leaves out but TPC-H entries join
    for name in ("part", "region", "supplier"):
        path = f"{out}/{name}.parquet"
        if not os.path.exists(path):
            table(spark, BASE, name).write.mode("overwrite").parquet(path)
    spark.stop()
    return out


def child(cores: int, sf_dir: str, out_path: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from go_fish_spark.queries import REGISTRY
    from go_fish_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-signal-{cores}c")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from go_fish_spark.catalog import TABLES, table

    for t in TABLES:
        try:
            table(spark, sf_dir, t).count()
        except Exception:
            pass
    res = {}
    for name in SUBSET:
        qd = REGISTRY.get(name)
        if qd is None:
            continue
        try:
            t0 = time.perf_counter()
            n = qd.fn(spark, sf_dir).count()
            res[name] = {"wall": round(time.perf_counter() - t0, 3), "rows": n}
        except Exception as exc:  # noqa: BLE001
            res[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"# {cores}c {name}: {res[name]}", flush=True)
        from go_fish_spark.operators.dedup import release_caches

        release_caches()
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    from go_fish_spark.session import sweep_tmp_stores

    sweep_tmp_stores(spark.sparkContext.applicationId, stale_s=900.0)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return
    cores = [32, 8]
    if "--cores" in sys.argv:
        cores = [
            int(c)
            for c in sys.argv[sys.argv.index("--cores") + 1].split(",")
        ]
    sf_dir = build_replica()
    print(f"replica at {sf_dir}")
    if "--build-only" in sys.argv:
        return
    outs = {}
    for c in cores:
        out = f"/tmp/scaling_signal_{c}c.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(c), sf_dir, out],
            check=True,
        )
        with open(out) as fh:
            outs[c] = json.load(fh)
    hi, lo = max(cores), min(cores)
    print(f"\n| entry | {lo}c wall | {hi}c wall | ratio {lo}c/{hi}c |")
    print("|---|---|---|---|")
    for name in SUBSET:
        a, b = outs.get(lo, {}).get(name), outs.get(hi, {}).get(name)
        if not a or not b or "wall" not in a or "wall" not in b:
            continue
        r = a["wall"] / b["wall"] if b["wall"] else float("inf")
        print(f"| {name} | {a['wall']} | {b['wall']} | {r:.2f} |")


if __name__ == "__main__":
    main()
