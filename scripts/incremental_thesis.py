#!/usr/bin/env python
"""Incremental-maintenance thesis experiment (round 9): at N×, compare

  * FULL   — re-derive component labels from scratch over the whole
             corpus (pair pass + connected components), and
  * INCR   — the steady-state maintenance step x118 models: today's
             batch probes the persisted signature store for its pairs
             and merges into yesterday's label table
             (delta_minhash_pairs + incremental_audit_merge).

The DELTA IS HELD CONSTANT across scales (the 1× corpus's
doc_id % 7 == 0 slice, ~714 docs — a crawl batch does not grow because
the archive did), while history grows with N — the full recompute must
pay for the archive every day, the incremental step only for the batch.
The store and yesterday's labels are FIT OUTSIDE the timed region —
they are persisted tables in production (streaming/sigstore.py,
streaming/dedup_maintenance.py). Usage:

  python scripts/incremental_thesis.py [N ...]   (default: 1 10 30)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_experiment import BASE, build_scaled  # noqa: E402


def main() -> None:
    import pyspark.sql.functions as F

    from go_fish_spark.catalog import table
    from go_fish_spark.operators import dedup
    from go_fish_spark.operators.audit import incremental_audit_merge
    from go_fish_spark.operators.graph import connected_components
    from go_fish_spark.session import get_spark

    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="incremental-thesis")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results = {}
    for n in ns:
        d = BASE if n == 1 else build_scaled(spark, n)
        docs = table(spark, d, "documents")
        # constant-size delta: the base corpus's % 7 slice (copy ids
        # are offset by >= 100k, so doc_id < 100k is exactly the 1x ids)
        is_new = (F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 100_000)
        hist, delta = docs.filter(~is_new), docs.filter(is_new)

        # -------- FULL recompute (timed) --------
        t0 = time.perf_counter()
        pairs_full = dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.35, portable=True
        )
        n_full = connected_components(
            docs.select("doc_id"), pairs_full, id_col="doc_id"
        ).count()
        t_full = time.perf_counter() - t0
        dedup.release_caches()

        # -------- fit the persisted inputs (NOT timed) --------
        store = dedup.sketch_store(
            hist, "doc_id", "text", portable=True
        ).persist()
        store.count()
        hist_pairs = dedup.minhash_lsh_pairs(
            hist, "doc_id", "text", threshold=0.35, portable=True,
            sigs=store,
        )
        labels = connected_components(
            hist.select("doc_id"), hist_pairs, id_col="doc_id"
        ).persist()
        labels.count()

        # -------- INCREMENTAL step (timed; full label-table emit) ----
        t0 = time.perf_counter()
        dpairs = dedup.delta_minhash_pairs(
            delta, store, "doc_id", "text", threshold=0.35, portable=True
        )
        n_incr = incremental_audit_merge(
            labels, delta.select("doc_id"), dpairs, id_col="doc_id"
        ).count()
        t_incr = time.perf_counter() - t0

        # -------- INCREMENTAL, changed-only emit (timed) --------------
        t0 = time.perf_counter()
        dpairs2 = dedup.delta_minhash_pairs(
            delta, store, "doc_id", "text", threshold=0.35, portable=True
        )
        n_changed = incremental_audit_merge(
            labels, delta.select("doc_id"), dpairs2, id_col="doc_id",
            emit="changed",
        ).count()
        t_changed = time.perf_counter() - t0

        store.unpersist()
        labels.unpersist()
        dedup.release_caches()
        results[f"x{n}"] = {
            "t_full_sec": round(t_full, 2),
            "t_incremental_sec": round(t_incr, 2),
            "speedup": round(t_full / t_incr, 1),
            "t_changed_emit_sec": round(t_changed, 2),
            "rows_full": n_full,
            "rows_incremental": n_incr,
            "rows_changed": n_changed,
        }
        print(f"x{n}: {results[f'x{n}']}", file=sys.stderr, flush=True)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
