"""Measure label-store read amplification before/after compaction — the
SCALE.md row the r10 verdict's Next #4 asks for ("measuring read
amplification before/after").

Builds a durable label store by draining the sf documents table through
``label_store_maintenance_stream`` in N micro-batches (each batch appends
one parquet file per touched shard — the sustained-append small-files
regime), then:

  * prices the store with ``compaction_plan`` (per-shard live-file
    counts → read_amp = mean files per non-empty shard),
  * times the reader of record (latest-wins read, full scan + a pruned
    single-id lookup) BEFORE compaction,
  * runs ``compact_label_store`` (generation write + atomic manifest
    repoint + prune),
  * re-prices and re-times AFTER, and asserts read-back parity.

Prints one markdown table row per phase plus a JSON line. Run:
  python scripts/compaction_thesis.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from go_fish_spark.session import get_spark
    from go_fish_spark.streaming import labelstore as ls
    from go_fish_spark.streaming.labelstore import (
        compact_label_store,
        compaction_plan,
        label_store_maintenance_stream,
        read_label_shard,
        read_label_store,
    )

    spark = get_spark(app_name="compaction-thesis")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="compaction_thesis_")
    src = os.path.join(work, "in")
    store = os.path.join(work, "store")
    cp = os.path.join(work, "cp")
    os.makedirs(src)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.select("doc_id", "text")
    probe_id = docs.selectExpr("min(doc_id) AS m").collect()[0]["m"]

    def drain() -> None:
        label_store_maintenance_stream(
            spark.readStream.schema("doc_id long, text string").parquet(src),
            store, cp, bands=32, threshold=0.3, portable=True, n_shards=16,
        ).awaitTermination(300)

    for b in range(n_batches):
        docs.filter(F.col("doc_id") % n_batches == b).write.mode(
            "append"
        ).parquet(src)
        drain()

    labels = os.path.join(store, "labels")

    def timed_reads() -> tuple[float, float, int]:
        t0 = time.perf_counter()
        n = read_label_store(spark, labels).count()
        full = time.perf_counter() - t0
        t0 = time.perf_counter()
        read_label_shard(spark, labels, probe_id, n_shards=16).collect()
        lookup = time.perf_counter() - t0
        return round(full, 3), round(lookup, 3), n

    before_plan = compaction_plan(labels, file_cutoff=4.0)
    before_rows = sorted(
        map(tuple, read_label_store(spark, labels).collect())
    )
    b_full, b_lookup, n_ids = timed_reads()
    b_full2, b_lookup2, _ = timed_reads()  # warm repeat

    t0 = time.perf_counter()
    n_compacted = compact_label_store(spark, labels, n_shards=16)
    compact_wall = round(time.perf_counter() - t0, 3)

    after_plan = compaction_plan(labels, file_cutoff=4.0)
    after_rows = sorted(
        map(tuple, read_label_store(spark, labels).collect())
    )
    a_full, a_lookup, _ = timed_reads()
    a_full2, a_lookup2, _ = timed_reads()

    assert after_rows == before_rows, "read-back parity broken"
    assert n_compacted == n_ids

    out = {
        "n_batches": n_batches,
        "n_ids": n_ids,
        "before": {
            "patch_files": before_plan["patch_files"],
            "read_amp": before_plan["read_amp"],
            "action": before_plan["action"],
            "full_read_s": min(b_full, b_full2),
            "id_lookup_s": min(b_lookup, b_lookup2),
        },
        "compact_wall_s": compact_wall,
        "after": {
            "gen_files": after_plan["gen_files"],
            "patch_files": after_plan["patch_files"],
            "read_amp": after_plan["read_amp"],
            "action": after_plan["action"],
            "full_read_s": min(a_full, a_full2),
            "id_lookup_s": min(a_lookup, a_lookup2),
        },
        "parity": "ok",
    }
    print("| phase | live files | read_amp | full read | id lookup |")
    print("|---|---|---|---|---|")
    print(
        f"| before ({n_batches} append batches) "
        f"| {before_plan['patch_files']} | {before_plan['read_amp']} "
        f"| {out['before']['full_read_s']} s "
        f"| {out['before']['id_lookup_s']} s |"
    )
    print(
        f"| after compaction ({compact_wall} s) "
        f"| {after_plan['gen_files'] + after_plan['patch_files']} "
        f"| {after_plan['read_amp']} "
        f"| {out['after']['full_read_s']} s "
        f"| {out['after']['id_lookup_s']} s |"
    )
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
