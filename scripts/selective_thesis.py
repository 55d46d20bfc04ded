#!/usr/bin/env python
"""Measure the selective-compaction thesis (r11 verdict Next #1): when
only a few shards fragment, a selective fold should rewrite bytes
proportional to the HOT data while the full fold rewrites the whole
table. Carried files are hard links (st_nlink > 1 in the new
generation), so "bytes rewritten" is exactly the size of newly-written
(nlink == 1 at write time... measured here as non-carried) files.

Prints one JSON line per scenario for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def files_with_sizes(root):
    out = {}
    for dirpath, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                p = os.path.join(dirpath, f)
                out[p] = (os.path.getsize(p), os.stat(p).st_ino)
    return out


def main() -> None:
    from go_fish_spark.session import get_spark
    from go_fish_spark.streaming import labelstore as ls

    spark = get_spark(app_name="selective-thesis")
    spark.sparkContext.setLogLevel("ERROR")
    n_ids = int(os.environ.get("THESIS_N", "200000"))
    n_shards = 64
    n_hot = 3

    import hashlib

    def shard_of(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % n_shards

    hot_shards = list(range(n_hot))

    for mode in ("selective", "full"):
        base = tempfile.mkdtemp(prefix=f"gofish_selth_{mode}_")
        path = os.path.join(base, "labels")
        ids = spark.range(n_ids).selectExpr(
            "id", "id AS component"
        )
        ls.append_label_patch(ids, path, batch_id=0, n_shards=n_shards)
        ls.compact_label_store(spark, path, n_shards=n_shards)
        # churn: 4 batches rewriting only ids in the hot shards
        from pyspark.sql import functions as F

        from go_fish_spark.operators.sampling import hash_bucket

        hot_ids = (
            spark.range(n_ids)
            .withColumn("shard", hash_bucket("id", n_shards))
            .filter(F.col("shard").isin(hot_shards))
            .select("id")
        )
        for b in range(1, 5):
            ls.append_label_patch(
                hot_ids.selectExpr("id", f"id * 10 + {b} AS component"),
                path, batch_id=b, n_shards=n_shards,
            )
        plan = ls.compaction_plan(path, file_cutoff=2.0, min_patch_files=1)
        gen1 = ls._generation_path(path, 1)
        table_bytes = sum(s for s, _i in files_with_sizes(gen1).values())
        old_inodes = {i for _s, i in files_with_sizes(gen1).values()}
        shards_arg = (
            plan["shards_to_fold"] if mode == "selective" else None
        )
        import time

        t0 = time.perf_counter()
        n = ls.compact_label_store(
            spark, path, n_shards=n_shards, shards=shards_arg
        )
        wall = time.perf_counter() - t0
        gen2 = ls._generation_path(path, 2)
        new_files = files_with_sizes(gen2)
        rewritten = sum(
            s for s, i in new_files.values() if i not in old_inodes
        )
        carried = sum(s for s, i in new_files.values() if i in old_inodes)
        print(json.dumps({
            "mode": mode,
            "plan_scope": plan["fold_scope"],
            "shards_to_fold": plan["shards_to_fold"],
            "folded_rows": n,
            "table_bytes_gen1": table_bytes,
            "rewritten_bytes": rewritten,
            "carried_bytes": carried,
            "rewrite_frac": round(rewritten / max(table_bytes, 1), 4),
            "fold_wall_s": round(wall, 2),
        }))
        # read-back parity guard
        got = ls.read_label_store(spark, path)
        assert got.count() == n_ids
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
