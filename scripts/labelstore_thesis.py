#!/usr/bin/env python
"""Measure the durable label store's UPSERT discipline against the
full-table-rewrite alternative (r9 verdict Next #2's done-condition
evidence): ingest the corpus as K batches through
`label_store_maintenance_stream`'s per-batch logic and record, per
batch, the rows the sharded store APPENDED (bounded by |batch| +
|touched members|) versus the rows a versioned-overwrite commit (the
dedup_maintenance discipline) would have REWRITTEN (the whole table,
every batch). Results land in SCALE.md.

Run: python scripts/labelstore_thesis.py [--sf /root/testdata/sf0.01]
     [--batches 5] [--scale 1]
`--scale N` unions N salted copies of the corpus (the incremental_thesis
corpus recipe) so the history grows while the batch stays a constant
share.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_fish_spark.catalog import table  # noqa: E402
from go_fish_spark.operators.audit import incremental_audit_merge  # noqa: E402
from go_fish_spark.operators.dedup import (  # noqa: E402
    delta_minhash_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    release_caches,
)
from go_fish_spark.operators.graph import connected_components  # noqa: E402
from go_fish_spark.session import get_spark  # noqa: E402
from go_fish_spark.streaming.labelstore import (  # noqa: E402
    append_label_patch,
    read_label_store,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--scale", type=int, default=1)
    args = ap.parse_args()

    spark = get_spark(app_name="labelstore-thesis")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, args.sf, "documents").select("doc_id", "text")
    if args.scale > 1:
        parts = [docs]
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        for s in range(1, args.scale):
            parts.append(
                docs.select(
                    (F.col("doc_id") + s * n).alias("doc_id"),
                    F.concat(
                        F.lit(f"copy{s} "), F.col("text")
                    ).alias("text"),
                )
            )
        from functools import reduce

        docs = reduce(lambda a, b: a.unionByName(b), parts)
    docs = docs.localCheckpoint()
    total = docs.count()

    work = tempfile.mkdtemp(prefix="labelstore_thesis_")
    labels_path = os.path.join(work, "labels")
    sig_dir = os.path.join(work, "sigs")
    sig_kw = dict(n_hashes=64, k=3, seed=42, portable=True)
    kw = dict(n_hashes=64, bands=16, k=3, seed=42, portable=True)
    threshold = 0.3
    print(f"corpus: {total} docs, {args.batches} batches, scale x{args.scale}")
    print("batch | table size | appended (upsert) | rewrite would write | wall s")
    try:
        for b in range(args.batches):
            t0 = time.perf_counter()
            fresh = docs.filter(
                F.col("doc_id") % args.batches == b
            ).localCheckpoint()
            sig = minhash_signature("text", **sig_kw)
            fresh.select(
                F.col("doc_id").alias("_id"), sig.alias("_sig")
            ).write.mode("append").parquet(sig_dir)
            prev = read_label_store(spark, labels_path)
            if prev is None:
                patch = connected_components(
                    fresh.select("doc_id"),
                    minhash_lsh_pairs(
                        fresh, "doc_id", "text",
                        threshold=threshold, **kw,
                    ),
                    id_col="doc_id",
                ).select("id", "component")
            else:
                store = (
                    spark.read.parquet(sig_dir)
                    .dropDuplicates(["_id"])
                    .join(
                        prev.select(F.col("id").alias("_id")), "_id",
                        "left_semi",
                    )
                )
                dpairs = delta_minhash_pairs(
                    fresh, store, "doc_id", "text",
                    threshold=threshold, **kw,
                )
                patch = incremental_audit_merge(
                    prev, fresh.select(F.col("doc_id").alias("id")),
                    dpairs, id_col="id", emit="changed",
                )
            patch = patch.localCheckpoint()
            n_patch = patch.count()
            append_label_patch(patch, labels_path, b, n_shards=16)
            table_rows = read_label_store(spark, labels_path).count()
            wall = time.perf_counter() - t0
            print(
                f"{b:5d} | {table_rows:10d} | {n_patch:17d} | "
                f"{table_rows:19d} | {wall:6.1f}"
            )
            release_caches()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
