"""Keyed parquet upsert — MERGE-style "newest row per key wins" into a
plain parquet table, batch and foreachBatch-streaming.

The reference's sinks are append-only (`output/file.go:31-54`); an upsert
sink is what a pipeline needs when the output is a keyed TABLE (latest
state per entity) rather than an event log. This is the parquet-native
emulation of `MERGE INTO`: a transactional table format (Delta/Iceberg)
is the production answer at 100 TB — the operator keeps that contract
visible in one place so swapping the backend is a one-function change.

100 TB design: with ``partition_col`` set, only the partitions PRESENT in
the update batch are rewritten (Spark's dynamic partition overwrite);
untouched partitions are never read or written — verified by test
(file mtimes). The constraint that makes this correct: a key's partition
value must be stable (else its old row survives in an untouched
partition). Unpartitioned tables rewrite fully on every upsert and are
only for small keyed outputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``path``: existing
    rows whose key appears in ``updates`` are replaced, new keys append.

    ``updates`` must be unique per key (enforce upstream with
    dropDuplicates/argmax); duplicate keys would all survive.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    exists = os.path.exists(path) and any(
        not n.startswith(("_", ".")) for n in os.listdir(path)
    )
    if not exists:
        w = updates.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(path)
        return

    existing = spark.read.parquet(path)
    if partition_col:
        # restrict the rewrite to partitions the batch touches; dynamic
        # overwrite then leaves every other partition's files in place.
        affected = updates.select(partition_col).distinct()
        survivors = existing.join(affected, partition_col, "left_semi").join(
            updates.select(*key_cols), key_cols, "left_anti"
        )
    else:
        survivors = existing.join(updates.select(*key_cols), key_cols, "left_anti")

    # Materialize BEFORE overwriting the files the plan reads from
    # (read-overwrite-same-path is undefined otherwise). localCheckpoint
    # severs lineage onto executor storage; a transactional format makes
    # this (and failure atomicity) unnecessary.
    merged = survivors.unionByName(updates).localCheckpoint(eager=True)

    w = merged.write.mode("overwrite")
    if partition_col:
        w = (
            w.option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
        )
    w.parquet(path)


def upsert_batch_writer(
    path: str, key_cols: list[str], partition_col: str | None = None
):
    """foreachBatch adapter: replay-safe keyed sink (re-delivering a batch
    re-asserts the same per-key rows — idempotent by construction)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet(
            batch_df.sparkSession, path, batch_df, key_cols, partition_col
        )

    return write
