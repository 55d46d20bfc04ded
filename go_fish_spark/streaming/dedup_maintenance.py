"""LIVE dedup-label maintenance — the round-9 incremental loop as a
streaming operator: a document stream maintains a persisted component-
LABEL table, each micro-batch folding its docs into the existing labels
via the delta probe + reduced-graph merge (`dedup.delta_minhash_pairs`
+ `audit.incremental_audit_merge`), with the signature store maintained
inline (the `streaming/sigstore` append discipline).

This is the reference's KV-state pattern (`state/kv.go:45-80` —
get-or-create, mutate, store back) applied to the dedup graph at table
grain: the label table is the KV store, each batch's merge is the
transaction, and the invariant maintained is `labels ≡ full CC
recompute over everything ingested so far` (parity-tested per batch in
tests/test_round9.py).

Why foreachBatch rather than applyInPandasWithState: component merging
is a GLOBAL operation (one batch doc can bridge two existing clusters),
so per-key state cannot express it — the correct streaming form is a
transactional table update per micro-batch, the same pattern the audit
sink uses for publishes (`sources/pyds.py`).

Crash/replay discipline (manifest-last, twice over):
  1. the batch's signatures are APPENDED to the store FIRST;
  2. the new label table version is written, and its manifest is
     repointed LAST.
A crash anywhere replays the batch against the PREVIOUS committed
labels. The fresh-set is derived from the LABEL table (ids not yet
labeled), so an already-applied batch is a no-op; a batch that crashed
between (1) and (2) re-runs with its sigs already in the store — the
probe excludes them (store is semi-joined to LABELED ids), and the
duplicate append is collapsed by the reader (identical rows).

100 TB shape: per batch, ONE map-only signature pass over just the
batch, band-bucket probes against the store (slim rows; bucketed store
⇒ zero-exchange on the stored side), CC on the reduced graph bounded
by |batch| + |touched components|, and a broadcast relabel join. The
label-table rewrite is the one full-table touch — at corpus scale it
becomes a partition-pruned MERGE INTO on the touched components
(Delta/Iceberg); the versioned parquet overwrite here is the sandbox
form of that operation.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import storekernel as _sk


def _current_version(table_dir: str) -> str | None:
    doc = _sk.read_json_if_exists(_os.path.join(table_dir, "_current.json"))
    return _os.path.join(table_dir, doc["version"]) if doc else None


def read_labels(spark, labels_dir: str) -> DataFrame | None:
    """The committed (id, component) label table, or None before the
    first batch."""
    p = _current_version(labels_dir)
    return spark.read.parquet(p) if p else None


def _commit_labels(df: DataFrame, labels_dir: str, batch_id: int) -> None:
    """Write the new label version, then repoint the manifest LAST via
    the kernel's atomic publish (a crash between the two leaves the
    previous version current)."""
    version = f"v{batch_id:08d}"
    df.write.mode("overwrite").parquet(_os.path.join(labels_dir, version))
    _sk.atomic_write_json(
        _os.path.join(labels_dir, "_current.json"), {"version": version}
    )


def dedup_maintenance_stream(
    docs_stream: DataFrame,
    labels_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    portable: bool = False,
    available_now: bool = True,
):
    """Start the maintenance loop (returns the StreamingQuery). Batch 0
    bootstraps the label table (within-batch LSH pairs + CC); later
    batches run the incremental path: store probe + reduced-graph
    merge. Read the result with :func:`read_labels`."""
    from ..operators.audit import incremental_audit_merge
    from ..operators.dedup import (
        delta_minhash_pairs,
        minhash_lsh_pairs,
        minhash_signature,
    )
    from ..operators.graph import connected_components

    spark = docs_stream.sparkSession
    sig_dir = _os.path.join(labels_dir, "_sigs")

    def process_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf = bdf.select(id_col, text_col).dropDuplicates([id_col])
        prev = read_labels(spark, labels_dir)
        if prev is not None:
            bdf = bdf.join(
                prev.select(F.col("id").alias(id_col)), id_col, "left_anti"
            )
        fresh = bdf.localCheckpoint()
        if fresh.rdd.isEmpty():
            return
        sig = minhash_signature(text_col, n_hashes, k, seed, portable)
        # (1) sigs first — replay-safe (see module docstring)
        fresh.select(F.col(id_col).alias("_id"), sig.alias("_sig")).write.mode(
            "append"
        ).parquet(sig_dir)
        if prev is None:
            pairs = minhash_lsh_pairs(
                fresh, id_col, text_col, n_hashes, bands, k, threshold,
                seed, portable,
            )
            labels = connected_components(
                fresh.select(id_col), pairs, id_col=id_col
            ).select("id", "component")
        else:
            # store = signatures of LABELED docs only (excludes any
            # orphan rows a crashed attempt appended for this batch)
            store = (
                spark.read.parquet(sig_dir)
                .dropDuplicates(["_id"])
                .join(
                    prev.select(F.col("id").alias("_id")), "_id",
                    "left_semi",
                )
            )
            dpairs = delta_minhash_pairs(
                fresh, store, id_col, text_col, n_hashes, bands, k,
                threshold, seed, portable,
            )
            labels = incremental_audit_merge(
                prev, fresh.select(id_col), dpairs, id_col=id_col
            )
        # (2) labels last — the commit point
        _commit_labels(labels, labels_dir, batch_id)

    writer = docs_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
