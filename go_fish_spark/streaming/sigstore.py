"""Durable, restart-surviving MinHash signature STORE with a streaming
maintenance arm — the production form of the session-shared signature
frame (r8 verdict Next #6: `queries/extensions/_shared.shared_doc_sigs`
models a table a pipeline writes once; this module WRITES it).

The x77 sketch-store discipline generalized: a recurring-crawl pipeline
runs `signature_store_stream` over its document stream; each micro-batch
hashes ONLY its own rows (one map-only pass — no shuffle) and appends
slim (id, _sig, _batch_id) rows to a parquet store. Every sketch
consumer (x87/x93/x94/x100, `incremental_near_dedup`,
`delta_minhash_pairs`) then reads the store instead of re-tokenizing the
corpus. Restart safety comes from the checkpointed source offsets; an
interrupted foreachBatch append can leave a duplicated batch on retry,
which the latest-wins reader collapses (same batch ⇒ identical rows).

Edited documents: re-appending an id supersedes it — the reader keeps
the row with the highest ``_batch_id`` per id (latest-wins), so the
store tracks the CURRENT corpus without rewrites (the x94
incremental-signature discipline made durable).

Reference anchor: the persisted-state pattern of `state/kv.go:45-80` /
`backend.go:64-188` applied to the sketch family (gap category —
SURVEY.md §2.6; the reference persists pipeline state, not artifacts).

100 TB shape: the store is ~0.5 KB/doc at 64 hashes (3 orders of
magnitude smaller than the text); maintenance is map-only per batch;
the latest-wins window partitions by id (per-key bounded, parallel);
bucketing the store by id makes every downstream probe zero-exchange on
the stored side (tests/test_bucketing.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import minhash_signature


def signature_store_stream(
    docs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    k: int = 3,
    seed: int = 42,
    portable: bool = False,
    extra_cols: tuple = (),
    available_now: bool = True,
):
    """Start the maintenance arm: per micro-batch, hash the batch's
    ``text_col`` into MinHash signatures (same params as
    :func:`~go_fish_spark.operators.dedup.sketch_store`, so the store is
    a drop-in ``store=`` hand-in) and append (id_col, *extra_cols, _sig,
    _batch_id) to the parquet store. Returns the started
    StreamingQuery. ``available_now=True`` drains what's available and
    stops — the recurring-crawl batch-ingest trigger; pass False for a
    continuous query."""
    proj = docs_stream.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        minhash_signature(text_col, n_hashes, k, seed, portable).alias(
            "_sig"
        ),
    )

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.withColumn("_batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(store_path)

    writer = proj.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_signature_store(
    spark, store_path: str, id_col: str = "doc_id"
) -> DataFrame:
    """Latest-wins view of the store: one (id_col, …, _sig) row per id —
    the row from the highest ``_batch_id`` (re-appended/edited docs
    supersede; a retried batch's duplicate rows are identical and
    collapse). Column ``_id`` alias matches the ``store=`` contract of
    :func:`~go_fish_spark.operators.dedup.incremental_near_dedup` /
    :func:`~go_fish_spark.operators.dedup.delta_minhash_pairs` via
    ``.withColumnRenamed``. Per-id window — bounded by each doc's
    version count, parallel across ids (storekernel.latest_wins, with
    the deterministic ``_sig`` tiebreak the r12 kernel consolidation
    gave every store: a lost-checkpoint batch-id collision can never
    pick a row by partition order)."""
    from . import storekernel as _sk

    df = spark.read.parquet(store_path)
    keep = [c for c in df.columns if c != "_batch_id"]
    return _sk.latest_wins(df, [id_col], [F.col("_sig").asc()], keep)
