"""As-of join and range join — operators Spark has no native form for
(the guide's "custom operators" category), built as compositions of
existing DataFrame ops so they stay JVM-side and scale.

**As-of join** (for each left row, the latest right row with
``right.time <= left.time`` on the same key) — the generalization of the
reference's KV enrichment (`cloudTrail_s2s_join.go:68-78,124-130`: writes
are the right stream, reads are the left). Implemented as the union-window
algorithm: tag both inputs, union, one window per key ordered by time, and
``last(right_value) IGNORE NULLS`` carries the most recent right row
forward onto each left row. ONE shuffle on the key — no per-key pandas, no
range explosion; at 100 TB this is a single sort-within-partition per key.

**Range join** (left value ∈ [lo, hi) bucket) — broadcast the bucket
table and join on the containment predicate; Spark plans it as a
BroadcastNestedLoopJoin over the tiny dim, which beats any shuffle-based
theta join while the bucket table is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tie_break: str,
) -> DataFrame:
    """For each left row: columns of the latest right row (by
    ``right_time``, tie-broken on ``tie_break``) with
    ``right_time <= left_time`` and the same ``key``. Right rows at the
    exact same instant as the left row are visible (<=, matching the KV
    semantics: a write processed before the read at the same timestamp).

    Returns all left columns plus ``value_cols`` (null when no prior
    right row exists — the KV-miss branch)."""
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_is_left"),
        F.col(left_time).alias("_t"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    rt = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in left.columns if c != key],
        F.col(key),
        F.lit(0).alias("_is_left"),
        F.col(right_time).alias("_t"),
        F.col(tie_break).cast("long").alias("_tb"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    merged = lt.unionByName(rt)
    # Right rows sort before left rows at the same _t (is_left ascending)
    # so a same-instant write is visible to the read.
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_is_left", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *merged.columns,
        *[
            F.last(F.when(F.col("_is_left") == 0, F.col(f"_r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
    )


def range_join(
    facts: DataFrame, buckets: DataFrame, value: Column, lo: str, hi: str
) -> DataFrame:
    """Join each fact row to the bucket whose [lo, hi) interval contains
    ``value``. Buckets are broadcast (dimension-sized by construction)."""
    return facts.join(
        F.broadcast(buckets), (value >= buckets[lo]) & (value < buckets[hi])
    )
