"""Join operators.

Reference semantics reproduced:
  * enrichment join with miss-fallback — the s2s KV lookup: on a key hit use
    the stored principal, on a miss fall back to the raw id
    (`s2s_rules/cloudTrail_s2s_join.go:124-130` — ``kv.Get`` then use raw
    ``PrincipalID`` if absent). Batch form: LEFT JOIN + ``coalesce``.

Beyond the reference (§2.6 gap): inner/semi/anti joins with explicit
broadcast of small build sides. At 100 TB the fact table never moves for a
broadcast join — only the dimension is shipped to every executor — while
semi/anti express EXISTS/NOT EXISTS without materializing the probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrichment_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Column,
    enriched: Column,
    fallback: Column,
    alias: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """LEFT JOIN + coalesce(enriched, fallback) ≡ KV lookup w/ miss fallback."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on, "left").withColumn(alias, F.coalesce(enriched, fallback))


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_anti")


def not_in(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """``left_key NOT IN (SELECT right_key FROM right)`` with EXACT SQL
    null semantics, as a SHUFFLE-CAPABLE plan — the engine default for
    NOT IN.

    Spark plans a literal NOT IN subquery as a null-aware anti join
    (NAAJ), which it supports ONLY as a broadcast hash join — at 100 TB a
    corpus-scale subquery side simply cannot run (q63 documents that
    wall). This rewrite decomposes the same semantics into operators that
    all shuffle:

    * the core is a plain LeftAnti against the subquery's DISTINCT
      non-null keys — shuffle-capable, AQE-eligible;
    * the null edge cases collapse into a 1-ROW aggregate of the subquery
      side (count + has-null), broadcast and cross-joined as a filter:
      - subquery EMPTY        → every left row qualifies (even null keys);
      - subquery has any NULL → NO row qualifies (NOT IN is never TRUE);
      - otherwise             → anti-join survivors with non-null keys.

    Truth table ≡ SQL NOT IN; asserted value-for-value against Spark's
    own NAAJ and a DuckDB oracle in tests (incl. the empty / NULL-bearing
    subquery corners). Plan guard: tests assert the LeftAnti is a plain
    (non-null-aware) join, i.e. not subject to the broadcast-only NAAJ
    restriction."""
    lk = F.col(left_key)
    keys = right.select(F.col(right_key).alias("_k"))
    nonnull = keys.where(F.col("_k").isNotNull()).distinct()
    anti = left.join(nonnull, lk == F.col("_k"), "left_anti")
    flags = F.broadcast(
        keys.agg(
            F.count(F.lit(1)).alias("_n_sub"),
            F.max(
                F.when(F.col("_k").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("_has_null"),
        )
    )
    return (
        anti.crossJoin(flags)
        .where(
            (F.col("_n_sub") == 0)
            | ((F.col("_has_null") == 0) & lk.isNotNull())
        )
        .drop("_n_sub", "_has_null")
    )
