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
