"""Aggregation operators.

Reference semantics reproduced:
  * keyed incremental count with first-event metadata — get-or-create an
    OutputEvent per principal, ``Occurrences++`` (`agg_rules/
    cloudTrail_agg.go:30-72`; golden: 3 events → Occurrences 3,
    `integration_test.go:324-337`). Batch form: ``groupBy(key).agg(count,
    min(ts), first(...))`` — Spark's partial aggregation does the map-side
    combine the reference's per-event BoltDB transaction can't.
  * global counter — `state/count.go:18-31`.
  * tumbling-window aggregation — the 1-second drain loop (`window.go:38-49`)
    becomes ``groupBy(window(event_time, interval))``: event-time instead of
    the reference's processing-time poller (deliberate upgrade, SURVEY §2.4).

Beyond the reference: rollup/cube grouping sets and approximate distinct
(HLL++) — at scale ``approx_count_distinct`` is one pass with bounded
memory vs an exact distinct's full shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keyed_count(df: DataFrame, key: str | Column, extra_aggs: list[Column] | None = None, count_alias: str = "occurrences") -> DataFrame:
    aggs = [F.count(F.lit(1)).alias(count_alias)] + list(extra_aggs or [])
    return df.groupBy(key).agg(*aggs)


def global_count(df: DataFrame, alias: str = "cnt") -> DataFrame:
    return df.agg(F.count(F.lit(1)).alias(alias))


def tumbling_window_count(df: DataFrame, time_col: str, interval: str, keys: list[str], count_alias: str = "occurrences") -> DataFrame:
    """Event-time tumbling window count. Works identically on batch and
    streaming DataFrames (streaming adds a watermark upstream)."""
    w = F.window(F.col(time_col), interval)
    return df.groupBy(w.alias("win"), *[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias(count_alias)
    )
