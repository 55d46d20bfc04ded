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


#: Algebraic aggregate specs supported by :func:`salted_agg` —
#: (partial_fn, merge_fn): stage 1 computes partial_fn per (key, salt),
#: stage 2 merges partials per key. Only aggregates with an associative
#: merge belong here (avg must be decomposed into sum+count by the caller).
_SALTED_MERGE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation over a random salt for EXTREME key skew.

    ``aggs`` maps output alias → (kind, column) with kind in
    ``{count, sum, min, max}``. Stage 1 groups by (keys…, salt) so a hot
    key's rows spread over ``n_salt`` reducers; stage 2 merges the ≤n_salt
    partial rows per key — input size to the second shuffle is
    O(distinct_keys × n_salt), independent of row count.

    When to use: Spark's own partial aggregation (map-side combine)
    already handles MOST skew — each input partition emits one row per
    key before the shuffle — and AQE splits skewed JOIN partitions. The
    residual case is a low-cardinality groupBy where a single reducer
    must merge millions of map-side partials for one hot key AND the
    per-group combine is expensive (e.g. collect-like or high-cardinality
    distinct under the key). This operator exists for that case and as
    the documented pattern; results are bitwise-equal to the direct
    groupBy for algebraic aggregates (oracle-checked by q50).

    The salt is ``pmod(xxhash64(monotonically_increasing_id()), n_salt)``
    — spreading rows deterministically-per-run without requiring a
    natural secondary key; no output value depends on the salt.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    partials = []
    finals = []
    for alias, (kind, col) in aggs.items():
        try:
            partial_fn, merge_fn = _SALTED_MERGE[kind]
        except KeyError:
            raise ValueError(
                f"salted_agg supports {sorted(_SALTED_MERGE)}; got {kind!r}"
            ) from None
        c = F.col(col) if isinstance(col, str) else col
        partials.append(partial_fn(c).alias(f"_p_{alias}"))
        finals.append(merge_fn(f"_p_{alias}").alias(alias))
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salt_plan(
    df: DataFrame,
    keys: list[str],
    partial_budget: int = 1_000_000,
    max_salt: int = 64,
) -> dict:
    """Pre-flight salting decision for a keyed aggregation — the
    x89→auto-budget pattern (`graph.wedge_budget_plan`) applied to
    shuffle skew (r8 verdict Next #4): read the key histogram x105
    already prices (`profile.key_skew_audit` — same per-key count
    frame), and decide from the HOTTEST key whether the groupBy needs a
    salt stage at all, and how much.

    Decision rule: the hot key's rows all land on one reducer, so its
    group size IS that reducer's merge workload. If ``max_group ≤
    partial_budget`` the direct plan is fine (Spark's map-side combine
    + AQE handle the rest) → ``{"action": "direct", "n_salt": 1}``.
    Otherwise ``n_salt = min(max_salt, ceil(max_group /
    partial_budget))`` spreads the hot key until each (key, salt) cell
    fits the budget → ``{"action": "salt"}``. Also returned:
    ``max_group``, ``n_keys``, ``total_rows``, ``mean_group`` (rounded),
    ``budget``.

    100 TB shape: ONE key exchange with map-side combine to the
    distinct-key frame, then a single-row max/count/sum agg — strictly
    cheaper than the aggregation it prices; the collect is one row."""
    if partial_budget < 1:
        raise ValueError("partial_budget must be >= 1")
    per_key = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("_n")
    )
    row = per_key.agg(
        F.max("_n").alias("mx"),
        F.count(F.lit(1)).alias("nk"),
        F.sum("_n").alias("tot"),
    ).collect()[0]
    mx, nk, tot = row["mx"] or 0, row["nk"], row["tot"] or 0
    plan = {
        "max_group": mx,
        "n_keys": nk,
        "total_rows": tot,
        "mean_group": round(tot / nk, 1) if nk else 0.0,
        "budget": partial_budget,
    }
    if mx <= partial_budget:
        plan.update(action="direct", n_salt=1)
    else:
        plan.update(
            action="salt",
            n_salt=min(max_salt, -(-mx // partial_budget)),
        )
    return plan


def auto_salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    partial_budget: int = 1_000_000,
    max_salt: int = 64,
) -> DataFrame:
    """:func:`salted_agg` with the salt factor chosen by
    :func:`salt_plan` instead of handed in — and NO salt stage at all
    when the histogram says the direct plan is fine (the plan is then
    exactly the plain groupBy: same aggregates, one exchange). Results
    are bitwise-identical either way for the supported algebraic
    aggregates; only the physical shape adapts."""
    plan = salt_plan(df, keys, partial_budget, max_salt)
    if plan["action"] == "salt":
        return salted_agg(df, keys, aggs, n_salt=plan["n_salt"])
    finals = []
    for alias, (kind, col) in aggs.items():
        try:
            partial_fn, _ = _SALTED_MERGE[kind]
        except KeyError:
            raise ValueError(
                f"auto_salted_agg supports {sorted(_SALTED_MERGE)}; "
                f"got {kind!r}"
            ) from None
        c = F.col(col) if isinstance(col, str) else col
        finals.append(partial_fn(c).alias(alias))
    return df.groupBy(*keys).agg(*finals)
