"""Stateful streaming operators — the reference's KV/Counter state programs
on Spark's keyed state store.

| reference | here |
|---|---|
| KVStore set/get (`state/kv.go:45-80`), BoltDB-persisted | per-key state in ``applyInPandasWithState``, checkpoint-persisted |
| s2s enrichment join (`s2s_rules/cloudTrail_s2s_join.go:68-78,124-130`) | ``s2s_enrichment_stream`` |
| keyed agg w/ drain (`agg_rules/cloudTrail_agg.go:30-96`) | ``windowed_count_stream`` (event-time window + watermark — the declared-interval upgrade over the 1 s processing-time poller, SURVEY §2.4) |
| Counter window read-and-reset (`state/count.go:18-31`) | ``global_count_stream`` (update mode) |
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output of the s2s enrichment: the event plus its resolved entity.
S2S_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("key", T.StringType()),
        T.StructField("entity", T.StringType()),
    ]
)

_S2S_STATE_SCHEMA = T.StructType([T.StructField("principal", T.StringType())])


def s2s_enrichment_stream(
    events: DataFrame,
    *,
    key_col: str = "key",
    kind_col: str = "event_type",
    write_kind: str,
    value_col: str,
    emit_kind: str,
    fallback_col: str,
) -> DataFrame:
    """Stream-to-stream enrichment with "latest write wins" keyed state.

    Semantics ≡ `cloudTrail_s2s_join.go`: an event of ``write_kind`` stores
    ``value_col`` under its key (`:68-78`, kv.Set(assumedRoleID →
    principal)); an event of ``emit_kind`` emits with the stored principal,
    or ``fallback_col`` on a state miss (`:124-130`). Rows are processed in
    (ts, event_id) order within each key, so replaying a batch gives the
    same answer as the record-at-a-time reference.

    Scale: state is partitioned by key across executors and persisted in
    the checkpoint — the distributed form of the single BoltDB file.
    """

    def proc(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        principal: str | None = state.get[0] if state.exists else None
        out: list[dict[str, Any]] = []
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        for row in rows.itertuples(index=False):
            kind = getattr(row, kind_col)
            if kind == write_kind:
                principal = getattr(row, value_col)
            elif kind == emit_kind:
                out.append(
                    {
                        "event_id": row.event_id,
                        "ts": row.ts,
                        "key": key[0],
                        "entity": principal
                        if principal is not None
                        else getattr(row, fallback_col),
                    }
                )
        if principal is not None:
            state.update((principal,))
        yield pd.DataFrame(out, columns=[f.name for f in S2S_OUTPUT_SCHEMA])

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        proc,
        outputStructType=S2S_OUTPUT_SCHEMA,
        stateStructType=_S2S_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_count_stream(
    events: DataFrame,
    time_col: str,
    interval: str,
    keys: list[str],
    watermark: str = "0 seconds",
    count_alias: str = "occurrences",
) -> DataFrame:
    """Keyed tumbling-window count ≡ the windowed agg drain
    (`agg_rules/cloudTrail_agg.go:30-96` + `window.go:38-49`): state
    accumulates per (window, key); the watermark closing a window is the
    declared-interval drain. Use output mode ``update`` to see per-batch
    increments (the reference's repeated emissions) or ``append`` for
    final-only."""
    withw = events.withWatermark(time_col, watermark)
    return withw.groupBy(
        F.window(F.col(time_col), interval).alias("win"), *[F.col(k) for k in keys]
    ).agg(F.count(F.lit(1)).alias(count_alias))


def global_count_stream(events: DataFrame) -> DataFrame:
    """≡ Counter.Increment + destructive Window() read (`state/count.go:
    18-31`): in update mode each micro-batch emits the running total; the
    delta between emissions is the reference's read-and-reset value."""
    return events.agg(F.count(F.lit(1)).alias("cnt"))
