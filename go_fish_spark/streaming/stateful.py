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


def interval_enrich_stream(
    reads: DataFrame,
    writes: DataFrame,
    *,
    key_col: str = "key",
    read_ts_col: str = "ts",
    write_ts_col: str = "ts",
    value_col: str = "principal",
    fallback_col: str = "principal_id",
    max_age: str = "10 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """The NATIVE stream-stream arm of the s2s enrichment join: Spark's
    built-in watermarked interval join instead of per-key Python state —
    each read event pairs with every write for its key whose timestamp
    falls in ``[read_ts − max_age, read_ts]``; reads with no such write
    emit once with the fallback (left outer). Contrast
    :func:`s2s_enrichment_stream` (``cloudTrail_s2s_join.go`` semantics:
    LATEST write wins, unbounded age): the interval form is what the
    built-in join state can express — bounded-age matches, ALL of them —
    and stays entirely JVM-side; collapse to as-of (latest-only) with a
    per-(event) argmax at epoch close when needed (q31's batch shape).

    Runs unchanged on batch frames (``withWatermark`` is a no-op in
    batch — the parity test's oracle arm). In streaming BOTH sides carry
    the watermark; with the time-range condition Spark evicts join state
    older than ``max_age`` behind the watermark, so state is bounded by
    in-window rows per key, and unmatched reads emit exactly when the
    watermark passes their match window.

    Output: (event_id, ts, key, entity, write_ts — NULL on fallback).
    """
    r = reads.withWatermark(read_ts_col, watermark).alias("r")
    w = writes.withWatermark(write_ts_col, watermark).alias("w")
    cond = (
        (F.col(f"r.{key_col}") == F.col(f"w.{key_col}"))
        & (F.col(f"w.{write_ts_col}") <= F.col(f"r.{read_ts_col}"))
        & (
            F.col(f"w.{write_ts_col}")
            >= F.col(f"r.{read_ts_col}") - F.expr(f"INTERVAL {max_age}")
        )
    )
    return r.join(w, cond, "leftOuter").select(
        F.col("r.event_id").alias("event_id"),
        F.col(f"r.{read_ts_col}").alias("ts"),
        F.col(f"r.{key_col}").alias("key"),
        F.coalesce(
            F.col(f"w.{value_col}"), F.col(f"r.{fallback_col}")
        ).alias("entity"),
        F.col(f"w.{write_ts_col}").alias("write_ts"),
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


def dedup_within_watermark_stream(
    events: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """The NATIVE streaming arm of the reference's KV get-or-create
    dedup (`state/kv.go` pattern; batch = ``dropDuplicates`` / q23):
    Spark's ``dropDuplicatesWithinWatermark`` keeps the first arrival
    per key and — unlike a plain streaming ``dropDuplicates``, whose
    key state grows FOREVER — evicts each key's state once the
    watermark passes its event time plus the delay. That bounded-state
    contract is the only honest way to run dedup on an unbounded
    stream: duplicates separated by more than ``watermark`` in event
    time MAY both survive, by design; within it, exactly one does.

    On a batch frame this degrades to plain ``dropDuplicates(keys)``
    (the parity test's oracle arm, with full-row keys so survivor
    choice is deterministic)."""
    if events.isStreaming:
        return events.withWatermark(
            time_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def dedup_rate_streams(
    events: DataFrame,
    payload_col: str,
    time_col: str = "ts",
    interval: str = "1 hour",
    watermark: str = "0 seconds",
) -> tuple[DataFrame, DataFrame]:
    """Streaming arm of the x52 duplication-rate trend — the recurring-
    crawl health monitor, live. Streaming forbids both COUNT(DISTINCT)
    and chained aggregations, so the monitor splits into the two
    streaming-legal plans it is actually made of:

      * ``totals`` — watermarked windowed count (state ∝ open windows);
      * ``distincts`` — :func:`dedup_within_watermark_stream` keyed on
        (payload, window) followed by ONE windowed count (dedup is a
        stateful op, not an aggregation, so the chain is legal; its
        state is evicted behind the watermark).

    Join the two at read time on the window (``1 - d/n`` = dup rate) —
    the same two-monitor composition a metrics backend performs.
    Equals the batch per-window count/count-distinct exactly for data
    within the watermark (parity-tested).

    Returns (totals, distincts), each (win struct, count)."""
    w = events.withWatermark(time_col, watermark)
    win = F.window(F.col(time_col), interval)
    totals = w.groupBy(win.alias("win")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    # the window struct inherits the event-time marker; the raw time
    # column must go before the dedup or Spark rejects the plan with
    # "more than one event time column"
    deduped = (
        w.withColumn("_win", win)
        .drop(time_col)
        .dropDuplicatesWithinWatermark([payload_col, "_win"])
    )
    distincts = deduped.groupBy(F.col("_win").alias("win")).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    return totals, distincts


def combine_dedup_rate(totals: DataFrame, distincts: DataFrame) -> DataFrame:
    """Epoch-close combiner for :func:`dedup_rate_streams` output read
    back as batch frames: the x52 report shape (window_start, n_events,
    n_distinct, dup_rate round-6)."""
    return (
        totals.join(distincts, "win")
        .select(
            F.col("win.start").alias("window_start"),
            "n_events",
            "n_distinct",
            F.round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_events"),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("window_start")
    )


def has_transform_with_state() -> bool:
    """Capability check for Spark 4's StatefulProcessor API
    (``transformWithStateInPandas``) — gate callers and tests on this so
    the module still imports on older runtimes. Beyond the method itself,
    the TWS state-server worker needs ``google.protobuf`` at runtime (the
    query CRASHES mid-stream without it, it does not fail fast), so the
    check probes that import too."""
    from pyspark.sql.group import GroupedData

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False
    return True


def keyed_counter_tws_stream(
    events: DataFrame,
    key_col: str = "key",
    count_alias: str = "occurrences",
    drain_interval_ms: int | None = None,
) -> DataFrame:
    """Keyed running counter on ``transformWithStateInPandas`` — the
    Spark-4 StatefulProcessor upgrade of the ``applyInPandasWithState``
    runtime. Its TIMERS map even closer to the reference's
    drain-on-interval than watermark windows do: `window.go:38-49` polls
    every interval and drains (emit + reset) each keyed count, which is
    exactly a processing-time timer firing ``handleExpiredTimer``.

    Semantics: every micro-batch emits the running total per key
    (≡ the reference's repeated emissions, `state/count.go:18-31`); with
    ``drain_interval_ms`` set, a processing-time timer re-registered on
    every input batch drains the count — emit final, clear state — when
    it fires (read-and-reset, `cloudTrail_agg.go:77-96`). State lives in
    the checkpointed per-key store, partitioned across executors."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"{key_col} string, {count_alias} long"

    class _KeyedCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._cnt = handle.getValueState("cnt", "n long")

        def handleInputRows(self, key, rows, timer_values):
            n = sum(len(pdf) for pdf in rows)
            prev = self._cnt.get()[0] if self._cnt.exists() else 0
            total = prev + n
            self._cnt.update((total,))
            if drain_interval_ms is not None:
                # Re-register = delete-then-register: without the delete,
                # every input batch would stack one more timer on the key
                # and each expiry would fire its own drain — the
                # reference's poller (`window.go:38-49`) is ONE interval
                # per key, not one per batch.
                for ts in self._handle.listTimers():
                    self._handle.deleteTimer(
                        ts if isinstance(ts, int) else ts[0]
                    )
                self._handle.registerTimer(
                    timer_values.getCurrentProcessingTimeInMs()
                    + drain_interval_ms
                )
            yield pd.DataFrame({key_col: [key[0]], count_alias: [total]})

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            # The drain: emit the final count and reset — the destructive
            # interval read of the reference's poller.
            if self._cnt.exists():
                total = self._cnt.get()[0]
                self._cnt.clear()
                yield pd.DataFrame({key_col: [key[0]], count_alias: [total]})

        def close(self) -> None:
            pass

    return events.groupBy(F.col(key_col)).transformWithStateInPandas(
        statefulProcessor=_KeyedCounter(),
        outputStructType=out_schema,
        outputMode="update",
        timeMode="processingTime",
    )


def global_count_stream(events: DataFrame) -> DataFrame:
    """≡ Counter.Increment + destructive Window() read (`state/count.go:
    18-31`): in update mode each micro-batch emits the running total; the
    delta between emissions is the reference's read-and-reset value."""
    return events.agg(F.count(F.lit(1)).alias("cnt"))


#: Feature row emitted by :func:`pit_feature_stream` — the q92 feature
#: vector (labels are a batch concern; the stream maintains FEATURES).
PIT_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_before", T.LongType()),
        T.StructField("n_types_before", T.LongType()),
        T.StructField("recency_days", T.IntegerType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def pit_feature_stream(
    events: DataFrame,
    cutoff: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming arm of q92's point-in-time training-set construction
    (`queries/stateful.py`): incrementally maintain each user's feature
    vector as events arrive, under the CUTOFF DISCIPLINE — rows at or
    past ``cutoff`` are filtered BEFORE the stateful operator, so the
    features physically cannot read the label period (the live form of
    temporal-leakage protection; batch q92 enforces the same bound with
    a scan filter). After each micro-batch every touched user emits its
    CURRENT feature row; the latest emission per user is that user's
    point-in-time feature vector, and at end-of-stream it equals the
    batch computation row-for-row (parity test in test_streaming.py).

    Exactness across arms: ``total_value`` is maintained as an INTEGER
    count of 1e-12 units (the batch arm's round-12 → decimal(27,18)
    discipline — no float accumulation drift between one big batch and
    many small ones); ``n_types_before`` keeps the bounded distinct
    type-set in state; ``recency_days`` = days(cutoff_date − max event
    date).

    100 TB shape: state is keyed by user and partitioned across
    executors, checkpoint-persisted; each micro-batch does ONE keyed
    exchange of just that batch's rows. The type-set per user is
    bounded by the event-type vocabulary, and the emitted frame is one
    row per TOUCHED user per batch, not per event."""
    from datetime import date, datetime
    from decimal import ROUND_HALF_UP, Decimal

    cutoff_dt = datetime.fromisoformat(cutoff)
    cutoff_day: date = cutoff_dt.date()
    cols = [f.name for f in PIT_FEATURE_SCHEMA]

    def proc(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import json as _json

        st = _json.loads(state.get[0]) if state.exists else {
            "n": 0, "types": [], "max_day": None, "units": None,
        }
        types = set(st["types"])
        rows = pd.concat(list(pdfs))
        for row in rows.itertuples(index=False):
            st["n"] += 1
            # NULL types are ignored, matching the batch arm's
            # countDistinct (and keeping the sorted() serialization
            # total-ordered — None is not comparable to str)
            ty = getattr(row, type_col)
            if ty is not None and not pd.isna(ty):
                types.add(ty)
            d = getattr(row, ts_col).date().isoformat()
            if st["max_day"] is None or d > st["max_day"]:
                st["max_day"] = d
            v = getattr(row, value_col)
            if v is not None and not pd.isna(v):
                # round-12 → integer 1e-12 units: the batch arm's
                # decimal(27,18) sum, without float drift across batches.
                # units stays None until a non-null value arrives —
                # SQL SUM over all-NULL is NULL, not 0
                st["units"] = (st["units"] or 0) + int(
                    Decimal(repr(float(v))).quantize(
                        Decimal("1e-12"), rounding=ROUND_HALF_UP
                    ).scaleb(12)
                )
        st["types"] = sorted(types)
        state.update((_json.dumps(st),))
        recency = (cutoff_day - date.fromisoformat(st["max_day"])).days
        # Mirror the BATCH arm's rounding path EXACTLY: the batch sum is
        # decimal(27,18) → CAST AS DOUBLE → round(x, 6), and Spark's
        # round-on-double goes through BigDecimal.valueOf(double) — i.e.
        # Decimal(repr(x)) — before HALF_UP. Quantizing the exact decimal
        # directly can differ on half-ulp .5 boundaries at the 6th
        # decimal, so convert to float FIRST, then re-parse its repr.
        if st["units"] is not None:
            as_double = float(Decimal(st["units"]).scaleb(-12))
            total = float(
                Decimal(repr(as_double)).quantize(
                    Decimal("1e-6"), rounding=ROUND_HALF_UP
                )
            )
        else:
            total = None
        yield pd.DataFrame(
            [[key[0], st["n"], len(types), recency, total]], columns=cols
        )

    gated = events.filter(
        F.col(ts_col) < F.lit(cutoff).cast("timestamp")
    )
    return gated.groupBy(F.col(user_col)).applyInPandasWithState(
        proc,
        outputStructType=PIT_FEATURE_SCHEMA,
        stateStructType=T.StructType([T.StructField("json", T.StringType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
