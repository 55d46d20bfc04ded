"""Deterministic sampling & dataset splitting — training-data pipeline
operators (north-star extensions).

Splits must be (a) stable across runs/engines/cluster sizes, (b) a pure
function of the record key — never of partitioning or row order (Spark's
``df.sample`` is seed + partition-layout dependent, so identical data can
split differently after a repartition). The primitive here is an md5-based
hash bucket: md5 is available and bit-identical in both Spark and DuckDB,
so splits are oracle-checkable and reproducible anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex digits of
    the key, as an integer, mod n_buckets. Engine- and layout-invariant."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(n_buckets))


def duck_hash_bucket(key_expr: str, n_buckets: int = 100) -> str:
    """DuckDB mirror of :func:`hash_bucket`."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) AS UBIGINT)"
        f" % {n_buckets}"
    )


def split_assign(
    key: Column | str,
    fractions: dict[str, float],
    alias: str = "split",
) -> Column:
    """Assign each record to a named split by cumulative bucket ranges,
    e.g. {"train": 0.8, "val": 0.1, "test": 0.1} → buckets [0,80) /
    [80,90) / [90,100)."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(key, 100)
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + round(frac * 100)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return expr.otherwise(F.lit(list(fractions)[-1])).alias(alias)


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen purely by key hash (stable under
    repartitioning, unlike df.sample)."""
    return df.filter(hash_bucket(key, 10_000) < int(fraction * 10_000))


def hash_uniform(key: Column | str) -> Column:
    """Deterministic uniform in [0, 1): first 8 md5 hex digits / 2^32.
    Same recipe as :func:`hash_bucket` but continuous — the acceptance
    variate for weighted sampling. Engine- and layout-invariant."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
    return h / F.lit(float(2**32))


def duck_hash_uniform(key_expr: str) -> str:
    """DuckDB mirror of :func:`hash_uniform`."""
    return (
        f"CAST(CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))"
        f" AS UBIGINT) AS DOUBLE) / 4294967296.0"
    )


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    frac: float,
    tiebreak_col: str,
) -> DataFrame:
    """Keep the top ``frac`` of each group by ``order_col`` (descending) —
    per-language/per-source quality selection, the curation move of
    applying a SEPARATE quality bar to each stratum instead of one global
    cutoff (which would drown low-resource strata).

    Deterministic: ordering is (order_col DESC, tiebreak_col ASC), which
    is total when the tiebreak is unique; selection uses percent_rank —
    identical semantics in DuckDB, so the op is oracle-checkable.

    100 TB shape: one shuffle on the group key; within-group sort is the
    window sort. Group count is bounded (languages/sources), so per-group
    data is the skew consideration — for a very hot group this becomes
    the same single-partition-sort hazard as any global window; if a
    group outgrows an executor, switch to the two-pass approx-quantile
    cutoff (compute the per-group score threshold, then a pure filter)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).desc(), F.col(tiebreak_col).asc())
    )
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= frac)
        .drop("_pr")
    )


def group_quality_thresholds(
    df: DataFrame,
    group_col: str,
    order_col: str,
    frac: float,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group score CUTOFF equivalent to :func:`top_fraction_per_group`:
    the minimum ``order_col`` among each group's kept rows. Returns
    (group_col, _thr) — a bounded (one row per stratum) table.

    This is the streaming/two-pass form of the per-stratum quality bar:
    fit the cutoffs on a static/historical corpus (window sort there),
    broadcast them, and select from a live stream with the pure filter
    ``order_col >= _thr`` (:func:`apply_quality_thresholds`) — no window,
    no stream-side state. Equal to the window form whenever no tie
    straddles the boundary (the window breaks boundary ties by
    ``tiebreak_col``; a threshold filter keeps all of them)."""
    kept = top_fraction_per_group(df, group_col, order_col, frac, tiebreak_col)
    return kept.groupBy(group_col).agg(F.min(order_col).alias("_thr"))


def apply_quality_thresholds(
    df: DataFrame, group_col: str, order_col: str, thresholds: DataFrame
) -> DataFrame:
    """Pass 2 of the two-pass quality bar: broadcast the bounded cutoff
    table and keep rows scoring at or above their stratum's bar. Pure
    stream-static join + filter — works identically on batch and
    streaming DataFrames; groups absent from ``thresholds`` are dropped
    (inner join), matching 'no bar fit → no selection'."""
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(F.col(order_col) >= F.col("_thr"))
        .drop("_thr")
    )


def _repeat_factors(
    df: DataFrame,
    group_col: str,
    size_col: Column | str,
    target_shares: dict[str, float] | None,
    alias: str,
    cap_at_one: bool,
) -> DataFrame:
    """Shared pass 1 of rebalance/upsample: per-group
    ``target_tokens_g / actual_tokens_g`` from one groupBy on the BOUNDED
    group key — capped at 1 for down-only rebalancing, uncapped for
    epoch upsampling."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    totals = df.groupBy(group_col).agg(F.sum(size).alias("_tok"))
    from pyspark.sql import Window

    if target_shares is None:
        w = Window.partitionBy()
        target_tok = F.sum("_tok").over(w) / F.count(F.lit(1)).over(w)
    else:
        total = F.sum("_tok").over(Window.partitionBy())
        share = None
        for name, s in target_shares.items():
            lit = F.lit(float(s))
            share = (
                F.when(F.col(group_col) == name, lit)
                if share is None
                else share.when(F.col(group_col) == name, lit)
            )
        target_tok = total * share.otherwise(F.lit(0.0))
    rf = target_tok / F.col("_tok")
    if cap_at_one:
        rf = F.least(F.lit(1.0), rf)
    return totals.select(group_col, rf.alias(alias))


def group_rates(
    df: DataFrame,
    group_col: str,
    size_col: Column | str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Pass 1 of :func:`rebalance_mix`: per-group acceptance rates
    ``min(1, target_tokens_g / actual_tokens_g)`` from one groupBy on the
    BOUNDED group key. Split out so a STREAM can be rebalanced against
    rates fit on a static/historical corpus (:func:`apply_rates`)."""
    return _repeat_factors(
        df, group_col, size_col, target_shares, "_rate", cap_at_one=True
    )


def apply_rates(df: DataFrame, key: str, group_col: str, rates: DataFrame) -> DataFrame:
    """Pass 2 of :func:`rebalance_mix`: broadcast the bounded rates table
    and keep each row by its deterministic key-hash draw. Pure per-row
    filter — batch and streaming alike; the corpus never shuffles."""
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_uniform(key) < F.col("_rate"))
        .drop("_rate")
    )


def rebalance_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    size_col: Column | str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Downsample groups to a TARGET mixture — the data-budget move: given
    per-source token totals, compute each source's acceptance rate so the
    kept corpus approaches ``target_shares`` (default: uniform across
    groups), then keep each row by its key-hash (deterministic, layout/
    engine-invariant — same primitive as :func:`weighted_sample`).

    Rates are ``min(1, target_tokens_g / actual_tokens_g)`` — groups
    under their target are kept whole (no upsampling), oversized groups
    are thinned. Two-pass shape: pass 1 (:func:`group_rates`) is one
    groupBy on the BOUNDED group key (sources/languages — dozens, not
    billions) producing a rates table that broadcasts; pass 2
    (:func:`apply_rates`) is a pure per-row filter. The rebalance never
    shuffles the corpus — and because the passes are separable, a STREAM
    can be rebalanced against rates fit on static history."""
    return apply_rates(df, key, group_col, group_rates(df, group_col, size_col, target_shares))


def weighted_sample(
    df: DataFrame, key: str, weight: Column | str, scale: float = 1.0
) -> DataFrame:
    """Importance sampling: keep each row with probability
    ``clamp(scale * weight, 0, 1)``, decided purely by the row key's hash
    (quality-proportional corpus downsampling — the standard curation move
    of keeping high-quality documents at a higher rate).

    Unlike ``df.sample``, inclusion is a pure function of (key, weight):
    stable under repartitioning, re-runs, and engines (oracle-checkable).
    A pure per-row filter — pushes to the scan, zero shuffles, trivially
    100 TB-safe."""
    w = F.col(weight) if isinstance(weight, str) else weight
    return df.filter(hash_uniform(key) < F.least(w * scale, F.lit(1.0)))


def epoch_upsample(
    df: DataFrame,
    key: str,
    group_col: str,
    size_col: Column | str,
    target_shares: dict[str, float] | None = None,
    budget_factor: float = 1.0,
) -> DataFrame:
    """Mixture rebalancing WITH upsampling — the data-budget move
    :func:`rebalance_mix` can't make: when a group is UNDER its target
    share, repeat its documents across epochs instead of thinning the
    rest (the multi-epoch source weighting of LLaMA/Dolma-style data
    cards, where a small high-quality source runs 2–3 epochs).

    Per group, the repeat factor is ``rf = budget_factor ·
    target_tokens_g / actual_tokens_g`` (uncapped — <1 downsamples
    exactly like rebalance_mix, >1 upsamples). Each row gets
    ``floor(rf)`` guaranteed copies plus one more iff its deterministic
    key-hash draw falls under ``frac(rf)`` — so group totals hit the
    target in expectation while each row's copy count is a pure function
    of (key, rates): stable across runs, engines, and layout. Output is
    the input rows with an ``epoch`` column (1..n_copies; a row drawn to
    0 copies disappears).

    100 TB shape: pass 1 is the bounded-key groupBy (:func:`group_rates`
    without the cap); pass 2 broadcasts the rates and EXPLODES a
    1..n_copies sequence per row — map-only on the corpus, output size
    ≈ budget_factor × input. The explode multiplies rows, not documents:
    downstream packing/sharding sees epoch as an ordinary column."""
    rates = _repeat_factors(
        df, group_col, size_col, target_shares, "_rf", cap_at_one=False
    ).select(
        group_col, (F.lit(float(budget_factor)) * F.col("_rf")).alias("_rf")
    )
    n_copies = (
        F.floor(F.col("_rf")).cast("bigint")
        + (hash_uniform(key) < F.col("_rf") - F.floor(F.col("_rf"))).cast("bigint")
    )
    # sequence(1, n) DESCENDS for n < 1 — gate the empty case explicitly.
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1).cast("bigint"), n_copies)
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("epoch", F.explode(copies))
        .drop("_rf")
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    size_col: Column | str,
    tau: float = 0.7,
) -> DataFrame:
    """Temperature-scaled mixture rates (the multilingual sampling move of
    mBERT/XLM-R: target share ∝ p_g^τ, τ < 1 flattens the head so
    low-resource groups keep more mass; τ = 1 is the observed mix, τ = 0
    is uniform). Returns the bounded (group_col, _rate) table for
    :func:`apply_rates` — rates are ``min(1, target_tokens_g /
    actual_tokens_g)`` with ``target_g = total · tok_g^τ / Σ tok_g^τ``.

    The rate is rounded to 12 decimals before the acceptance compare:
    ``pow`` is libm-dependent (1-ulp divergence across engines), and an
    unrounded rate sitting exactly at a key's hash draw could flip that
    row's inclusion between engines. One bounded-key groupBy; the corpus
    never shuffles (same two-pass shape as :func:`rebalance_mix`)."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    totals = df.groupBy(group_col).agg(F.sum(size).alias("_tok"))
    from pyspark.sql import Window

    w = Window.partitionBy()
    p_tau = F.pow(F.col("_tok").cast("double"), F.lit(float(tau)))
    share = p_tau / F.sum(p_tau).over(w)
    target = F.sum("_tok").over(w) * share
    rate = F.round(F.least(F.lit(1.0), target / F.col("_tok")), 12)
    return totals.select(group_col, rate.alias("_rate"))


def temperature_sample(
    df: DataFrame,
    key: str,
    group_col: str,
    size_col: Column | str,
    tau: float = 0.7,
) -> DataFrame:
    """Downsample to the temperature-flattened mixture: fit
    :func:`temperature_rates` (bounded), broadcast, keep each row by its
    deterministic key-hash draw (:func:`apply_rates`)."""
    return apply_rates(
        df, key, group_col, temperature_rates(df, group_col, size_col, tau)
    )


def source_cap(
    df: DataFrame, key_col: str, id_col: str, cap: int
) -> DataFrame:
    """Cap any single key's contribution at ``cap`` rows — the per-domain
    cap every crawl-scale corpus applies so one hot site cannot dominate
    training (C4/RedPajama-style; the reference has no sampling family —
    gap category, SURVEY.md §2.6). Which rows survive is a pure function
    of the data: the ``cap`` smallest md5(id) values per key (ties to the
    lower id), so re-runs, engines, and layouts agree.

    100 TB shape — the window only ever sees over-cap keys: per-key
    counts are a bounded aggregate (map-side combined); keys at-or-under
    cap pass through via a BROADCAST anti-join (map-only, the corpus
    does not shuffle); only rows of over-cap keys — typically a small
    minority of a crawl — pay the rank shuffle, and each such key ranks
    in one task bounded by the hottest key's row count. (If a single key
    could exceed one task's memory, pre-prune by hash quantile before
    ranking; at web scale the hot-domain tail is millions of rows, well
    inside a task.)

    NULL keys are capped like any other key (round-5 ADVICE fix): the
    over/under split joins null-safely (``eqNullSafe``), so a NULL-keyed
    group exceeding cap ranks and truncates exactly as the oracle's
    ``PARTITION BY key`` does — plain equi-joins would let every
    NULL-keyed row bypass the cap."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    over_keys = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(F.col(key_col).alias("_over_k"))
    )
    on = F.col(key_col).eqNullSafe(F.col("_over_k"))
    under = df.join(F.broadcast(over_keys), on, "left_anti")
    over = df.join(F.broadcast(over_keys), on, "left_semi")
    okey = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(key_col).orderBy(okey, F.col(id_col))
    kept_over = (
        over.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under.unionByName(kept_over)


def hash_order_key(id_col: str, seed: str = "seed0") -> Column:
    """The seeded total-order SORT KEY of :func:`global_hash_order` as a
    pure per-row expression — the STREAMING arm of the ordering family.

    An exact 1..n ``position`` is a property of a CLOSED set: it is
    undefined while membership is still arriving, so no streaming
    operator can emit it without retracting on every insert. The
    micro-batch story is therefore a two-phase split (the fit/apply
    pattern of x30/x43/x56/x57, inverted): the STREAM attaches this
    deterministic key map-only (no shuffle, no state); the batch
    finalizer (:func:`global_hash_order`) ranks once the epoch's
    membership is frozen — and because the key is a pure function of
    (seed, id), ranking the streamed keys at epoch close reproduces the
    batch positions exactly (parity test in tests/test_streaming.py).

    NULL ids hash as the empty string, mirroring the batch form."""
    return F.md5(
        F.concat(
            F.lit(str(seed)),
            F.lit("|"),
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        )
    )


def curriculum_stage(score_col: str, n_stages: int = 5) -> Column:
    """The fixed-width quality-band STAGE of :func:`curriculum_order` as
    a pure per-row expression (streaming-safe; NULL score → last stage,
    as in the batch form). Stage + :func:`hash_order_key` are the
    stream-attachable half of the curriculum schedule; exact positions
    are the epoch-close batch finalization (see
    :func:`hash_order_key`)."""
    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")
    clamp = F.least(
        F.greatest(F.coalesce(F.col(score_col), F.lit(0.0)), F.lit(0.0)),
        F.lit(1.0),
    )
    return F.least(
        (F.floor((F.lit(1.0) - clamp) * F.lit(n_stages))).cast("int"),
        F.lit(n_stages - 1),
    )


def global_hash_order(
    df: DataFrame,
    id_col: str,
    seed: str = "seed0",
    n_buckets: int = 256,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Deterministic global training order: every row gets an exact
    1-based ``position`` in the total order md5(seed|id) (ties to the
    lower id) — the seeded global shuffle a training job applies so
    epoch order is reproducible AND independent of storage layout
    (a plain ORDER BY file-position bakes crawl locality into batches;
    a hash order is a measurably better shuffle and re-derivable from
    ids alone).

    100 TB shape — exact ranks WITHOUT a single-task global window: the
    first hash byte buckets rows into ``n_buckets`` ordered ranges (a
    prefix of the sort key, so bucket order ≡ key order); per-bucket
    counts (bounded, ≤ n_buckets rows) turn into broadcast cumulative
    offsets, and each bucket ranks independently in parallel —
    position = offset[bucket] + rank_within_bucket. This is the
    distributed-ranking shape of a TeraSort, expressed in two bounded
    aggregates + one partitioned window; md5 uniformity keeps every
    bucket at ~n/n_buckets rows (no skew by construction).

    NULL ids hash as the empty string (coalesce BEFORE md5) — a NULL key
    would otherwise null the bucket, silently drop the row at the offset
    join, and shift every position; with the coalesce the contract stays
    total: every input row gets a position, 1..n dense.

    PRECONDITION for a deterministic TOTAL order: ``id_col`` must be
    unique and non-NULL (the normal doc-id contract). Rows sharing an id
    (or all NULL) share both the hash key and the (id) tie-break, so
    their relative positions are layout-dependent. For degenerate id
    inputs pass ``tiebreak_col`` (e.g. a content digest): it is appended
    as the FINAL sort key, restoring totality whenever
    (id, tiebreak_col) is unique."""
    if not 1 <= n_buckets <= 256:
        raise ValueError("n_buckets must be in [1, 256] (one hash-byte prefix)")
    from pyspark.sql import Window

    tiebreak = [F.col(tiebreak_col)] if tiebreak_col else []
    key = hash_order_key(id_col, seed)
    # first-byte prefix, folded to n_buckets contiguous ranges so bucket
    # order stays consistent with full-key order
    bucket = F.floor(
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int")
        * F.lit(n_buckets) / F.lit(256)
    ).cast("int")
    dfk = df.withColumn("_okey", key).withColumn("_ob", bucket)
    counts = dfk.groupBy("_ob").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_ob").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_ob", "_off")
    w = Window.partitionBy("_ob").orderBy("_okey", F.col(id_col), *tiebreak)
    return (
        dfk.join(F.broadcast(offsets), "_ob")
        .withColumn(
            "position", (F.col("_off") + F.row_number().over(w)).cast("bigint")
        )
        .drop("_okey", "_ob", "_off")
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_stages: int = 5,
    seed: str = "seed0",
    n_buckets: int = 256,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Curriculum training order: documents grouped into quality STAGES
    (stage 0 = highest-score band first — the easy/clean-first schedule),
    hash-shuffled WITHIN each stage, with the exact global ``position``
    across the whole schedule. The published curriculum result (clean
    data early stabilizes training; in-stage order must still be a real
    shuffle or batches correlate with crawl locality).

    Stages are FIXED-WIDTH score bands (``stage = floor((1 − clamp(score))
    · n_stages)``), the scale-safe exact form: data-dependent deciles
    would need a global rank over a continuous key; fixed bands are a
    pure per-row map and remain a curriculum as long as the score is
    roughly calibrated (for a data-fit bar, feed the x30
    ``group_quality_thresholds`` output in as the score). Position uses
    the :func:`global_hash_order` distributed-rank shape, extended one
    level: per-(stage, hash-bucket) parallel windows + broadcast
    cumulative offsets over the bounded (stage, bucket) count frame — no
    single-task global window at any size.

    Output: all input columns + ``stage INT`` + ``position BIGINT``
    (1-based, dense across the full schedule).

    NULL handling keeps the contract total (no silent row loss): a NULL
    score lands in the LAST stage (an unscorable doc trains last, not
    never), and a NULL id hashes as the empty string — without these
    coalesces the NULL keys would null the (stage, bucket) join key,
    drop the rows, and shift every other position.

    Total-order PRECONDITION as :func:`global_hash_order`: unique
    non-NULL ids, or pass ``tiebreak_col`` (appended as the final sort
    key) for degenerate id inputs."""
    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")
    if not 1 <= n_buckets <= 256:
        raise ValueError("n_buckets must be in [1, 256]")
    from pyspark.sql import Window

    tiebreak = [F.col(tiebreak_col)] if tiebreak_col else []
    stage = curriculum_stage(score_col, n_stages)
    key = hash_order_key(id_col, seed)
    bucket = F.floor(
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int")
        * F.lit(n_buckets) / F.lit(256)
    ).cast("int")
    dfk = df.withColumn("stage", stage).withColumn("_okey", key).withColumn(
        "_ob", bucket
    )
    counts = dfk.groupBy("stage", "_ob").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("stage", "_ob").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("stage", "_ob", "_off")
    w = Window.partitionBy("stage", "_ob").orderBy(
        "_okey", F.col(id_col), *tiebreak
    )
    return (
        dfk.join(F.broadcast(offsets), ["stage", "_ob"])
        .withColumn(
            "position", (F.col("_off") + F.row_number().over(w)).cast("bigint")
        )
        .drop("_okey", "_ob", "_off")
    )


def value_bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list,
    out: str = "rank",
) -> DataFrame:
    """Exact dense global 1-based rank over an arbitrary total order —
    WITHOUT a single-task global window. The generalization of
    :func:`global_hash_order`'s distributed-rank shape to VALUE keys:
    ``bucket`` must be a monotone non-decreasing coarsening of the first
    order key (e.g. the integer key itself, or ``floor(key / width)``)
    with BOUNDED cardinality. Per-bucket counts (one bounded aggregate)
    become broadcast cumulative offsets; each bucket then ranks
    independently in parallel — rank = offset[bucket] + rank-in-bucket.

    ``order_cols`` must be a deterministic TOTAL order (append a unique
    id as the final key) or ranks of tied rows are layout-dependent.
    Unlike the hash instance, value buckets inherit the DATA's skew —
    a heavy bucket bounds parallelism, not correctness; pick the
    coarsening so the hottest bucket stays executor-sized.

    NULL bucket values (a NULL first sort key) form their own bucket
    and rank FIRST (Spark's asc-nulls-first default, matching the
    window's NULL placement) — the offset join is null-safe, so the
    contract stays total: every input row gets a rank, 1..n dense."""
    from pyspark.sql import Window

    dfk = df.withColumn("_vb", bucket)
    counts = dfk.groupBy("_vb").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_vb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select(F.col("_vb").alias("_vbo"), "_off")
    w = Window.partitionBy("_vb").orderBy(*order_cols)
    return (
        dfk.join(
            F.broadcast(offsets), F.col("_vb").eqNullSafe(F.col("_vbo"))
        )
        .withColumn(out, (F.col("_off") + F.row_number().over(w)).cast("bigint"))
        .drop("_vb", "_vbo", "_off")
    )


def grouped_value_bucketed_rank(
    df: DataFrame,
    group_col: str,
    bucket: Column,
    order_cols: list,
    out: str = "rank",
) -> DataFrame:
    """:func:`value_bucketed_rank` restarted at 1 inside every value of
    ``group_col`` — N independent rankings in ONE pipeline (one bounded
    count aggregate, one broadcast offsets frame, one rank window),
    instead of N chained full rank pipelines whose count side-branches
    each recompute everything below them (the pre-r14 q85 shape: three
    stacked pipelines planned 64 scans of the same table). ``bucket``
    must be, per group, a monotone non-decreasing coarsening of the
    first order key exactly as in :func:`value_bucketed_rank`;
    ``order_cols`` must be a deterministic total order within
    (group, bucket). Offsets accumulate per GROUP (the cumulative-count
    window partitions on the group), so each group's ranks are dense
    1..n_group."""
    from pyspark.sql import Window

    dfk = df.withColumn("_vb", bucket)
    counts = dfk.groupBy(group_col, "_vb").agg(F.count(F.lit(1)).alias("_n"))
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select(
        F.col(group_col).alias("_vbg"), F.col("_vb").alias("_vbo"), "_off"
    )
    w = Window.partitionBy(group_col, "_vb").orderBy(*order_cols)
    return (
        dfk.join(
            F.broadcast(offsets),
            F.col(group_col).eqNullSafe(F.col("_vbg"))
            & F.col("_vb").eqNullSafe(F.col("_vbo")),
        )
        .withColumn(out, (F.col("_off") + F.row_number().over(w)).cast("bigint"))
        .drop("_vb", "_vbg", "_vbo", "_off")
    )


def source_cap_thresholds(
    df: DataFrame, key_col: str, id_col: str, cap: int
) -> DataFrame:
    """Streaming arm of :func:`source_cap`, pass 1: from a STATIC/history
    corpus, compute each key's ADMISSION THRESHOLD — the cap-th smallest
    (md5(id), id) pair, as one sortable string ``md5hex|id`` (ids are
    zero-padded so lexicographic ≡ (hash, id) order). A live stream is
    then capped by a pure per-row comparison (:func:`apply_cap_thresholds`)
    — the fit-on-history / apply-on-stream split (x30/x43/x57 pattern).
    Keys at-or-under cap get no row (absent ⇒ admit everything).

    Applying the thresholds back to the history itself reproduces
    :func:`source_cap` exactly (the admitted set IS the cap smallest
    pairs); on new stream rows the cap is approximate by nature — a
    frozen threshold admits the stream's look-alikes of history's
    survivors, the deterministic analogue of admission sampling."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("_ok")
    return (
        df.select(F.col(key_col), _cap_sort_key(id_col).alias("_ok"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
        .filter((F.col("_rn") == cap) & (F.col("_n") > cap))
        .select(key_col, F.col("_ok").alias("threshold"))
    )


def _cap_sort_key(id_col: str) -> "Column":
    """``md5(id)|id`` with the id zero-padded to 20 digits (covers the
    full non-negative bigint range), so STRING order ≡ (hash, id) order."""
    return F.concat(
        F.md5(F.col(id_col).cast("string")),
        F.lit("|"),
        F.lpad(F.col(id_col).cast("string"), 20, "0"),
    )


def apply_cap_thresholds(
    df: DataFrame, thresholds: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """Pass 2, streaming-safe: admit a row iff its ``(md5(id), id)`` sort
    key is ≤ its key's frozen threshold (keys without a threshold admit
    everything). The threshold table is bounded (one row per over-cap
    key) and BROADCASTS; the data side stays map-only — works identically
    on batch and streaming frames (stream-static broadcast join). The
    lookup is null-safe (round-5 ADVICE fix): a NULL-keyed stream row
    matches the NULL-key threshold row instead of silently admitting
    everything."""
    t = F.broadcast(
        thresholds.select(
            F.col(key_col).alias("_tk"), F.col("threshold").alias("_th")
        )
    )
    return (
        df.join(t, df[key_col].eqNullSafe(t["_tk"]), "left")
        .filter(F.col("_th").isNull() | (_cap_sort_key(id_col) <= F.col("_th")))
        .drop("_tk", "_th")
    )


def weighted_reservoir(
    df: DataFrame,
    id_col: str,
    weight: Column | str,
    k: int,
    seed: str = "aes",
) -> DataFrame:
    """Weighted sample of EXACTLY k rows without replacement —
    Efraimidis–Spirakis A-ES with the repo's deterministic-uniform
    recipe: each row draws u = hash_uniform(seed ‖ id) and ranks by
    key = ln(max(u, 1e-12)) / w (the log form of u^(1/w) — same order,
    no pow); the k largest keys are the sample, P(selected) ∝ weight
    exactly as in the classic algorithm, but reproducible across
    engines, re-runs, and layouts because u is a pure function of
    (seed, id). Rows with weight ≤ 0 are excluded (they carry no
    sampling mass). Ties on the round-12 key break by id.

    Complements the existing samplers: x28's acceptance sampling yields
    a BINOMIAL-sized sample; this yields exactly k — the "pick the best
    k under a quality-weighted lottery" primitive used for eval-set
    carving and seed selection.

    100 TB shape: the key is a pure per-row expression (zero shuffles)
    and the top-k is a TakeOrdered distributed heap — never a global
    sort or single-task window.

    Output: the input row plus ``aes_key`` (round-12 DOUBLE), the k
    selected rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight) if isinstance(weight, str) else weight
    u = hash_uniform(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    key = F.round(F.log(F.greatest(u, F.lit(1e-12))) / w, 12)
    return (
        df.filter(w > 0)
        .withColumn("aes_key", key)
        .orderBy(F.col("aes_key").desc(), F.col(id_col))
        .limit(k)
    )


def duck_weighted_reservoir_sql(
    tbl: str, id_col: str, weight_expr: str, k: int, seed: str = "aes",
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`weighted_reservoir` — same uniform, same
    log-form key, same round-12/id tie order."""
    u = duck_hash_uniform(f"'{seed}' || CAST({id_col} AS VARCHAR)")
    return f"""
    SELECT {select_cols},
           round(ln(greatest({u}, 1e-12)) / ({weight_expr}), 12) AS aes_key
    FROM {tbl}
    WHERE ({weight_expr}) > 0
    ORDER BY aes_key DESC, {id_col}
    LIMIT {int(k)}
    """


def source_floor(
    df: DataFrame, group_col: str, min_docs: int
) -> DataFrame:
    """Long-tail suppression — the inverse of :func:`source_cap`: keep
    documents only from groups contributing at least ``min_docs`` of
    them. The curation rationale is k-anonymity-flavored: a source with
    a handful of documents is disproportionately identifying (and is
    where spam/SEO one-offs live), so release checklists drop the tail
    outright.

    100 TB shape: one bounded-key count, then a LEFT SEMI join of the
    corpus against the QUALIFYING keys — whose number is provably
    ≤ n/min_docs (each needs min_docs rows), so the higher the floor,
    the smaller and more broadcastable the key side; the long tail
    being suppressed never forms a join side at all."""
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    keep = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_docs)
        .select(group_col)
    )
    return df.join(keep, group_col, "left_semi")


def quota_apportion(
    df: DataFrame, strata_cols: list, k: int
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of a fixed budget of
    ``k`` slots across strata, proportional to stratum size — the exact
    integer answer to "spread 100 eval slots across lang × source
    fairly": base = floor(k·n/total) per cell, then the leftover slots
    go to the cells with the LARGEST integer remainders (k·n mod total;
    ties to the first stratum key order). Quota properties: sums to
    exactly k, each cell within 1 of its proportional share, and the
    whole computation is integer arithmetic — no float apportionment
    drift between engines. Precondition k ≤ total rows (else a
    degenerate cell could be asked for more rows than it has).

    Output: strata_cols + (n_docs BIGINT, quota INT); feed the quotas
    to the per-stratum deterministic selection (x16's md5-order) to
    materialize the sample.

    100 TB shape: ONE strata-keyed exchange with map-side combine to
    the bounded cell frame; the remainder ranking is a window over that
    ≤ |cells|-row frame; totals broadcast."""
    k = int(k)
    cells = df.groupBy(*[F.col(c) for c in strata_cols]).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = cells.groupBy().agg(F.sum("n_docs").alias("_tot"))
    c = cells.crossJoin(F.broadcast(tot)).select(
        *strata_cols,
        "n_docs",
        "_tot",
        F.expr(f"({k} * n_docs) div _tot").alias("_base"),
        F.expr(f"({k} * n_docs) % _tot").alias("_rem"),
    )
    from pyspark.sql import Window

    leftover = c.groupBy().agg(
        (F.lit(k) - F.sum("_base")).alias("_left")
    )
    w = Window.orderBy(F.col("_rem").desc(), *[F.col(s) for s in strata_cols])
    # enforce the documented k ≤ total precondition LAZILY (no extra
    # scan — the eager scalar check cost a full second strata pass):
    # every output row carries _tot, so the guard rides the same plan
    # and fires on first evaluation when violated.
    quota = F.col("_base") + F.when(
        F.col("_rk") <= F.col("_left"), 1
    ).otherwise(0)
    guarded = F.when(
        F.lit(k) > F.col("_tot"),
        F.raise_error(
            F.format_string(
                "quota_apportion: k=%s exceeds total rows=%s; a quota "
                "can then exceed its cell's population and the "
                "per-stratum selection cannot fill it",
                F.lit(str(k)),
                F.col("_tot").cast("string"),
            )
        ).cast("int"),
    ).otherwise(quota.cast("int"))
    return (
        c.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            *strata_cols,
            "n_docs",
            guarded.alias("quota"),
        )
        .orderBy(*strata_cols)
    )


def per_group_quantile_norm(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    keep_quantile: float = 0.8,
) -> DataFrame:
    """Per-group QUANTILE NORMALIZATION of a score — the fair
    cross-source thresholding primitive: a raw score cut ("keep score ≥
    s") lets verbose sources dominate because score DISTRIBUTIONS
    differ by source; normalizing each doc to its within-source
    percent-rank makes "keep the top 20% of EVERY source" a single
    global predicate. percent_rank = (rank−1)/(n−1) over the
    deterministic (score, id) total order — identical definition in
    Spark and DuckDB (single-row groups → 0.0 in both).

    Output: (id_col, group_col, score_col, pct_rank DOUBLE round-9,
    keep BOOLEAN) — keep ⇔ pct_rank ≥ ``keep_quantile``.

    100 TB shape: one window per GROUP partition (parallel across
    groups; work per task bounded by the largest group — for a
    monster-source corpus swap the window for
    :func:`value_bucketed_rank` per group, the q85 shape). No global
    window, no collect."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(score_col, id_col)
    pct = F.round(F.percent_rank().over(w), 9)
    return df.select(
        id_col,
        group_col,
        score_col,
        pct.alias("pct_rank"),
        (pct >= keep_quantile).alias("keep"),
    )


def duck_quantile_norm_sql(
    tbl: str,
    group_col: str,
    score_col: str,
    id_col: str,
    keep_quantile: float = 0.8,
) -> str:
    """DuckDB mirror of :func:`per_group_quantile_norm`. The
    percent_rank window is evaluated ONCE in the inner query and ``keep``
    derives from that single copy — no duplicated expression to drift."""
    return f"""
    SELECT {id_col}, {group_col}, {score_col}, pct_rank,
           pct_rank >= {keep_quantile} AS keep
    FROM (
      SELECT {id_col}, {group_col}, {score_col},
             round(percent_rank() OVER (
               PARTITION BY {group_col} ORDER BY {score_col}, {id_col}
             ), 9) AS pct_rank
      FROM {tbl}
    )
    ORDER BY {id_col}
    """


def waterfill_allocation(
    df: DataFrame, group_col: str, weight_col: str, budget: int
) -> DataFrame:
    """Max-min fair WATER-FILLING of an integer budget across groups,
    each capped by its own availability — the fairness DUAL of
    :func:`quota_apportion` (proportional) and the x48 temperature
    family: proportional allocation hands big sources big shares;
    water-filling EQUALIZES shares until a source runs out (small
    sources take everything they have; the level rises on whoever
    remains). The mixture answer to "give every source an equal voice
    up to its size".

    Exact integer construction over the capacity-ascending order
    (cap_k, group tie-break): k* = the largest k with
    prefix(k−1) + cap_k·(n−k+1) ≤ B (those k groups saturate),
    level = (B − prefix(k*)) div (n − k*), and the remainder goes +1
    each to the first (B − prefix(k*)) mod (n − k*) unsaturated groups
    in the same order — maximality of k* guarantees level+1 never
    exceeds an unsaturated cap. Σ allocated = min(B, Σ cap) exactly.

    Output: (group_col, available BIGINT, allocated BIGINT), ordered by
    group.

    100 TB shape: ONE group-keyed exchange with map-side combine to the
    bounded capacity frame; every window below runs on that ≤ |groups|
    frame (the x108 discipline), never on the corpus."""
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be >= 0")
    # FLOOR before the bigint cast: Spark's cast truncates toward zero
    # while DuckDB's rounds-to-nearest, so a bare cast diverges across
    # engines on fractional weight sums. floor() agrees in both engines
    # (the oracle mirror applies the same floor).
    caps = df.groupBy(group_col).agg(
        F.floor(F.sum(weight_col)).cast("bigint").alias("_cap")
    )
    wo = Window.orderBy("_cap", group_col)
    c = (
        caps.withColumn("_rn", F.row_number().over(wo))
        .withColumn(
            "_prefix",
            F.sum("_cap").over(
                wo.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    B = F.lit(int(budget))
    # group k saturates iff giving EVERYONE ≥ cap_k is affordable
    sat = (F.col("_prefix") - F.col("_cap")) + F.col("_cap") * (
        F.col("_n") - F.col("_rn") + 1
    ) <= B
    kstar = c.select(
        F.max(F.when(sat, F.col("_rn"))).alias("_k"),
        F.max(F.when(sat, F.col("_prefix"))).alias("_pk"),
    ).select(
        F.coalesce("_k", F.lit(0)).alias("_k"),
        F.coalesce("_pk", F.lit(0)).alias("_pk"),
    )
    j = c.crossJoin(F.broadcast(kstar))
    level = F.expr("(B_ - _pk) div (_n - _k)")
    rem = F.expr("(B_ - _pk) % (_n - _k)")
    alloc = (
        F.when(F.col("_rn") <= F.col("_k"), F.col("_cap"))
        .when(
            F.col("_rn") - F.col("_k") <= rem, level + 1
        )
        .otherwise(level)
    )
    return (
        j.withColumn("B_", B)
        .select(
            group_col,
            F.col("_cap").alias("available"),
            F.when(F.col("_n") == F.col("_k"), F.col("_cap"))
            .otherwise(alloc)
            .cast("bigint")
            .alias("allocated"),
        )
        .orderBy(group_col)
    )


def duck_waterfill_sql(
    tbl: str, group_col: str, weight_col: str, budget: int
) -> str:
    """DuckDB mirror of :func:`waterfill_allocation` — same ascending
    order, same k*/level/remainder integer arithmetic."""
    b = int(budget)
    return f"""
    WITH caps AS (
      SELECT {group_col} AS g,
             CAST(floor(sum({weight_col})) AS BIGINT) AS cap
      FROM {tbl} GROUP BY {group_col}
    ),
    c AS (
      SELECT g, cap,
             row_number() OVER (ORDER BY cap, g) AS rn,
             sum(cap) OVER (ORDER BY cap, g
                            ROWS UNBOUNDED PRECEDING) AS prefix,
             count(*) OVER () AS n
      FROM caps
    ),
    k AS (
      SELECT coalesce(max(CASE WHEN (prefix - cap) + cap * (n - rn + 1)
                                    <= {b} THEN rn END), 0) AS k,
             coalesce(max(CASE WHEN (prefix - cap) + cap * (n - rn + 1)
                                    <= {b} THEN prefix END), 0) AS pk
      FROM c
    )
    SELECT g AS {group_col}, cap AS available,
           CAST(CASE
             WHEN n = k THEN cap
             WHEN rn <= k THEN cap
             WHEN rn - k <= ({b} - pk) % (n - k)
               THEN ({b} - pk) // (n - k) + 1
             ELSE ({b} - pk) // (n - k)
           END AS BIGINT) AS allocated
    FROM c CROSS JOIN k
    ORDER BY {group_col}
    """


def robust_scale(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group robust z-score: (value − median) / (1.4826 · MAD) —
    the outlier-immune alternative to mean/std standardization
    (Hampel 1974; 1.4826 makes MAD consistent with σ under normality)
    and the rank-free sibling of x116's quantile normalization: x116
    forces a target distribution, this preserves shape while making
    quality scores comparable ACROSS sources whose scales drift (the
    cross-source threshold problem x28-style filters hit).

    Output: (id_col, group_col, value, med, mad, robust_z) — robust_z
    NULL where MAD = 0 (constant group: no scale to normalize by;
    callers treat those as pass-through). Doubles round-9.

    Cross-engine: both medians are Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` (exact interpolated — the q42-established
    equivalence); deviations and the final division are IEEE-identical
    on both engines, rounded 9 at the edge.

    100 TB shape: two bounded ≤|groups| aggregations (median, then MAD
    of broadcast-joined deviations) + a map-only scoring pass — no
    per-group windows, no global sort. Spark's exact percentile
    collects each group's values onto one reducer: at extreme group
    sizes swap in approx_percentile(·, ·, accuracy) and accept the
    documented error bound."""
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    dev = df.join(
        F.broadcast(med), F.col(group_col) == F.col("_g")
    ).withColumn("_dev", F.abs(v - F.col("med")))
    mad = dev.groupBy("_g").agg(
        F.percentile(F.col("_dev"), F.lit(0.5)).alias("mad")
    )
    z = F.when(
        F.col("mad") > 0,
        F.round((v - F.col("med")) / (F.lit(1.4826) * F.col("mad")), 9),
    )
    return (
        dev.drop("_g")
        .join(F.broadcast(mad), F.col(group_col) == F.col("_g"))
        .select(
            F.col(id_col),
            F.col(group_col),
            v.alias("value"),
            F.round("med", 9).alias("med"),
            F.round("mad", 9).alias("mad"),
            z.alias("robust_z"),
        )
        .orderBy(id_col)
    )


def duck_robust_scale_sql(
    tbl: str, group_col: str, id_col: str, value_col: str
) -> str:
    """DuckDB mirror of :func:`robust_scale` — quantile_cont medians,
    same deviation/scale arithmetic and NULL-on-zero-MAD rule."""
    return f"""
    WITH med AS (
      SELECT {group_col} AS _g,
             quantile_cont(CAST({value_col} AS DOUBLE), 0.5) AS med
      FROM {tbl} GROUP BY _g
    ),
    dev AS (
      SELECT t.{id_col}, t.{group_col},
             CAST(t.{value_col} AS DOUBLE) AS value, m.med,
             abs(CAST(t.{value_col} AS DOUBLE) - m.med) AS _dev
      FROM {tbl} t JOIN med m ON t.{group_col} = m._g
    ),
    mad AS (
      SELECT {group_col} AS _g, quantile_cont(_dev, 0.5) AS mad
      FROM dev GROUP BY _g
    )
    SELECT d.{id_col}, d.{group_col}, d.value,
           round(d.med, 9) AS med,
           round(m.mad, 9) AS mad,
           CASE WHEN m.mad > 0
                THEN round((d.value - d.med) / (1.4826 * m.mad), 9)
           END AS robust_z
    FROM dev d JOIN mad m ON d.{group_col} = m._g
    ORDER BY d.{id_col}
    """


def robust_scale_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Fit arm of :func:`robust_scale` (the x30/x43/x57
    fit-on-history / apply-on-stream split): per-group (med, mad) from
    a STATIC/history corpus as a slim ≤|groups| frame a live stream
    broadcasts. Same two percentile aggregations as the batch op."""
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    return (
        df.join(F.broadcast(med), F.col(group_col) == F.col("_g"))
        .groupBy("_g")
        .agg(
            F.first("med").alias("med"),
            F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad"),
        )
        .select(F.col("_g").alias(group_col), "med", "mad")
    )


def apply_robust_scale(
    df: DataFrame,
    stats: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Apply arm: score rows (batch OR stream — a broadcast join plus
    pure per-row arithmetic, streaming-safe with no state) against
    frozen (med, mad) stats. On the fitting corpus itself this
    reproduces :func:`robust_scale` exactly (parity-tested); on a live
    stream the frozen stats are the standard approximation — rows of
    groups absent from the stats pass through with NULL z (no scale to
    judge them by). Output schema ≡ robust_scale."""
    v = F.col(value_col).cast("double")
    s = stats.select(
        F.col(group_col).alias("_g"),
        F.col("med").alias("_med"),
        F.col("mad").alias("_mad"),
    )
    z = F.when(
        F.col("_mad") > 0,
        F.round((v - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")), 9),
    )
    return (
        df.join(F.broadcast(s), df[group_col] == F.col("_g"), "left")
        .select(
            F.col(id_col),
            F.col(group_col),
            v.alias("value"),
            F.round("_med", 9).alias("med"),
            F.round("_mad", 9).alias("mad"),
            z.alias("robust_z"),
        )
    )


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_col,
    p: float = 0.05,
) -> DataFrame:
    """Per-group WINSORIZED mean: clamp values to the group's
    [p, 1−p] interpolated percentiles, then average — the
    outlier-resistant location estimate that (unlike x130's median)
    still moves with the bulk of the distribution, the standard
    robust summary for per-source quality dashboards where one
    pathological crawl page shouldn't swing the source's number.

    Output: (group_col, n, lo, hi, wmean) — lo/hi/wmean round-9.

    Cross-engine: both percentiles are Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` (the q42 equivalence); clamping is
    least/greatest over IEEE-identical doubles; the mean accumulates
    round-12 values as decimal(27,18) (the x125 discipline — Spark's
    double→decimal shortest-repr cast vs DuckDB's exact-binary cast
    only agree on values already rounded below the repr boundary).

    100 TB shape: one ≤|groups| percentile aggregation + a broadcast
    join + map-only clamping into a second ≤|groups| agg. Spark's
    exact percentile gathers each group's values on one reducer —
    swap in approx_percentile at extreme group sizes."""
    if not 0.0 <= p < 0.5:
        raise ValueError("p must be in [0, 0.5)")
    v = (
        F.col(value_col) if isinstance(value_col, str) else value_col
    ).cast("double")
    pct = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(v, F.lit(float(p))).alias("_lo"),
        F.percentile(v, F.lit(1.0 - float(p))).alias("_hi"),
    )
    clamped = df.join(
        F.broadcast(pct), F.col(group_col) == F.col("_g")
    ).withColumn("_w", F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
    agg = clamped.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("_lo").alias("_l"),
        F.first("_hi").alias("_h"),
        F.sum(F.round(F.col("_w"), 12).cast("decimal(27,18)")).alias("_s"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("bigint").alias("n"),
        F.round("_l", 9).alias("lo"),
        F.round("_h", 9).alias("hi"),
        F.round(
            F.col("_s").cast("double") / F.col("n").cast("double"), 9
        ).alias("wmean"),
    ).orderBy(group_col)


def duck_winsorized_mean_sql(
    table: str, group_col: str, value_sql: str, p: float = 0.05
) -> str:
    """DuckDB mirror of :func:`winsorized_mean` — quantile_cont
    percentiles, same clamp, same decimal-accumulated mean."""
    return f"""
    WITH pct AS (
      SELECT {group_col} AS _g,
             quantile_cont(CAST({value_sql} AS DOUBLE), {float(p)!r}) AS _lo,
             quantile_cont(CAST({value_sql} AS DOUBLE), {1.0 - float(p)!r})
               AS _hi
      FROM {table} GROUP BY _g
    ),
    clamped AS (
      SELECT t.{group_col} AS _g, p._lo, p._hi,
             least(greatest(CAST({value_sql} AS DOUBLE), p._lo), p._hi)
               AS _w
      FROM {table} t JOIN pct p ON t.{group_col} = p._g
    ),
    agg AS (
      SELECT _g, count(*) AS n, any_value(_lo) AS _l, any_value(_hi) AS _h,
             sum(CAST(round(_w, 12) AS DECIMAL(27,18))) AS _s
      FROM clamped GROUP BY _g
    )
    SELECT _g AS {group_col}, CAST(n AS BIGINT) AS n,
           round(_l, 9) AS lo, round(_h, 9) AS hi,
           round(CAST(_s AS DOUBLE) / CAST(n AS DOUBLE), 9) AS wmean
    FROM agg ORDER BY {group_col}
    """


def top_p_token_mass(
    df: DataFrame,
    group_col: str,
    score_col,
    id_col: str,
    text_col: str,
    p: float,
) -> DataFrame:
    """Per-group TOP-P selection by TOKEN MASS (the nucleus rule
    applied to curation budgets): order each group's documents by
    (score DESC, id) and keep the smallest prefix whose cumulative
    token count reaches ``p`` of the group's total — "the best docs
    covering 60% of every source's tokens". The budget-semantics
    sibling of x30 (which keeps a fraction of DOCS: a long-doc-heavy
    source blows a token budget under x30, never under this).

    keep ⇔ cum_before < p · total (the first doc crossing the target
    is INCLUDED — the standard nucleus convention, so the kept set
    always covers ≥ p of the mass; a group's single giant doc is kept
    whole). Output: (id_col, group_col, n_tokens, cum_tokens, keep),
    ordered by id.

    Cross-engine: token counts and cumulative sums are exact integers;
    the one comparison multiplies the same double ``p`` by the same
    BIGINT on both engines — IEEE-identical — and compares to an exact
    integer. No rounding discipline needed.

    100 TB shape: one (group, n_tokens) exchange; per-GROUP cumulative
    windows (parallel across groups — a single monster group routes
    through value_bucketed_rank as usual); totals broadcast from the
    ≤|groups| frame."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    from pyspark.sql import Window

    score = F.col(score_col) if isinstance(score_col, str) else score_col
    base = df.select(
        F.col(id_col),
        F.col(group_col).alias("_g"),
        score.alias("_sc"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy("_g")
        .orderBy(F.col("_sc").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = base.groupBy("_g").agg(F.sum("n_tokens").alias("_tot"))
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(tot), "_g")
        .select(
            F.col(id_col),
            F.col("_g").alias(group_col),
            "n_tokens",
            "cum_tokens",
            (
                (F.col("cum_tokens") - F.col("n_tokens")).cast("double")
                < F.lit(float(p)) * F.col("_tot").cast("double")
            ).alias("keep"),
        )
        .orderBy(id_col)
    )


def duck_top_p_token_mass_sql(
    tbl: str,
    group_col: str,
    score_sql: str,
    id_col: str,
    text_col: str,
    p: float,
) -> str:
    """DuckDB mirror of :func:`top_p_token_mass` — same order, integer
    cumulative sums, and the single IEEE comparison."""
    return f"""
    WITH base AS (
      SELECT {id_col}, {group_col} AS _g, {score_sql} AS _sc,
             CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS n_tokens
      FROM {tbl}
    ),
    c AS (
      SELECT {id_col}, _g, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY _g ORDER BY _sc DESC, {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens,
             sum(n_tokens) OVER (PARTITION BY _g) AS _tot
      FROM base
    )
    SELECT {id_col}, _g AS {group_col},
           n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(cum_tokens - n_tokens AS DOUBLE) < {float(p)!r} * CAST(_tot AS DOUBLE)
             AS keep
    FROM c ORDER BY {id_col}
    """
