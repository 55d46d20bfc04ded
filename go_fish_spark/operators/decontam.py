"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The reference has no analogue (its rules are per-event filters); this is a
north-star extension (BASELINE.json) — the standard pre-training hygiene
step: any training document that overlaps an eval benchmark by >= one
k-shingle is a leakage risk and must be flagged/dropped before training.

100 TB design: the eval side is a BENCHMARK — thousands of documents, not
billions — so its distinct shingle set is broadcast. The training corpus
is never shuffled for the membership test: shingling is a per-row map,
the broadcast hash join streams through each partition, and the only
shuffle is the final groupBy on (matched) doc_id — a tiny fraction of the
corpus by construction. Contrast with a shuffle-both-sides inverted-index
join (x04's shape), which is the right tool when BOTH sides are large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from ..functions.text import _let


def eval_shingle_set(eval_docs: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """Distinct word-k-shingles of the benchmark set: one column ``sh``.

    Distinct BEFORE broadcast keeps the broadcast payload minimal (the
    benchmark's vocabulary of shingles, not its document count).
    """
    return (
        eval_docs.select(F.explode(tx.word_shingles(text_col, k)).alias("sh"))
        .distinct()
    )


def fit_eval_shingles(
    eval_docs: DataFrame, text_col: str, k: int = 3
) -> list[str]:
    """Pass 1 of the STREAMING decontamination form (the fit-on-history /
    apply-on-stream split of x30/x43/x56/x57): collect the benchmark's
    distinct shingle set driver-side. Bounded by construction — the eval
    side is a benchmark (thousands of docs), the same boundedness
    argument as the x32 automaton's collected probe list."""
    return sorted(
        r.sh for r in eval_shingle_set(eval_docs, text_col, k).collect()
    )


def contamination_hits_expr(
    text_col: str, eval_shingles: list[str], k: int = 3
) -> Column:
    """Pass 2, streaming-safe: ``n_hits`` as a PURE per-row expression —
    |doc's distinct k-shingles ∩ frozen eval set| via array_intersect
    with the literal shingle array. No explode, no join, no aggregation,
    no state: runs identically on batch and streaming frames and equals
    :func:`contaminated_docs`'s count exactly on any corpus (both count
    distinct train shingles present anywhere in the benchmark).

    Appropriate while |eval_shingles| stays benchmark-sized (≤ ~10⁵ — a
    literal array evaluated per row); beyond that, the batch broadcast
    join or the x32 automaton route is the right tool."""
    lit_set = F.array(*[F.lit(s) for s in eval_shingles])
    return F.size(F.array_intersect(tx.word_shingles(text_col, k), lit_set))


def contaminated_docs_frozen(
    df: DataFrame,
    id_col: str,
    text_col: str,
    eval_shingles: list[str],
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Streaming arm of :func:`contaminated_docs`: same output shape
    ``(id_col, n_hits)``, same semantics, driven entirely by
    :func:`contamination_hits_expr` (map-only — a live stream is flagged
    row by row with zero shuffles)."""
    n = contamination_hits_expr(text_col, eval_shingles, k)
    return (
        df.select(F.col(id_col), n.cast("bigint").alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
    )


def contaminated_docs(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Training docs sharing >= ``min_hits`` distinct k-shingles with the
    eval set → ``(id_col, n_hits)``.

    ``n_hits`` counts the train document's *distinct* shingles that appear
    anywhere in the benchmark (word_shingles is already distinct per row,
    and the eval set is distinct, so a plain count after the inner join is
    exact — no double counting).
    """
    ev = F.broadcast(eval_shingle_set(eval_docs, text_col, k))
    train_sh = train_docs.select(
        F.col(id_col), F.explode(tx.word_shingles(text_col, k)).alias("sh")
    )
    return (
        train_sh.join(ev, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def fit_shingle_bloom(
    eval_docs: DataFrame,
    text_col: str,
    k: int = 3,
    bits_per_item: int = 10,
    max_bits: int = 1 << 24,
) -> dict:
    """Fit a Bloom filter over the benchmark's distinct k-shingles as a
    plain ``array<long>`` bit array — the FIXED-SIZE form of the eval
    membership set. :func:`contaminated_docs` broadcasts the benchmark's
    whole distinct shingle VOCABULARY (strings — grows with the
    benchmark and can reach GBs across a large eval suite); the Bloom
    form broadcasts ``bits_per_item``/8 bytes per shingle regardless of
    shingle length (~1% false-positive rate at 10 bits/item with
    ⌈m/n·ln2⌉ hash probes), which is the membership structure that still
    fits every executor at 100 TB.

    Positions are ``pmod(xxhash64(sh, i), m)`` for probe index i (the
    engine's native 64-bit hash — deterministic, codegen'd); the bit
    array is built with one bounded aggregation over the k·n exploded
    positions (``bit_or`` per 64-bit word) and collected driver-side
    (m/64 longs — 8 KB at 2¹⁶ bits). Returns ``{"m_bits", "n_hashes",
    "n_items", "words"}``."""
    import math

    ev = eval_shingle_set(eval_docs, text_col, k)
    n = max(ev.count(), 1)
    m_bits = min(
        int(max_bits),
        max(64, 1 << math.ceil(math.log2(n * max(bits_per_item, 1)))),
    )
    n_hashes = max(1, min(8, round(0.6931 * m_bits / n)))
    pos = ev.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col("sh"), F.lit(i)), F.lit(m_bits)
                    )
                    for i in range(1, n_hashes + 1)
                ]
            )
        ).alias("pos")
    )
    rows = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("mask"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[int(r["w"])] = int(r["mask"])
    return {
        "m_bits": m_bits,
        "n_hashes": n_hashes,
        "n_items": n,
        "words": words,
    }


def bloom_might_contain_expr(bloom: dict, sh_col: str = "sh"):
    """``TRUE`` iff every probe bit of ``sh_col`` is set in the bloom's
    ``bf`` column (attach the bit array first — see
    :func:`bloom_contaminated_docs`). Pure codegen'd expression: k
    xxhash64 probes, k word lookups, k bit tests — no join, no Python."""
    m = int(bloom["m_bits"])
    checks = None
    for i in range(1, int(bloom["n_hashes"]) + 1):
        c = F.expr(
            f"(element_at(bf, CAST(pmod(xxhash64({sh_col}, {i}), {m}) "
            f"/ 64 AS INT) + 1) & shiftleft(1L, CAST(pmod(pmod("
            f"xxhash64({sh_col}, {i}), {m}), 64) AS INT))) != 0"
        )
        checks = c if checks is None else (checks & c)
    return checks


def bloom_contaminated_docs(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_hits: int = 1,
    bits_per_item: int = 10,
) -> DataFrame:
    """:func:`contaminated_docs` with a Bloom PRESCREEN — output
    IDENTICAL by construction (a Bloom filter has no false negatives,
    so every true hit survives the prescreen; false positives are
    killed by the exact verification join), but the expensive exact
    join now sees only might-contain survivors: true hits + ~1% of the
    clean volume, instead of every (doc, shingle) row.

    100 TB shape — the two-phase membership discipline: phase 1 is
    MAP-ONLY (the fixed-size bit array rides a broadcast one-row frame;
    the k hash probes run inside codegen on the corpus scan — no
    shuffle, no join); phase 2 verifies the survivors (true hits +
    ~FPR of the clean volume, ~11× smaller than the raw explode at
    sf0.1) against the exact eval shingle set with an UNHINTED
    equi-join — AQE broadcasts the eval side while it fits the
    executor budget and falls back to a shuffle join when the
    benchmark vocabulary outgrows it (r12 verdict: the previous FORCED
    broadcast re-created exactly the failure mode this function exists
    to avoid). What this form buys over :func:`contaminated_docs` is
    the 11× smaller join INPUT; the form that sheds the eval
    vocabulary from the executors entirely is the one-sided
    ``bloom_gate`` task (tasks/builtin.py) — Bloom-only, no
    verification join, conservative by FPR."""
    bloom = fit_shingle_bloom(eval_docs, text_col, k, bits_per_item)
    spark = train_docs.sparkSession
    bf = spark.createDataFrame([(bloom["words"],)], "bf array<bigint>")
    train_sh = train_docs.select(
        F.col(id_col), F.explode(tx.word_shingles(text_col, k)).alias("sh")
    )
    survivors = (
        train_sh.join(F.broadcast(bf))
        .filter(bloom_might_contain_expr(bloom, "sh"))
        .drop("bf")
    )
    ev = eval_shingle_set(eval_docs, text_col, k)
    return (
        survivors.join(ev, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def _aho_build(patterns: list[str]):
    """Aho-Corasick automaton over ``patterns``: (goto, fail, out) where
    ``out[state]`` lists the indices of patterns ending at that state
    (including via suffix links) — one text pass finds every DISTINCT
    pattern contained, regardless of how many patterns there are."""
    from collections import deque

    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for idx, p in enumerate(patterns):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(idx)
    fail = [0] * len(goto)
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for ch, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and ch not in goto[f]:
                f = fail[f]
            cand = goto[f].get(ch, 0)
            fail[t] = cand if cand != t else 0
            out[t] = out[t] + out[fail[t]]
    return goto, fail, out


def substring_contaminated_docs(
    train_docs: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    probe_col: str = "probe",
    method: str = "join",
) -> DataFrame:
    """Exact-substring decontamination: training docs containing any probe
    string VERBATIM → ``(id_col, n_probe_hits)`` (count of DISTINCT
    probes contained). The stronger form of :func:`contaminated_docs` —
    shingle overlap catches paraphrase-level leakage, substring
    containment catches the canary/verbatim case (eval questions,
    licensed strings, canaries) with zero false positives.

    100 TB shape: probes are a benchmark artifact (bounded, thousands),
    so the probe side broadcasts either way and the corpus is MAP-ONLY.
    ``method`` picks the per-row cost:

    * ``"join"`` — broadcast nested-loop contains-join: |probes|
      substring searches per row, entirely built-in operators (DuckDB
      can mirror it exactly — the oracle-checkable form).
    * ``"automaton"`` — ONE Aho-Corasick pass per row (pandas UDF whose
      closure carries the automaton built driver-side from the collected
      probe list): per-row cost independent of |probes| — the route for
      probe sets beyond ~10⁴. Identical output to ``"join"``
      (equality-tested in tests/test_curation.py)."""
    if method == "automaton":
        import pandas as pd
        from pyspark.sql import types as T

        plist = sorted(
            r[0]
            for r in probes.select(F.col(probe_col)).distinct().collect()
            if r[0]
        )
        goto, fail, out = _aho_build(plist)

        def _n_hits(texts):
            res = []
            for text in texts:
                s = 0
                matched: set[int] = set()
                for ch in text:
                    while s and ch not in goto[s]:
                        s = fail[s]
                    s = goto[s].get(ch, 0)
                    if out[s]:
                        matched.update(out[s])
                res.append(len(matched))
            return pd.Series(res, dtype="int64")

        _n_hits.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        u = F.pandas_udf(_n_hits, T.LongType())
        return (
            train_docs.select(
                F.col(id_col), u(F.col(text_col)).alias("n_probe_hits")
            )
            .filter(F.col("n_probe_hits") > 0)
        )
    if method != "join":
        raise ValueError(f"unknown method {method!r}")
    # Drop null/empty probes with the same predicate the automaton path
    # applies to its collected list (`if r[0]`): contains(text, '') is
    # true for EVERY doc, so a stray '' probe would flag the whole corpus
    # and break the documented identical-output contract between methods.
    p = F.broadcast(
        probes.select(F.col(probe_col).alias("_probe"))
        .where(F.col("_probe").isNotNull() & (F.length("_probe") > 0))
        .distinct()
    )
    return (
        train_docs.select(F.col(id_col), F.col(text_col))
        .join(p, F.contains(F.col(text_col), F.col("_probe")))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_probe_hits"))
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """The complement: training docs that survive decontamination
    (left-anti join against the contaminated id set)."""
    bad = contaminated_docs(
        train_docs, eval_docs, id_col, text_col, k=k, min_hits=min_hits
    ).select(id_col)
    return train_docs.join(bad, id_col, "left_anti")


def contamination_score(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-document contamination FRACTION — the graded complement of
    :func:`contaminated_docs`' boolean membership: for EVERY training doc,
    what share of its distinct k-shingles appears anywhere in the
    benchmark. The standard report for choosing a removal threshold (a
    doc sharing one idiom is different from a doc that IS the benchmark),
    e.g. the n-gram-overlap contamination analyses in GPT-3 appendix C /
    PaLM-style eval cards.

    Output: (id_col, n_shingles BIGINT, n_hits BIGINT, overlap DOUBLE
    rounded 6) — one row per training doc, 0-hit docs included (the
    threshold sweep needs the clean mass too).

    100 TB shape: the eval shingle vocabulary is distinct'd then
    broadcast, so the corpus is never shuffled for the probe (same plan
    discipline as contaminated_docs); n_shingles is a map-side array
    length; the only corpus-keyed exchanges are the hit groupBy and the
    left join back on ``id_col``."""
    ev = F.broadcast(eval_shingle_set(eval_docs, text_col, k))
    base = train_docs.select(
        F.col(id_col),
        F.size(tx.word_shingles(text_col, k)).cast("bigint").alias("n_shingles"),
    )
    hits = (
        train_docs.select(
            F.col(id_col), F.explode(tx.word_shingles(text_col, k)).alias("sh")
        )
        .join(ev, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint"))
    return base.join(hits, id_col, "left").select(
        F.col(id_col),
        F.col("n_shingles"),
        n_hits.alias("n_hits"),
        F.round(
            F.when(
                F.col("n_shingles") > 0,
                n_hits.cast("double") / F.col("n_shingles"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("overlap"),
    )


def split_leakage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split: Column,
    k: int = 3,
    threshold: float = 0.3,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Train/eval LEAKAGE GUARD: near-duplicate pairs that straddle
    different dataset splits — the hygiene check that a random
    document-level split silently fails (near-dups of a test doc sitting
    in train inflate eval scores; Lee et al. 2022 §6 measure the effect).
    ``split`` is any deterministic split-assignment expression
    (sampling.split_assign is the canonical one).

    Output: (id_a, id_b, split_a, split_b, jaccard) — only pairs with
    ``split_a != split_b``, i.e. exactly the leaks. Remediation is the
    caller's policy (move the pair into one split, or drop the train
    side).

    100 TB shape: pair generation is dedup.ngram_jaccard_pairs (one
    shingle-key shuffle; threshold-adaptive index). The split join-back
    touches only the PAIR ids — two id-key equi-joins on the (much
    smaller than corpus) pair set; the split column itself is a pure
    per-row expression, never materialized corpus-wide. ``pairs``: an
    optional pre-computed ``ngram_jaccard_pairs(df, k, threshold)``
    frame (the session-shared x04 pair graph) — the guard then costs
    only the two id-key join-backs."""
    from .dedup import ngram_jaccard_pairs

    if pairs is None:
        pairs = ngram_jaccard_pairs(
            df, id_col, text_col, k=k, threshold=threshold
        )
    s = df.select(F.col(id_col), split.alias("_split"))
    sa = s.select(F.col(id_col).alias("id_a"), F.col("_split").alias("split_a"))
    sb = s.select(F.col(id_col).alias("id_b"), F.col("_split").alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


def scrub_contaminated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    eval_shingles: list[str],
    k: int = 3,
) -> DataFrame:
    """SPAN-LEVEL decontamination: instead of dropping a leaked document
    (:func:`decontaminate`), surgically remove the tokens covered by any
    benchmark k-shingle and keep the rest — the treatment for long
    documents that quote one eval question but carry megabytes of clean
    text around it. Pure per-row array surgery (no explode/join/state —
    streaming-safe like :func:`contaminated_docs_frozen`):

    1. the doc's contaminated shingles = hash-based ``array_intersect``
       of its distinct shingles with the frozen benchmark set (fast even
       for large benchmark literals; per-row result is tiny),
    2. a token survives iff NO window containing it is contaminated,
    3. the text is rebuilt from surviving tokens (single-space joined —
       token-level surgery normalizes whitespace by construction).

    Output: (id_col, text_scrubbed, n_tokens_removed BIGINT). NULL text
    passes through as NULL with 0 removed."""
    lit_set = F.array(*[F.lit(s) for s in eval_shingles])
    toks = F.split(F.col(text_col), " ")

    def body(w: Column) -> Column:
        n = F.size(w)
        n_w = n - (k - 1)  # windows are 1..n_w (1-based)
        shs = F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n_w),
                lambda i: F.concat_ws(" ", F.slice(w, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

        def kept(shs_c: Column) -> Column:
            contams = F.array_intersect(F.array_distinct(shs_c), lit_set)
            survivors = F.filter(
                F.sequence(F.lit(1), n),
                lambda j: ~F.exists(
                    F.sequence(
                        F.greatest(F.lit(1), j - (k - 1)),
                        F.least(j, n_w),
                    ),
                    lambda i: F.array_contains(
                        contams, F.element_at(shs_c, i)
                    ),
                ),
            )
            # n < k → no windows exist; the filter branch would build a
            # DESCENDING i-sequence and index the empty shingle array, so
            # short-circuit to "keep everything" BEFORE evaluation.
            return F.when(n >= k, survivors).otherwise(
                F.sequence(F.lit(1), n)
            )

        return _let(
            shs,
            lambda shs_c: _let(
                kept(shs_c),
                lambda kp: F.struct(
                    F.concat_ws(
                        " ",
                        F.transform(kp, lambda j: F.element_at(w, j)),
                    ).alias("scrubbed"),
                    (n - F.size(kp)).cast("bigint").alias("removed"),
                ),
            ),
        )

    res = _let(toks, body)
    return df.select(
        F.col(id_col),
        F.when(F.col(text_col).isNotNull(), res["scrubbed"]).alias(
            "text_scrubbed"
        ),
        F.when(F.col(text_col).isNotNull(), res["removed"])
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_tokens_removed"),
    )


def duck_scrub_spans_sql(
    tbl: str,
    id_col: str,
    text_col: str,
    eval_shingles_sql: str,
    k: int = 3,
) -> str:
    """DuckDB mirror of :func:`scrub_contaminated_spans`.
    ``eval_shingles_sql`` is a scalar subquery yielding the benchmark
    shingle LIST (the oracle derives the same frozen set from the same
    tables instead of embedding data literals). Same construction order:
    shingles → per-doc contaminated intersect → window-coverage filter →
    single-space rebuild."""
    kk = k - 1
    shs = (
        f"[array_to_string(w[i2:i2+{kk}:1], ' ') "
        f"for i2 in range(1, len(w) - {kk} + 1)]"
    )
    covered = (
        f"len(list_filter(range(greatest(1, j - {kk}), "
        f"least(j, len(w) - {kk}) + 1), "
        f"i -> list_contains(contams, shs[i]))) > 0"
    )
    return f"""
    WITH base AS (
      SELECT {id_col} AS _id, {text_col} AS _t,
             string_split({text_col}, ' ') AS w
      FROM {tbl}
    ),
    sh AS (
      SELECT *, CASE WHEN len(w) >= {k} THEN {shs}
                     ELSE CAST([] AS VARCHAR[]) END AS shs
      FROM base
    ),
    ev AS (SELECT ({eval_shingles_sql}) AS evl),
    ct AS MATERIALIZED (
      SELECT sh.*, list_intersect(list_distinct(shs), ev.evl) AS contams
      FROM sh CROSS JOIN ev
    ),
    kp AS (
      SELECT *, CASE WHEN len(w) >= {k}
                     THEN [j for j in range(1, len(w) + 1)
                           if NOT ({covered})]
                     ELSE range(1, len(w) + 1) END AS kept
      FROM ct
    )
    SELECT _id AS {id_col},
           CASE WHEN _t IS NOT NULL
                THEN coalesce(array_to_string([w[j] for j in kept], ' '), '')
           END AS text_scrubbed,
           CAST(CASE WHEN _t IS NOT NULL THEN len(w) - len(kept)
                     ELSE 0 END AS BIGINT) AS n_tokens_removed
    FROM kp ORDER BY _id
    """


def eval_coverage(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """The REVERSE direction of :func:`contamination_score`: per EVAL
    item, what fraction of its distinct k-shingles appears anywhere in
    the training corpus — the per-benchmark-item leakage report ("which
    eval questions does the corpus already contain?") that decides
    whether a benchmark is still trustworthy after a crawl, where x38
    decides which TRAINING docs to drop.

    Output: (id_col, n_shingles, n_covered, coverage DOUBLE round-6),
    one row per eval doc (0-shingle docs report coverage 0.0).

    100 TB shape: the CORPUS side cannot broadcast — it reduces to
    DISTINCT 16-byte shingle digests, and the bounded eval side's
    exploded (id, digest) rows semi-join it on the digest key (the
    x41-class digest-keyed exchange; corpus text never shuffles, only
    its distinct digests do). Per-item aggregation is bounded by the
    eval set."""
    from .dedup import word_shingles

    tr = (
        train_docs.select(
            F.explode(word_shingles(text_col, k)).alias("_s")
        )
        .select(F.md5("_s").alias("_d"))
        .distinct()
    )
    ev = eval_docs.select(
        F.col(id_col), word_shingles(text_col, k).alias("_sh")
    ).withColumn("_n", F.size("_sh"))
    ex = ev.select(
        F.col(id_col), F.explode("_sh").alias("_s")
    ).select(F.col(id_col), F.md5("_s").alias("_d"))
    hits = (
        ex.join(tr, "_d", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_nc"))
    )
    n_cov = F.coalesce(F.col("_nc"), F.lit(0)).cast("bigint")
    return (
        ev.select(id_col, "_n")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_n").cast("bigint").alias("n_shingles"),
            n_cov.alias("n_covered"),
            F.round(
                F.when(F.col("_n") > 0, n_cov / F.col("_n")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("coverage"),
        )
    )
