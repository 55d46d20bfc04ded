"""BM25 keyword retrieval over the document corpus — the lexical scoring
arm next to the embedding ANN family (similarity.py). A curation pipeline
uses it two ways: ad-hoc corpus search ("find the docs about X") and
targeted-domain mining (score the crawl against a recipe of topic terms,
keep the head — the rule-based cousin of DSIR's distribution matching,
operators/dsir.py).

Reference anchor: the reference has no retrieval operator (gap category,
SURVEY.md §2.6).

Scoring is Okapi BM25 in the Lucene ``idf = ln(1 + (N−df+0.5)/(df+0.5))``
form (always positive, so partial matches never score below zero).

100 TB shape: the query's term set BROADCASTS into the token explode as an
``isin`` prune, so the corpus-sized stream collapses to (doc, query-term)
incidences BEFORE the only shuffle — per-doc term frequencies aggregate on
a key whose cardinality is ≤ |docs containing a query term| × |terms|.
Document-frequency and corpus stats are bounded aggregates that join back
as broadcasts. The corpus itself never shuffles.

Cross-engine float discipline (the x34/x55 recipe): each per-term
contribution is double arithmetic ending in ``round(·, 12)`` (ln differs
by 1 ulp across libms on ~1e-4 of inputs; the rounding hides it), the
per-doc sum accumulates as decimal(27,18) (exact, order-independent), and
the final score rounds to 9 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score against the bag of query ``terms``.

    Output: one row per document containing ≥ 1 query term —
    (id_col, n_terms_matched BIGINT, bm25 DOUBLE rounded 9). Repeated
    query terms are scored once (set semantics, the standard bag-of-words
    collapse)."""
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.size(toks).alias("_dl"),
        F.explode(toks).alias("token"),
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("_N"),
        F.avg(F.size(toks)).alias("_avgdl"),
    )
    tf = (
        base.filter(F.col("token").isin(terms))
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_N") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    contrib = (
        idf
        * (F.col("_tf") * F.lit(k1 + 1.0))
        / (
            F.col("_tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select("_id", F.round(contrib, 12).cast("decimal(27,18)").alias("_c"))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum("_c").cast("double"), 9).alias("bm25"),
        )
        .select(F.col("_id").alias(id_col), "n_terms_matched", "bm25")
    )


def duck_bm25_sql(
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB mirror of :func:`bm25_scores` — same idf form, same
    operation order inside the contribution, same round-12 → decimal
    accumulation → round-9 discipline. Hyperparameters go through
    ``_dlit`` (DOUBLE-forced literals): bare decimals parse as DECIMAL,
    whose →DOUBLE conversion can sit 1 ulp off the Spark ``F.lit``
    double for reprs longer than 2⁵³ mantissas."""
    from .similarity import _dlit

    terms = sorted(set(terms))
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
    WITH base AS (
      SELECT {id_col} AS _id,
             len(string_split({text_col}, ' ')) AS _dl,
             unnest(string_split({text_col}, ' ')) AS token
      FROM {table}
    ),
    stats AS (
      SELECT count(*) AS _N,
             avg(len(string_split({text_col}, ' '))) AS _avgdl
      FROM {table}
    ),
    tf AS (
      SELECT _id, token, count(*) AS _tf, any_value(_dl) AS _dl
      FROM base WHERE token IN ({tlist}) GROUP BY _id, token
    ),
    dfreq AS (SELECT token, count(*) AS _df FROM tf GROUP BY token)
    SELECT tf._id AS {id_col},
           CAST(count(*) AS BIGINT) AS n_terms_matched,
           round(CAST(sum(CAST(round(
             ln(1.0 + (stats._N - dfreq._df + 0.5) / (dfreq._df + 0.5))
             * (tf._tf * {_dlit(k1 + 1.0)})
             / (tf._tf + {_dlit(k1)} * ({_dlit(1.0 - b)} + {_dlit(b)} * tf._dl / stats._avgdl)),
             12) AS DECIMAL(27,18))) AS DOUBLE), 9) AS bm25
    FROM tf JOIN dfreq USING (token) CROSS JOIN stats
    GROUP BY tf._id
    """


def fit_bm25_stats(
    df: DataFrame, text_col: str, terms: list[str]
) -> dict:
    """Pass 1 of the streaming BM25 form (the fit-on-history /
    apply-on-stream split the DSIR scorer uses, operators/dsir.py): pull
    the bounded corpus statistics — N, avgdl, and per-term document
    frequency — from a STATIC/history corpus. The result is a small dict
    (≤ |terms| + 2 numbers), the driver-side analogue of a broadcast."""
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens(text_col)
    row = df.agg(
        F.count(F.lit(1)).alias("N"), F.avg(F.size(toks)).alias("avgdl")
    ).collect()[0]
    if row.N == 0 or row.avgdl is None:
        raise ValueError(
            "cannot fit BM25 stats on an empty (or all-NULL-text) corpus"
        )
    dfreq = {
        r.token: r.n
        for r in (
            df.select(F.explode(F.array_distinct(toks)).alias("token"))
            .filter(F.col("token").isin(terms))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    return {"N": int(row.N), "avgdl": float(row.avgdl), "df": dfreq}


def bm25_score_with_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stats: dict,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Pass 2, streaming-safe: score each row against FROZEN stats with a
    pure per-row expression — per term, tf = count of exact token matches
    (a JVM-side array filter; no explode), the same contribution
    arithmetic as :func:`bm25_scores` (idf built from literal N/df INSIDE
    Spark, so ln runs on the same libm both ways), round-12 per term,
    decimal-exact sum, round-9 final. No join, no aggregation, no state:
    runs identically on batch and streaming frames, and equals
    :func:`bm25_scores` bit-for-bit on the corpus the stats were fit on.
    A term history never saw (df absent) scores with df=0 — the
    max-idf convention for out-of-history terms on a live stream. Docs
    matching no term (or NULL text) are dropped, matching the batch
    form's explode semantics."""
    n_matched, score = bm25_score_exprs(text_col, stats, terms, k1, b)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            n_matched.alias("n_terms_matched"),
            score.alias("bm25"),
        )
        .where(F.col("n_terms_matched") > 0)
    )


def bm25_score_exprs(
    text_col: str,
    stats: dict,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
):
    """The frozen-stats BM25 arithmetic as a pair of pure per-row Column
    expressions ``(n_terms_matched BIGINT, bm25 DOUBLE)`` over
    ``text_col`` — the building block shared by
    :func:`bm25_score_with_stats` (narrow scored projection) and the
    row-preserving ``bm25_gate`` task (`tasks/builtin.py`), which selects
    ``df("*")`` plus these two columns so chained rules keep the full
    payload. NULL text scores NULL/0-matched; callers decide drop-vs-keep
    semantics."""
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    n_lit = F.lit(float(stats["N"]))
    avgdl = F.lit(float(stats["avgdl"]))
    toks = tokens(text_col)
    dl = F.size(toks)
    denom_len = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)

    def _tf(term: str):
        # NOTE: a default-arg lambda (lambda x, _t=term: ...) would be
        # introspected as the two-arg (element, index) form by the
        # higher-order-function machinery — close over term instead.
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    contribs, matched = [], []
    for t in terms:
        tf = _tf(t)
        dfreq = F.lit(float(stats["df"].get(t, 0)))
        idf = F.log(F.lit(1.0) + (n_lit - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5)))
        c = idf * (tf * F.lit(k1 + 1.0)) / (tf + denom_len)
        contribs.append(
            F.when(tf > 0, F.round(c, 12).cast("decimal(27,18)")).otherwise(
                F.lit(None).cast("decimal(27,18)")
            )
        )
        matched.append(F.when(tf > 0, 1).otherwise(0))
    n_matched = sum(matched[1:], matched[0])
    score = F.aggregate(
        F.array(*contribs),
        F.lit(0).cast("decimal(27,18)"),
        lambda acc, x: (acc + F.coalesce(x, F.lit(0).cast("decimal(27,18)"))).cast(
            "decimal(27,18)"
        ),
    )
    return n_matched.cast("bigint"), F.round(score.cast("double"), 9)


def ranked_topn(
    df: DataFrame, id_col: str, score_col: str, n: int, rank_col: str
) -> DataFrame:
    """Dense ``(id, rank)`` list of the top-``n`` rows by
    ``score_col DESC, id ASC`` — the candidate-list builder every rank-
    fusion consumer needs.

    100 TB shape: the cut is an ``orderBy().limit(n)`` — Spark plans it
    as TakeOrdered (per-partition top-n heaps merged on one reducer), so
    the corpus is never globally sorted. Only the ≤ n survivors pass
    through the unpartitioned row_number window; the single-partition
    window is bounded by n, never by the corpus — the same bounded-frame
    discipline as x30's top-quantile cut."""
    top = df.select(id_col, score_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    ).limit(int(n))
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return top.select(
        F.col(id_col), F.row_number().over(w).alias(rank_col)
    )


def rrf_fuse(
    arms: dict[str, DataFrame],
    id_col: str,
    k: int = 60,
    top_k: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists — the standard
    hybrid-retrieval combiner (Cormack et al.: ``score(d) = Σ_arms
    1/(k + rank_arm(d))``, missing-from-arm contributes 0): robust to
    incomparable score scales, which is exactly why lexical BM25 and
    embedding cosine are fused by RANK, not by score.

    ``arms`` maps an arm name to a ``(id_col, rank_<name>)`` frame (the
    :func:`ranked_topn` shape). Output: (id_col, rank_<name>..., rrf
    DOUBLE rounded 9), ordered rrf desc with id tie-break, LIMIT top_k.

    100 TB shape: every arm is already cut to its own top-n, so the
    FULL OUTER fusion joins bounded frames (≤ Σ n rows) — fusion cost is
    independent of corpus size; the heavy lifting stays in the arms.
    Float discipline: each 1/(k+rank) divides exact ints as DOUBLE
    (correctly rounded → bit-equal cross-engine) and the ≤ N-term sum is
    a fixed-order per-row expression, absorbed by round-9."""
    if len(arms) < 2:
        raise ValueError("rrf_fuse needs >= 2 arms")
    names = list(arms)
    fused = None
    for name in names:
        arm = arms[name]
        fused = (
            arm
            if fused is None
            else fused.join(arm, id_col, "full_outer")
        )
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(int(k)) + F.col(f"rank_{n}")), F.lit(0.0)
        )
        for n in names
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return (
        fused.select(
            id_col,
            *[f"rank_{n}" for n in names],
            F.round(total, 9).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(int(top_k))
    )


def mmr_diversify(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_id,
    top_n: int = 20,
    k: int = 8,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98)
    diversified top-k: greedily select k items maximizing
    ``λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s)`` from the
    ``top_n`` cosine candidates — the de-duplicating retrieval head a
    similarity search needs when the nearest neighbors are all the same
    near-identical document (plain top-k returns one cluster; MMR
    spends the budget on DISTINCT regions of the neighborhood). The
    few-shot-selection / RAG-context staple.

    Output: (rank INT 1-based, vec_id, mmr_score DOUBLE round-9).

    100 TB shape — the greedy loop runs on a BOUNDED frame: the only
    corpus-scale work is the candidate scan (one broadcast-query cosine
    pass + TakeOrdered top_n, same law as brute_force_topk; swap in the
    IVF/LSH index for the scan at scale). Every similarity is computed
    in Spark (the candidate pass + one top_n² pair-cosine job over the
    persisted candidate frame); the two bounded frames are then
    collected ONCE and the k greedy argmaxes run driver-side — k
    single-row selections over ≤ top_n rows are model-fit-sized
    arithmetic, not Spark jobs (two jobs total instead of 2 + k). The
    driver argmax reproduces the in-plan expression bit-for-bit: the
    score is the same fixed-order double expression (λ and 1−λ enter as
    Python floats — IEEE-754 binary64, identical single-op rounding to
    the JVM), the round-9 is HALF_UP on the shortest-round-trip decimal
    repr (exactly Spark's Round-on-double: Scala BigDecimal(double)
    parses Double.toString, and Python's repr() yields the same
    shortest string), NaN sorts first under descending order (the JVM
    Double.compare rule), ties break to the lower id."""
    from decimal import ROUND_HALF_UP, Decimal

    from ..functions.vectors import cosine
    from .dedup import _persist

    qv = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qv")
    )
    cand = _persist(
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            cosine(vec_col, "_qv").alias("_sim_q"),
        )
        .orderBy(F.col("_sim_q").desc(), "_id")
        .limit(int(top_n))
    )
    a, b = cand.alias("a"), cand.alias("b")
    pair_rows = (
        a.join(b, F.col("a._id") != F.col("b._id"))
        .select(
            F.col("a._id").alias("_pa"),
            F.col("b._id").alias("_pb"),
            cosine("a._v", "b._v").alias("_sim"),
        )
        .collect()  # bounded: ≤ top_n² rows
    )
    cand_rows = cand.select("_id", "_sim_q").collect()  # ≤ top_n rows

    def _round9(x: float) -> float:
        # Spark Round(double, 9): BigDecimal(Double.toString(x))
        # .setScale(9, HALF_UP).toDouble — repr() is the same shortest
        # round-trip decimal string, HALF_UP ties away from zero in
        # both engines; non-finite values never reach Round on corpus
        # data (cosine of finite vectors) and pass through untouched.
        if x != x or x in (float("inf"), float("-inf")):
            return x
        return float(
            Decimal(repr(x)).quantize(Decimal("1E-9"), rounding=ROUND_HALF_UP)
        )

    def _desc_key(score: float) -> float:
        # descending sort key with the JVM Double ordering: NaN sorts
        # ABOVE +Inf, so it must come first under desc
        return float("-inf") if score != score else -score

    pair_sim: dict = {}
    for r in pair_rows:
        pair_sim.setdefault(r._pa, {})[r._pb] = r._sim
    lam_f, one_minus = float(lam), 1.0 - float(lam)
    selected: list = []
    out = []
    for rank in range(1, int(k) + 1):
        best = None
        for r in cand_rows:
            cid = r._id
            if selected:
                if cid in selected:
                    continue
                # same inner-join semantics as the in-plan argmax: a
                # candidate with no pair row to any selected id is
                # ineligible (cannot happen for a full a≠b pair frame)
                sims = pair_sim.get(cid, {})
                sel_sims = [sims[s] for s in selected if s in sims]
                if not sel_sims:
                    continue
                score = lam_f * r._sim_q - one_minus * max(sel_sims)
            else:
                score = lam_f * r._sim_q
            key = (_desc_key(_round9(score)), cid)
            if best is None or key < best[0]:
                best = (key, cid, _round9(score))
        if best is None:  # candidates exhausted (k > available)
            break
        selected.append(best[1])
        out.append((rank, best[1], float(best[2])))
    id_type = emb.schema[id_col].dataType.simpleString()
    return emb.sparkSession.createDataFrame(
        out, f"rank int, {id_col} {id_type}, mmr_score double"
    )
