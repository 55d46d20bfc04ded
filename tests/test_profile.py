"""Corpus-profile operators (operators/profile.py) + PageRank
(operators/graph.py): golden-value unit tests on constructed inputs (the
sf-corpus oracle compares are x67–x71 in the registry self-check)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_length_drift_zero_when_groups_identical(spark):
    from go_fish_spark.operators.profile import length_drift

    # two sources with IDENTICAL length distributions → KL = 0 for both
    rows = []
    for src in ("a", "b"):
        rows += [(src, "x" * 10)] * 3 + [(src, "y" * 100)] * 2
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in length_drift(df, "source", "text").collect()}
    assert out["a"].kl == 0.0 and out["b"].kl == 0.0
    assert out["a"].n_docs == 5

    # skew source 'b' entirely into the long bin → strictly positive KL
    rows2 = [("a", "x" * 10)] * 5 + [("b", "y" * 100)] * 5
    df2 = spark.createDataFrame(rows2, "source string, text string")
    out2 = {r.source: r for r in length_drift(df2, "source", "text").collect()}
    assert out2["a"].kl > 0.0 and out2["b"].kl > 0.0
    # NULL text is excluded, not crashed on
    df3 = df2.unionByName(
        spark.createDataFrame([("a", None)], "source string, text string")
    )
    out3 = {r.source: r.n_docs for r in length_drift(df3, "source", "text").collect()}
    assert out3["a"] == 5


def test_embedding_dim_stats_golden(spark):
    from go_fish_spark.operators.profile import embedding_dim_stats

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, [5.0, 0.0])],
        "id long, v array<double>",
    )
    out = {r.dim: r for r in embedding_dim_stats(df, "v").collect()}
    assert out[0].n == 3 and out[0].n_zero == 0
    assert out[0].mean == 3.0
    # var = E[x^2] - mean^2 = (1+9+25)/3 - 9 = 35/3 - 9
    assert out[0].var == pytest.approx(35.0 / 3.0 - 9.0, abs=1e-9)
    assert out[1].n_zero == 3 and out[1].mean == 0.0 and out[1].var == 0.0


def test_vocab_growth_monotone_and_exact(spark):
    from go_fish_spark.operators.profile import vocab_growth

    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 else "alpha gamma delta") for i in range(40)],
        "doc_id long, text string",
    )
    out = vocab_growth(df, "doc_id", "text").collect()
    assert [r.step for r in out] == list(range(1, 11))
    # monotone non-decreasing curves, exact totals at step 10
    for col in ("n_docs", "n_tokens", "n_distinct_tokens"):
        vals = [r[col] for r in out]
        assert vals == sorted(vals)
    last = out[-1]
    assert last.n_docs == 40
    assert last.n_tokens == 20 * 2 + 20 * 3
    assert last.n_distinct_tokens == 4
    # layout invariance: same curve from a repartitioned frame
    out2 = vocab_growth(df.repartition(7), "doc_id", "text").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]


def test_boilerplate_affixes_golden(spark):
    from go_fish_spark.operators.profile import boilerplate_affixes

    df = spark.createDataFrame(
        [
            (1, "HEADER: site-x | body one | (c) site-x corp"),
            (2, "HEADER: site-x | body twos | (c) site-x corp"),
            (3, "totally different text here now ok"),
            (4, "tiny"),  # shorter than k → excluded
        ],
        "doc_id long, text string",
    )
    out = {
        (r.kind, r.affix): (r.n_docs, r.min_doc, r.max_doc)
        for r in boilerplate_affixes(df, "doc_id", "text", k=16, min_docs=2).collect()
    }
    assert out == {
        ("prefix", "HEADER: site-x |"): (2, 1, 2),
        ("suffix", " (c) site-x corp"): (2, 1, 2),
    }


def test_pagerank_star_and_isolated(spark):
    from go_fish_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    # star: 0 is the hub of 1..4; node 5 isolated
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    out = {r.id: r.pr for r in pagerank(nodes, edges, n_iter=5).collect()}
    assert len(out) == 6
    # hub outranks every leaf; leaves are symmetric (equal ranks)
    assert all(out[0] > out[i] for i in range(1, 5))
    assert len({out[i] for i in range(1, 5)}) == 1
    # isolated node holds the floor (1-d)/N
    assert out[5] == pytest.approx(0.15 / 6, abs=1e-9)
    # layout invariance
    out2 = {
        r.id: r.pr
        for r in pagerank(nodes.repartition(4), edges.repartition(3), n_iter=5).collect()
    }
    assert out == out2


def test_pagerank_validates_n_iter(spark):
    from go_fish_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(1,)], "id long")
    edges = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(nodes, edges, n_iter=0)
    with pytest.raises(ValueError, match="max_degree"):
        pagerank(nodes, edges, n_iter=1, max_degree=0)


def test_pagerank_max_degree_golden_vs_duckdb(spark):
    """Golden for the opt-in hub cap (round-5 verdict #3): ``max_degree``
    keeps each node's k smallest-dst out-edges. Semantics CHANGE (a
    capped hub distributes less rank mass), so the contract is (a) the
    capped result differs from uncapped on a hub-heavy graph, (b) it
    bit-matches the duck_pagerank_sql mirror with the same cap, and
    (c) it is partition-layout invariant."""
    import duckdb

    from go_fish_spark.operators.graph import duck_pagerank_sql, pagerank

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    # hub 0 pairs with everyone (a boilerplate template); plus a chain
    # 1-2, 3-4, ... so leaves are not symmetric
    pair_rows = [(0, i) for i in range(1, n)] + [
        (i, i + 1) for i in range(1, n - 1, 2)
    ]
    edges = spark.createDataFrame(pair_rows, "id_a long, id_b long")

    capped = {
        r.id: r.pr
        for r in pagerank(nodes, edges, n_iter=4, max_degree=3).collect()
    }
    uncapped = {
        r.id: r.pr for r in pagerank(nodes, edges, n_iter=4).collect()
    }
    assert capped != uncapped  # the cap is a declared semantics change

    und = sorted(set(pair_rows) | {(b, a) for a, b in pair_rows})
    nodes_sql = " UNION ALL ".join(f"SELECT {i} AS id" for i in range(n))
    und_sql = " UNION ALL ".join(
        f"SELECT {a} AS src, {b} AS dst" for a, b in und
    )
    sql = duck_pagerank_sql(nodes_sql, und_sql, n_iter=4, max_degree=3)
    oracle = {int(i): float(p) for i, p in duckdb.sql(sql).fetchall()}
    assert capped == oracle

    relaid = {
        r.id: r.pr
        for r in pagerank(
            nodes.repartition(5), edges.repartition(3), n_iter=4, max_degree=3
        ).collect()
    }
    assert relaid == capped


def test_vocab_coverage_golden_and_plan(spark):
    """x78 golden on a hand-checkable corpus, plus the scale guards: the
    top-N vocabulary election must plan as TakeOrdered (distributed
    heap), NEVER a global row_number window (single-task sort over every
    distinct token), and the vocab side must broadcast into the
    coverage join."""
    from go_fish_spark.operators.profile import vocab_coverage

    df = spark.createDataFrame(
        [
            ("a", "the cat sat on the mat"),
            ("a", "the dog sat"),
            ("b", "zebra quagga the"),
            ("b", None),
        ],
        "source string, text string",
    )
    # counts: the=4, sat=2, cat/on/mat/dog/zebra/quagga=1 → vocab_size=3
    # keeps {the, sat, cat} (ties broken token-ASC: cat < dog < mat < on)
    out = {
        r.source: (r.n_tokens, r.n_oov, r.oov_rate, r.n_types, r.n_types_oov)
        for r in vocab_coverage(df, "source", "text", vocab_size=3).collect()
    }
    assert out["a"] == (9, 3, round(3 / 9, 9), 6, 3)  # on,mat,dog oov
    assert out["b"] == (3, 2, round(2 / 3, 9), 3, 2)  # zebra,quagga oov
    plan = vocab_coverage(df, "source", "text", vocab_size=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    with pytest.raises(ValueError, match="vocab_size"):
        vocab_coverage(df, "source", "text", vocab_size=0)


def test_heavy_hitters_exact_and_superset_guarantee(spark):
    """x81: the output must equal the EXACT heavy-hitter set (count·k >
    n_total) under adversarial partitionings — the Misra–Gries candidate
    stage may only ever widen the candidate set, never lose a true
    heavy hitter. Also: tight summary budgets (summary_size == k) and
    the empty corpus stay correct."""
    from go_fish_spark.operators.profile import heavy_hitters

    # 300 'a', 120 'b', and 180 singletons → n=600; k=4 → threshold 150:
    # heavy = {a}; b (120·4=480 < 600) must NOT appear
    docs = (
        [("a " * 30).strip()] * 10
        + [("b " * 12).strip()] * 10
        + [" ".join(f"u{i}_{j}" for j in range(18)) for i in range(10)]
    )
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    for layout in (df, df.repartition(7), df.repartition(1), df.coalesce(2)):
        out = {
            r.token: r.n_occurrences
            for r in heavy_hitters(layout, "text", k=4).collect()
        }
        assert out == {"a": 300}
    # tight budget: summary_size == k still exact (the guarantee's edge)
    out2 = {
        r.token: r.n_occurrences
        for r in heavy_hitters(
            df.repartition(5), "text", k=4, summary_size=4
        ).collect()
    }
    assert out2 == {"a": 300}
    # strict inequality: 'a' at exactly n/2 (300·2 = 600 = n) is NOT a
    # majority element — the k=2 report is empty
    out3 = {
        r.token: r.n_occurrences
        for r in heavy_hitters(df, "text", k=2, summary_size=2).collect()
    }
    assert out3 == {}
    assert heavy_hitters(
        spark.createDataFrame([(None,)], "text string"), "text", k=4
    ).count() == 0

    with pytest.raises(ValueError, match="k must"):
        heavy_hitters(df, "text", k=1)
    with pytest.raises(ValueError, match="summary_size"):
        heavy_hitters(df, "text", k=8, summary_size=4)


def test_embedding_centroid_report_golden(spark):
    """x83: hand-checkable centroid/dispersion values, the total-variance
    identity (dispersion = E||x||^2 - ||c||^2 >= 0), and layout
    invariance from the decimal-exact accumulation."""
    from go_fish_spark.operators.profile import embedding_centroid_report

    df = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]), ("a", [-1.0, 0.0]),   # centroid 0 → c2 0
            ("b", [2.0, 2.0]), ("b", [2.0, 2.0]),    # identical → disp 0
        ],
        "label string, v array<double>",
    )
    out = {r.label: r for r in embedding_centroid_report(df, "label", "v").collect()}
    assert out["a"].n == 2
    assert out["a"].centroid_norm2 == 0.0
    assert out["a"].mean_norm2 == 1.0 and out["a"].dispersion == 1.0
    assert out["b"].centroid_norm2 == 8.0
    assert out["b"].mean_norm2 == 8.0 and out["b"].dispersion == 0.0
    out2 = {
        r.label: tuple(r)
        for r in embedding_centroid_report(
            df.repartition(5), "label", "v"
        ).collect()
    }
    assert out2 == {k: tuple(v) for k, v in out.items()}


def test_degree_histogram_golden(spark):
    """x89: star + isolated golden — hub degree 4 → bucket 4, leaves
    degree 1 → bucket 1, the isolated node → bucket 0; duplicate and
    reversed edge declarations don't double-count."""
    from go_fish_spark.operators.graph import degree_histogram

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(1, 0), (0, 2)],  # dup + reversed
        "id_a long, id_b long",
    )
    out = {
        r.bucket_lo: r.n_nodes
        for r in degree_histogram(nodes, edges).collect()
    }
    assert out == {0: 1, 1: 4, 4: 1}
    out2 = {
        r.bucket_lo: r.n_nodes
        for r in degree_histogram(
            nodes.repartition(4), edges.repartition(3)
        ).collect()
    }
    assert out2 == out


def test_zipf_slope_single_token_group_is_null(spark):
    """Round-6 ADVICE regression: a group whose ranked vocabulary has a
    single token (n_ranks=1, x=ln(1)=0) makes the OLS denominator
    exactly 0 — the slope must be NULL, never NaN."""
    import math

    from go_fish_spark.operators.profile import zipf_slope

    df = spark.createDataFrame(
        [
            ("degenerate", "word word word word"),
            ("healthy", "the the the cat cat sat"),
        ],
        "source string, text string",
    )
    out = {r.source: r for r in zipf_slope(df, "source", "text").collect()}
    assert out["degenerate"].n_ranks == 1
    assert out["degenerate"].slope is None  # NULL, not NaN
    assert out["healthy"].n_ranks == 3
    assert out["healthy"].slope is not None
    assert not math.isnan(out["healthy"].slope)
