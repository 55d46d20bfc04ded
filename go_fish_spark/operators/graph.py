"""Connected components over a pair/edge list — duplicate-cluster
resolution.

The dedup operators (x01–x05) emit PAIRS; a training-data pipeline needs
CLUSTERS ("keep one canonical doc per near-dup group"), and pairs compose
transitively: A~B, B~C puts A,C in one cluster even if they never paired.
That is connected components, with min(doc_id) as the canonical label.

Algorithm: iterative min-label propagation with pointer jumping — each
round every node takes the minimum label among itself and its neighbors,
and (from round ``jump_after`` on) additionally hops to its label's own
label (path halving), the same doubling trick that gives the two-phase
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") its O(log n) bound. Per round: ONE
shuffle-join of labels to the (pre-partitioned, static) adjacency + one
min-aggregation (+ one labels⋈labels join once jumping engages), and the
label frame is ``localCheckpoint``-ed so the plan does not grow with the
iteration count (without this, round k re-executes rounds 1..k-1 — the
classic iterative-DataFrame trap). Near-dup graphs have tiny diameters
(dup clusters are dense), so rounds stay single-digit at any corpus
size; the jumping rounds are the guard for adversarial long-chain
graphs, which converge in O(log diameter) instead of O(diameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    jump_after: int = 2,
) -> DataFrame:
    """(id, component) for every node; component = min node id reachable.

    ``nodes``: one column ``id_col``. ``edges``: undirected pairs
    ``src_col``/``dst_col`` (direction-agnostic; self-loops harmless).
    Raises if not converged within ``max_iter`` rounds.

    Adversarial-diameter guard: plain min-label propagation needs
    O(diameter) rounds — a 10⁶-node chain would never finish. From round
    ``jump_after`` on, each round adds POINTER JUMPING (path halving:
    ``component ← component[component]``, one extra labels⋈labels join),
    which doubles the distance a label travels per round → O(log
    diameter) total. The first ``jump_after`` rounds stay plain because
    the dominant dedup graphs (dup cliques, diameter ≤ 2) converge in
    2-3 rounds and shouldn't pay the extra join."""
    # Pre-partition the (static) adjacency on the join key: the cached
    # frame's HashPartitioning(src) satisfies each round's join
    # requirement, so only the (changing) label side shuffles per round.
    adj = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition("src")
        .persist()
    )
    # Seed labels from nodes ∪ edge endpoints: the propagation join adds a
    # row for any edge endpoint missing from `nodes`, and the sum-based
    # convergence check below assumes a FIXED row set (labels only ever
    # decrease on a fixed set ⟹ the sum is strictly monotone). Fixing the
    # set from round 0 keeps that invariant exact.
    seed = (
        nodes.select(F.col(id_col).alias("id"))
        .unionByName(adj.select("src").withColumnRenamed("src", "id"))
        .dropDuplicates(["id"])
        .select("id", F.col("id").alias("component"))
    )

    # Convergence test depends on the label dtype. For integral ids the
    # exact decimal(38,0) sum is monotone-decreasing and one slim agg per
    # round suffices (a bigint sum would overflow around 1e9 ids ×
    # 1e9-magnitude labels). For string/float ids the cast yields NULLs
    # (or truncates fractions into aliasing), so fall back to a
    # changed-row count via a self-join — type-agnostic, one extra join
    # per round.
    comp_type = dict(seed.dtypes)["component"]
    sum_based = comp_type in ("tinyint", "smallint", "int", "bigint") or (
        comp_type.startswith("decimal") and comp_type.endswith(",0)")
    )

    def checkpoint_with_sum(frame: DataFrame):
        """``(localCheckpoint(frame), label sum)`` in ONE job: the sum
        rides the checkpoint materialization as an observed metric
        (optimization r15, guide §1 "don't launch a job for a number an
        existing action already computes") instead of a separate
        per-round agg+collect — the iterative families' job count was
        2×(rounds+1) per CC call, half of it these sum probes. The
        metric is the same exact decimal(38,0) sum the agg computed;
        ``Observation.get`` blocks until the checkpoint action's metrics
        arrive, so the read order is deterministic. Non-sum label types
        skip the metric (their convergence is the changed-row join)."""
        if not sum_based:
            return frame.localCheckpoint(), None
        from pyspark.sql import Observation

        obs = Observation()
        ck = frame.observe(
            obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint()
        return ck, obs.get["s"]

    def changed_count(old: DataFrame, new: DataFrame) -> int:
        o = old.select(F.col("id").alias("_oid"), F.col("component").alias("_oc"))
        return (
            new.join(o, new["id"] == o["_oid"])
            .where(F.col("component") != F.col("_oc"))
            .count()
        )

    labels, prev_sum = checkpoint_with_sum(seed)
    for rnd in range(max_iter):
        # neighbor labels flow along edges; min with own label
        prop = adj.join(labels, adj["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "component"
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        if rnd >= jump_after:
            # path halving: component ← component's own label. Labels only
            # decrease, so least() is the min of the two hops; coalesce
            # covers edge endpoints absent from `nodes`.
            l2 = new_labels.select(
                F.col("id").alias("_cid"), F.col("component").alias("_cc")
            )
            new_labels = (
                new_labels.join(
                    l2, new_labels["component"] == l2["_cid"], "left"
                )
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("_cc"), F.col("component")),
                    ).alias("component"),
                )
            )
        # Checkpoint truncates lineage (round k must not replan 1..k-1);
        # the convergence sum rides the same job as an observed metric.
        # Convergence: min-propagation can only DECREASE labels over a
        # fixed row set, so for integral ids the exact label sum is
        # strictly monotone — equal sums ⟺ fixpoint. Non-integral ids
        # use the join-based changed-row count.
        new_labels, new_sum = checkpoint_with_sum(new_labels)
        if sum_based:
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            converged = changed_count(labels, new_labels) == 0
        labels = new_labels
        if converged:
            adj.unpersist()
            return labels
    adj.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter)"
    )


def cluster_size_histogram(components: DataFrame) -> DataFrame:
    """Power-of-2 histogram over connected-component sizes — the dedup
    AUDIT summary (x62): per bin 2^k ≤ size < 2^(k+1), how many clusters
    and how many member docs. Input is :func:`connected_components`
    output (id, component); both aggregations are bounded-key groupBys
    (component count ≤ n, bins ≤ ~40), integer-exact under any
    partitioning."""
    sizes = components.groupBy("component").agg(
        F.count(F.lit(1)).alias("sz")
    )
    lo = (
        F.pow(F.lit(2.0), F.floor(F.log2("sz"))).cast("bigint").alias("bucket_lo")
    )
    return (
        sizes.groupBy(lo)
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("sz").alias("n_docs"),
        )
        .orderBy("bucket_lo")
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    n_iter: int = 5,
    damping: float = 0.85,
    max_degree: int | str | None = None,
    edge_budget: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph — the
    centrality ranking a curation pipeline runs on its near-dup/overlap
    graph to find HUB documents (boilerplate templates, mirror roots)
    that pair with many others without any single cluster being large
    enough for the size-histogram (x62) to flag.

    Deterministic by construction: exactly ``n_iter`` power iterations
    (no data-dependent convergence test, so an unrolled-CTE SQL oracle
    can mirror it), per-neighbor contributions rounded to 12 then summed
    as decimal(27,18) (order-independent), each iteration's rank rounded
    to 9 — the same cross-engine float discipline as x34/x55. Isolated
    nodes hold the floor (1−d)/N; mass leaking through them is accepted
    (standard un-normalized variant) and identical across engines.

    100 TB shape: like :func:`connected_components` — the symmetrized
    adjacency is pre-partitioned on the join key and persisted (only the
    rank side moves per round), per-round state is one slim (id, rank)
    frame truncated with localCheckpoint, and per-iteration cost is one
    join + one aggregation. ``n_iter`` is fixed and small.

    Hub skew (round-5 verdict #3): the per-iteration join keys on
    ``src``, so a boilerplate-template hub — exactly the document this
    ranking exists to find — concentrates its out-edges in ONE task of
    every iteration. ``max_degree`` is the declared, opt-in hardening:
    each node keeps only its ``max_degree`` smallest-``dst`` out-edges
    (a deterministic total order — (src, dst) is distinct — so the SQL
    mirror reproduces it exactly). This CHANGES rank mass (a capped
    hub distributes less), which is why it is opt-in with a golden test
    rather than a silent default; the prune itself is one linear
    row_number pass over the already-src-partitioned adjacency. In-degree
    needs no cap: the contribution groupBy is a partial-aggregating sum,
    so a reducer sees at most one pre-combined row per map partition.

    Output: (id_col, pr DOUBLE round-9) for every node, isolated nodes
    included.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    # max_degree="auto": the enforced form of the hub discipline — run
    # the out-edge budget pre-check (same shape as the census's wedge
    # plan) and proceed / cap / refuse from its exact edge arithmetic.
    if max_degree == "auto":
        if edge_budget is None:
            raise ValueError('max_degree="auto" requires edge_budget')
        plan = out_edge_budget_plan(edges, edge_budget, src_col, dst_col)
        if plan["action"] == "refuse":
            raise DegreeBudgetExceeded(
                f"pagerank predicts {plan['predicted_edges']} retained "
                f"edges per iteration; even cap=1 exceeds edge_budget="
                f"{edge_budget}"
            )
        max_degree = plan["max_degree"]  # None → proceed uncapped
    elif edge_budget is not None:
        raise ValueError('edge_budget only applies with max_degree="auto"')
    adj = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .dropDuplicates(["src", "dst"])
        .repartition("src")
    )
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError("max_degree must be >= 1")
        w = Window.partitionBy("src").orderBy("dst")
        adj = (
            adj.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_degree)
            .drop("_rn")
        )
    adj = adj.persist()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    n = nodes.select(F.col(id_col).alias("id")).distinct().count()
    if n == 0:
        adj.unpersist()
        return nodes.select(
            F.col(id_col), F.lit(None).cast("double").alias("pr")
        )
    r0_val = 1.0 / n
    base = (1.0 - damping) / n
    ranks = (
        nodes.select(F.col(id_col).alias("id"))
        .distinct()
        .select("id", F.lit(r0_val).alias("pr"))
        .localCheckpoint()
    )
    zero = F.lit(0).cast("decimal(27,18)")
    for _ in range(n_iter):
        contrib = (
            adj.join(ranks, adj["src"] == ranks["id"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.round(F.col("pr") / F.col("_d"), 12)
                .cast("decimal(27,18)")
                .alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            ranks.select("id")
            .join(contrib, "id", "left")
            .select(
                "id",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * F.coalesce(F.col("_s"), zero).cast("double"),
                    9,
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    adj.unpersist()
    return ranks.select(F.col("id").alias(id_col), "pr")


def duck_pagerank_sql(
    nodes_select: str,
    und_select: str,
    id_out: str = "id",
    n_iter: int = 5,
    damping: float = 0.85,
    max_degree: int | None = None,
) -> str:
    """DuckDB mirror of :func:`pagerank` as an unrolled CTE chain (the
    fixed iteration count is what makes the mirror expressible without a
    recursive aggregate). ``nodes_select`` yields one column ``id``;
    ``und_select`` yields the already-SYMMETRIZED distinct edge list
    (src, dst). Same literal forcing (``_dlit``), same round-12 →
    decimal(27,18) → round-9 order as the Spark arm; ``max_degree``
    mirrors the Spark arm's deterministic smallest-``dst`` out-edge cap
    (row_number over the same (src, dst) total order)."""
    from .similarity import _dlit

    d = _dlit(damping)
    omd = _dlit(1.0 - damping)
    parts = [
        f"nodes AS ({nodes_select})",
        f"und0 AS ({und_select})"
        if max_degree is not None
        else f"und AS ({und_select})",
    ]
    if max_degree is not None:
        parts.append(
            "und AS (SELECT src, dst FROM ("
            "SELECT src, dst, row_number() OVER "
            "(PARTITION BY src ORDER BY dst) AS _rn FROM und0"
            f") WHERE _rn <= {int(max_degree)})"
        )
    parts += [
        "tot AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS _d FROM und GROUP BY src)",
        # _dlit forces a DOUBLE literal: bare 1.0 parses as DECIMAL and
        # decimal/bigint division is decimal, not the IEEE divide the
        # Spark arm performs driver-side.
        f"r0 AS (SELECT id, {_dlit(1.0)} / tot.n AS pr "
        "FROM nodes CROSS JOIN tot)",
    ]
    for i in range(n_iter):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"""{cur} AS (
      SELECT {prev}.id,
             round({omd} / tot.n + {d} * CAST(coalesce(s._s,
                     CAST(0 AS DECIMAL(27,18))) AS DOUBLE), 9) AS pr
      FROM {prev} CROSS JOIN tot LEFT JOIN (
        SELECT und.dst AS id,
               sum(CAST(round({prev}.pr / deg._d, 12) AS DECIMAL(27,18))) AS _s
        FROM und JOIN {prev} ON und.src = {prev}.id
                 JOIN deg ON und.src = deg.src
        GROUP BY und.dst
      ) s ON {prev}.id = s.id
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT id AS {id_out}, pr FROM r{n_iter} ORDER BY id"
    )


def degree_histogram(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Power-of-2 degree distribution of an undirected pair graph — the
    third leg of the dup-graph audit family beside cluster sizes (x62)
    and centrality (x71): a heavy tail here is the direct, cheap
    symptom of template hubs (the x71 skew hazard) and of an
    over-permissive pair threshold, visible WITHOUT running any
    iteration. Isolated nodes land in the degree-0 bucket (bucket_lo
    0), so the histogram always accounts for every node.

    Output: (bucket_lo BIGINT, n_nodes BIGINT), bucket_lo ≤ degree <
    2·bucket_lo (0 for isolated). Integer-exact under any partitioning.

    100 TB shape: one symmetrized-edge groupBy on the node key with
    map-side combine, a left join of the node list against the bounded
    per-node counts, and a ≤ ~40-bin groupBy."""
    und = (
        edges.select(F.col(src_col).alias("_id"), F.col(dst_col).alias("_o"))
        .union(
            edges.select(
                F.col(dst_col).alias("_id"), F.col(src_col).alias("_o")
            )
        )
        .dropDuplicates(["_id", "_o"])
    )
    deg = und.groupBy("_id").agg(F.count(F.lit(1)).alias("_d"))
    joined = (
        nodes.select(F.col(id_col).alias("_id"))
        .distinct()
        .join(deg, "_id", "left")
        .select(F.coalesce(F.col("_d"), F.lit(0)).alias("_d"))
    )
    bucket = F.when(F.col("_d") == 0, F.lit(0).cast("bigint")).otherwise(
        F.pow(F.lit(2.0), F.floor(F.log2("_d"))).cast("bigint")
    )
    return (
        joined.groupBy(bucket.alias("bucket_lo"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("bucket_lo")
    )


class DegreeBudgetExceeded(ValueError):
    """A graph op's predicted work exceeds its declared budget and no
    degree cap can buy ANY useful work under it — the op refuses to run
    rather than silently blowing past the budget or silently returning
    an all-capped husk. The message carries the exact predicted work so
    the caller can re-budget (x103's pattern: price it, then decide)."""


def _degree_counts(
    pairs: DataFrame, src_col: str, dst_col: str,
    keep_self_loops: bool = False,
):
    """(degree, n_nodes) rows of the symmetrized undirected graph.
    Driver-side list, bounded by the number of DISTINCT degree values
    (≤ max degree, not ≤ nodes) — the collect that makes the pre-check
    cheap. ``keep_self_loops=False`` matches :func:`triangle_census`'s
    degree definition (canonicalized, (v,v) dropped);
    ``keep_self_loops=True`` reproduces :func:`pagerank`'s adjacency
    construction EXACTLY (union both directions, dropDuplicates — a
    self-loop survives as one out-edge), so the edge-budget plan prices
    the same edges the iteration will join."""
    if keep_self_loops:
        adj = (
            pairs.select(
                F.col(src_col).alias("a"), F.col(dst_col).alias("b")
            )
            .union(
                pairs.select(
                    F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                )
            )
            .dropDuplicates(["a", "b"])
        )
    else:
        e = (
            pairs.select(
                F.least(src_col, dst_col).alias("a"),
                F.greatest(src_col, dst_col).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        adj = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("_d"))
    rows = (
        deg.groupBy("_d").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    return sorted((r._d, r._n) for r in rows)


def wedge_budget_plan(
    pairs: DataFrame,
    budget: int,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> dict:
    """Pre-flight wedge budget for :func:`triangle_census` — x89's
    degree histogram turned into an enforced decision (VERDICT r07
    'Next' #5): from one bounded degree aggregation, the EXACT wedge
    count the census will build (Σ_v d·(d−1)/2 — each vertex is the
    middle of exactly that many wedges) and, if it exceeds ``budget``,
    the largest degree cap whose capped census fits (capping excludes
    vertices with d > cap as wedge middles, so retained wedges =
    Σ_{d ≤ cap} n_d·d·(d−1)/2 — the same arithmetic the census's
    ``max_degree`` realizes).

    Returns a dict: ``action`` ∈ {"proceed", "cap", "refuse"},
    ``predicted_wedges`` (exact, uncapped), ``max_degree`` (None for
    proceed; the chosen cap for cap), ``retained_wedges`` (work the
    chosen action actually buys), ``n_capped_vertices``. "refuse" means
    even the best-fitting cap retains ZERO wedges — the budget cannot
    buy any useful work, so running would only produce an empty husk.

    100 TB shape: one edge canonicalization + one degree groupBy with
    map-side combine + a distinct-degree-bounded collect — strictly
    cheaper than the wedge join it prices, never runs it."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    counts = _degree_counts(pairs, src_col, dst_col)
    wedges = lambda d: d * (d - 1) // 2  # noqa: E731
    predicted = sum(n * wedges(d) for d, n in counts)
    if predicted <= budget:
        return {
            "action": "proceed",
            "predicted_wedges": predicted,
            "max_degree": None,
            "retained_wedges": predicted,
            "n_capped_vertices": 0,
            "budget": budget,
        }
    best_cap, retained = None, 0
    cum = 0
    for d, n in counts:  # ascending degrees; retained(c) is monotone
        cum += n * wedges(d)
        if cum <= budget:
            best_cap, retained = d, cum
    if best_cap is None or retained == 0:
        return {
            "action": "refuse",
            "predicted_wedges": predicted,
            "max_degree": None,
            "retained_wedges": 0,
            "n_capped_vertices": sum(n for _, n in counts),
            "budget": budget,
        }
    return {
        "action": "cap",
        "predicted_wedges": predicted,
        "max_degree": best_cap,
        "retained_wedges": retained,
        "n_capped_vertices": sum(n for d, n in counts if d > best_cap),
        "budget": budget,
    }


def out_edge_budget_plan(
    pairs: DataFrame,
    budget: int,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> dict:
    """Pre-flight per-iteration budget for :func:`pagerank`, same shape
    as :func:`wedge_budget_plan` but under PageRank's cost law: each
    iteration joins the symmetrized adjacency once, so work ∝ retained
    out-edges; an out-degree cap ``c`` keeps min(d, c) edges per node,
    retained(c) = Σ n_d·min(d, c). "refuse" when even cap=1 (one edge
    per non-isolated node) exceeds the budget. Degrees are computed
    from pagerank's OWN adjacency construction (self-loops kept), so
    the prediction prices exactly the edges the iteration joins."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    counts = _degree_counts(pairs, src_col, dst_col, keep_self_loops=True)
    predicted = sum(n * d for d, n in counts)
    if predicted <= budget:
        return {
            "action": "proceed",
            "predicted_edges": predicted,
            "max_degree": None,
            "retained_edges": predicted,
            "n_capped_vertices": 0,
            "budget": budget,
        }
    # retained(c) is monotone in c and c may be ANY integer ≥ 1 (not
    # just an observed degree): binary-search the largest fitting cap
    def retained_at(c: int) -> int:
        return sum(n * min(d, c) for d, n in counts)

    best_cap, retained = None, 0
    lo, hi = 1, max(d for d, _ in counts)
    while lo <= hi:
        mid = (lo + hi) // 2
        r = retained_at(mid)
        if r <= budget:
            best_cap, retained = mid, r
            lo = mid + 1
        else:
            hi = mid - 1
    if best_cap is None:
        return {
            "action": "refuse",
            "predicted_edges": predicted,
            "max_degree": None,
            "retained_edges": 0,
            "n_capped_vertices": sum(n for _, n in counts),
            "budget": budget,
        }
    return {
        "action": "cap",
        "predicted_edges": predicted,
        "max_degree": best_cap,
        "retained_edges": retained,
        "n_capped_vertices": sum(n for d, n in counts if d > best_cap),
        "budget": budget,
    }


def triangle_census(
    pairs: DataFrame,
    max_degree: int | str | None = None,
    wedge_budget: int | None = None,
) -> DataFrame:
    """Triangle census of an undirected pair graph — the transitivity
    audit beside the degree histogram (x89) and component sizes (x62):
    near-dup edges SHOULD be transitive (A≈B≈C ⇒ A≈C), so a corpus
    whose dup graph has many open wedges but few triangles is a
    threshold sitting on a cliff (borderline pairs break transitivity),
    while clique-rich graphs confirm stable template families.

    Input: (id_a, id_b) pairs, any orientation/duplication — edges are
    canonicalized (a < b, distinct) first. Output one row:
    (n_edges, n_wedges, n_triangles, closure_rate DOUBLE round-9) where
    n_wedges counts open 2-paths a–b–c (a < c) and closure_rate =
    3·triangles / (wedges + 3·triangles) — the global clustering
    coefficient over the SAME exact integers in both engines.

    100 TB shape: the standard distributed triangle join — edges ⋈
    edges on the shared middle vertex builds each wedge ONCE
    (b as the middle, a < c enforced), then a semi-join against the
    edge set closes it; work ∝ Σ_v deg(v)² (wedge count), the
    pair-engine's own law. No iteration, no window.

    ``max_degree`` is the wedge-budget guard for pathological graphs
    (template hubs turn Σ deg² quadratic — measured 13.8× on the
    salted 10× sweep, SCALE.md round-7 part 4): vertices above the cap
    are excluded as wedge MIDDLES (they still serve as endpoints), so
    when the cap binds, triangle/wedge counts become LOWER BOUNDS — a
    triangle loses one closed wedge per capped member, and the /3 fold
    undercounts accordingly; ``n_capped_vertices`` reports how many
    vertices were dropped so the truncation is never silent.
    Pick the cap from the x89 degree histogram — the cheap pre-check
    that predicts this op's wedge budget. Or let the engine pick it:
    ``max_degree="auto"`` with a ``wedge_budget`` runs
    :func:`wedge_budget_plan` first and PROCEEDS uncapped when the
    exact predicted wedge count fits, CAPS at the largest degree whose
    retained wedges fit, or REFUSES (raises
    :class:`DegreeBudgetExceeded`, message carries the prediction) when
    no cap buys any useful work — the documented discipline, enforced
    (VERDICT r07 'Next' #5)."""
    if max_degree == "auto":
        if wedge_budget is None:
            raise ValueError('max_degree="auto" requires wedge_budget')
        plan = wedge_budget_plan(pairs, wedge_budget)
        if plan["action"] == "refuse":
            raise DegreeBudgetExceeded(
                f"triangle census predicts {plan['predicted_wedges']} "
                f"wedges; no degree cap fits wedge_budget="
                f"{wedge_budget} with nonzero retained work"
            )
        max_degree = plan["max_degree"]  # None → proceed uncapped
    elif wedge_budget is not None:
        raise ValueError(
            'wedge_budget only applies with max_degree="auto"'
        )
    e = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    from .dedup import _persist

    e = _persist(e)
    # undirected adjacency: every edge in both directions
    adj = e.select("a", "b").unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    n_capped = 0
    if max_degree is not None:
        deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("_d"))
        hot = _persist(deg.filter(F.col("_d") > int(max_degree)).select("a"))
        n_capped = hot.count()  # bounded: ≤ nodes over the cap
        # exclude hot vertices as wedge MIDDLES only (adj drives the
        # middle side below; e — the closure side — keeps every edge)
        adj = adj.join(hot, "a", "left_anti")
    x, y = adj.alias("x"), adj.alias("y")
    # wedges centered at the shared vertex: x.a is the middle;
    # endpoints ordered (x.b < y.b) so each wedge counts once
    wedges = x.join(
        y,
        (F.col("x.a") == F.col("y.a")) & (F.col("x.b") < F.col("y.b")),
    ).select(
        F.col("x.b").alias("wa"),
        F.col("y.b").alias("wc"),
    )
    wedges = _persist(wedges)
    n_wedges_total = wedges.count()
    tri = wedges.join(
        e, (F.col("wa") == F.col("a")) & (F.col("wc") == F.col("b")),
        "left_semi",
    )
    n_tri_wedges = tri.count()  # closed wedges = 3 per triangle
    n_triangles = n_tri_wedges // 3
    n_edges = e.count()
    open_wedges = n_wedges_total - n_tri_wedges
    closure = (
        (3.0 * n_triangles) / (open_wedges + 3.0 * n_triangles)
        if (open_wedges + 3 * n_triangles) > 0
        else None
    )
    spark = pairs.sparkSession
    # round via F.round (HALF_UP — the engine the oracle mirrors), not
    # Python's banker's round
    return spark.createDataFrame(
        [(n_edges, open_wedges, n_triangles, closure, n_capped)],
        "n_edges bigint, n_wedges bigint, n_triangles bigint, "
        "closure_rate double, n_capped_vertices bigint",
    ).select(
        "n_edges", "n_wedges", "n_triangles",
        F.round("closure_rate", 9).alias("closure_rate"),
        "n_capped_vertices",
    )
