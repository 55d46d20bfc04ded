#!/usr/bin/env python
"""Hub-skew experiment for PageRank (round-5 verdict #3).

The per-iteration join in ``operators.graph.pagerank`` keys on ``src``;
a boilerplate-template hub — one node appearing in a large fraction of
all edges — concentrates its out-adjacency in ONE hash partition, so one
task carries that share of every iteration. This script builds exactly
that synthetic (one hub in ~30% of edges, the verdict's shape) and
measures:

  1. the adjacency partition-size skew WITHOUT the cap (max / mean rows
     per partition — the straggler witness; task wall is linear in
     partition rows for this join+agg), and WITH ``max_degree``;
  2. end-to-end pagerank wall, uncapped vs capped.

``max_degree`` is the declared opt-in fix (it changes rank mass — golden
in tests/test_profile.py::test_pagerank_max_degree_golden_vs_duckdb).
AQE's skew-join splitter does NOT cover this shape out of the box: with
the rank side small enough to broadcast there is no sort-merge join for
the splitter to act on, and the oversized map partition survives —
which is why the cap is the offered mitigation rather than "AQE handles
it" (contrast scripts/skew_experiment.py, where SMJ + AQE does).

Usage: python scripts/hub_experiment.py [n_nodes] [n_edges]
Defaults 200_000 nodes / 1_000_000 edges. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from go_fish_spark.operators.graph import pagerank
    from go_fish_spark.session import get_spark

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark(app_name="hub-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # 30% of edges touch hub node 0; the rest pair uniform random-ish
    # (deterministic hash mixing — no RNG) non-hub nodes.
    hub_cut = int(n_edges * 0.3)
    edges = (
        spark.range(n_edges)
        .select(
            F.when(F.col("id") < hub_cut, F.lit(0))
            .otherwise(
                1 + F.pmod(F.xxhash64("id"), F.lit(n_nodes - 1))
            )
            .alias("id_a"),
            (1 + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_nodes - 1))).alias(
                "id_b"
            ),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    nodes = spark.range(n_nodes).select(F.col("id"))

    def adj_skew(max_degree):
        """max/mean rows per partition of the symmetrized, src-hash-
        partitioned adjacency — the shape every iteration's join task
        sees. This is the straggler witness: one task's wall is linear
        in its partition's rows."""
        adj = (
            edges.select("id_a", "id_b")
            .union(edges.select(F.col("id_b"), F.col("id_a")))
            .dropDuplicates(["id_a", "id_b"])
            .repartition(F.col("id_a"))
        )
        if max_degree is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("id_a").orderBy("id_b")
            adj = (
                adj.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= max_degree)
                .repartition(F.col("id_a"))
            )
        sizes = [
            r.n
            for r in adj.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        hub_rows = adj.filter(F.col("id_a") == 0).count()
        return max(sizes), round(sum(sizes) / len(sizes), 1), hub_rows

    def timed_pr(max_degree):
        t0 = time.perf_counter()
        pagerank(
            nodes, edges, src_col="id_a", dst_col="id_b",
            n_iter=5, max_degree=max_degree,
        ).count()
        return round(time.perf_counter() - t0, 2)

    mx_u, mean_u, hub_u = adj_skew(None)
    mx_c, mean_c, hub_c = adj_skew(64)
    out = {
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "hub_edge_share": 0.3,
        "adj_rows_per_partition_uncapped": {"max": mx_u, "mean": mean_u},
        "adj_rows_per_partition_capped64": {"max": mx_c, "mean": mean_c},
        "hub_src_rows": {"uncapped": hub_u, "capped64": hub_c},
        "pagerank_wall_uncapped_s": timed_pr(None),
        "pagerank_wall_capped64_s": timed_pr(64),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
