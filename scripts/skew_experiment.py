#!/usr/bin/env python
"""Skew experiment: measure what actually mitigates hot keys at scale.

Three claims this repo's scale notes make, demonstrated with numbers:

1. **groupBy skew is a non-problem** — hash aggregation's map-side
   partial combine collapses a hot key to one row per input partition
   before the exchange, so a 50%-hot-key aggregation costs the same as a
   uniform one (salting an aggregation, q50, is a portability/layout
   tool, not a wall-clock fix).
2. **JOIN skew is the real hazard** — a sort-merge join lands the hot
   key's entire probe side in ONE task; the straggler sets the stage
   wall.
3. **AQE skew-join splits it back** — `spark.sql.adaptive.skewJoin`
   subdivides the oversized partition at runtime (duplicating the
   matching build rows), restoring parallelism with no query rewrite.

Usage: python scripts/skew_experiment.py [n_rows]    (default 5_000_000)
Prints one JSON line with the measured walls.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(df) -> float:
    t0 = time.perf_counter()
    df.count()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    import pyspark.sql.functions as F

    from go_fish_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark(app_name="skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # 90% of fact rows share key 0; the rest spread over 100k keys. The
    # 64-byte payload makes partition BYTES (what AQE's skew detector
    # sees) track the row skew.
    skewed = F.when(F.rand(7) < 0.9, F.lit(0)).otherwise(
        (F.rand(11) * 100_000).cast("long")
    )
    pay = F.repeat(F.lit("x"), 64).alias("pay")
    fact_skew = spark.range(n).select(
        skewed.alias("k"), F.col("id").alias("v"), pay
    ).localCheckpoint()
    fact_uniform = spark.range(n).select(
        (F.rand(13) * 100_000).cast("long").alias("k"), F.col("id").alias("v"), pay
    ).localCheckpoint()
    dim = spark.range(100_001).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
    ).localCheckpoint()

    results = {}

    # 1. aggregation: skewed vs uniform key distribution
    results["agg_uniform"] = timed(fact_uniform.groupBy("k").agg(F.sum("v")))
    results["agg_skewed"] = timed(fact_skew.groupBy("k").agg(F.sum("v")))

    # 2/3. join: force sort-merge (no broadcast), toggle AQE skew-join.
    def smj(fact, skew_join: bool):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        try:
            # aggregate over the dim column so the join output is consumed
            # (a bare count() lets Catalyst prune the probe payload).
            t0 = time.perf_counter()
            fact.join(dim, "k").agg(F.sum("attr")).collect()
            return round(time.perf_counter() - t0, 2)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
            spark.conf.unset(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
            )
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    results["join_uniform_smj"] = smj(fact_uniform, skew_join=False)
    results["join_skewed_smj_no_aqe_skew"] = smj(fact_skew, skew_join=False)
    results["join_skewed_smj_aqe_skew"] = smj(fact_skew, skew_join=True)

    print(json.dumps({"n_rows": n, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
