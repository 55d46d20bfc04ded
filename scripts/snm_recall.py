#!/usr/bin/env python
"""Measure single-key vs multi-key sorted-neighborhood RECALL on a
head-salted clique corpus (the adversarial case for prefix blocking).

Corpus: sf0.01 documents ∪ one copy per doc with a salt token PREPENDED
(prefix diverges — the x115 single-key blind spot) ∪ one copy with the
first two words swapped. Ground truth = exact inverted-index Jaccard
pairs (x04 discipline) at the same threshold; recall = |found ∩ GT|/|GT|.

Results land in SCALE.md (r8 verdict Next #3 done-condition).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_fish_spark.catalog import table  # noqa: E402
from go_fish_spark.operators import dedup  # noqa: E402
from go_fish_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="snm-recall")
    spark.sparkContext.setLogLevel("ERROR")
    base = table(spark, SF, "documents").select("doc_id", "text")
    n = base.count()
    head_salted = base.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("zz"), (F.col("doc_id") % 97).cast("string"),
            F.lit("salt "), F.col("text"),
        ).alias("text"),
    )
    ws = F.split("text", " ")
    swapped = base.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.when(
            F.size(ws) >= 2,
            F.concat_ws(
                " ",
                F.element_at(ws, 2),
                F.element_at(ws, 1),
                F.array_join(F.slice(ws, 3, F.size(ws)), " "),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    corpus = base.unionByName(head_salted).unionByName(swapped)

    gt = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            corpus, "doc_id", "text", k=3, threshold=0.3
        ).collect()
    }

    def recall(keys) -> tuple[float, int]:
        found = {
            (r["id_a"], r["id_b"])
            for r in dedup.sorted_neighborhood_pairs(
                corpus, "doc_id", "text", window=3, key_len=20,
                threshold=0.3, keys=keys,
            ).collect()
        }
        hit = len(found & gt)
        return (hit / len(gt) if gt else 1.0), hit

    r1, h1 = recall(("prefix",))
    r3, h3 = recall(dedup._SNM_KEYS)
    print(
        f"corpus={3 * n} docs  ground_truth={len(gt)} pairs\n"
        f"single-key (prefix):            recall={r1:.3f} ({h1}/{len(gt)})\n"
        f"multi-key (prefix+rev+tokens):  recall={r3:.3f} ({h3}/{len(gt)})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
