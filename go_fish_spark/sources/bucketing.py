"""Bucketed table layout — pre-shuffled storage for co-located joins.

The reference reads raw streams and has no storage layout at all; at the
100 TB target, the dominant cost of the repeated fact⋈fact join
(lineitem⋈orders and friends) is re-shuffling both sides on every query.
Bucketing amortizes that shuffle into the WRITE: both tables are stored
hash-partitioned into the same number of buckets on the join key, so any
equi-join (or groupBy) on that key reads co-located buckets and plans NO
Exchange on either side — verified by tests/test_bucketing.py, which
asserts the bucketed join plan is exchange-free while the plain-parquet
join shuffles both sides.

Rules of thumb encoded here:
  * bucket counts must MATCH (or divide) across join partners;
  * sortBy(join_key) makes the per-bucket merge sort-free too;
  * bucket pruning applies to point predicates on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table and
    return the re-read DataFrame carrying the bucket metadata.

    One shuffle now, zero shuffles for every later join/aggregation on
    ``bucket_cols`` against a partner table bucketed the same way."""
    spark = df.sparkSession
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)
    return spark.table(table_name)
