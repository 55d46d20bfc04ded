"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Everything is delegated to the ``go_fish_spark`` package; the registry in
``go_fish_spark.queries`` is the single source of truth for the inventory
(SURVEY.md §2.7 + extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_fish_spark.queries import REGISTRY, resolve_oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end curation
    pipeline (x20) — language ID → quality gate → exact dedup → near-dup
    connected components → canonical doc per cluster → train/val/test
    split, as one composed DataFrame plan (every stage oracle-verified
    individually AND in composition at sf0.01)."""
    return REGISTRY["x20_curation_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each hash-checkable query.

    Data-dependent oracles (x15/x26 embed quantizer centroids fit from the
    embeddings table) are resolved against the driver's sf0.01 here; local
    tests resolve the same callables against their own SF dir."""
    out: dict[str, str] = {}
    for name, qd in REGISTRY.items():
        sql = resolve_oracle(qd)
        if sql is not None:
            out[name] = sql
    return out
