"""Predicate filters — the reference's stateless rule patterns.

Reference semantics reproduced (each cited):
  * equality filter      — `testdata/rules/a.go:12-18` (``Str == "a"``)
  * length filter        — `testdata/rules/length.go:12-18` (``len(Str) == 1``)
  * regex filter         — `examples/certstream/rules/domain_cert_issued.go:19,40`
  * array-exists filter  — `domain_cert_issued.go:39-41` (any element of
    ``AllDomains`` matches ``^www.*``)

A go-fish rule returning nil drops the event (`rule.go:15-22`); here that is
simply ``df.filter(pred)``, which Catalyst pushes into the parquet scan
(PushedFilters) — the reference evaluates every predicate in Go, per event,
after full deserialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eq_filter(df: DataFrame, col: str, value) -> DataFrame:
    return df.filter(F.col(col) == F.lit(value))


def length_filter(df: DataFrame, col: str, predicate: Column | None = None, *, lt: int | None = None, eq: int | None = None) -> DataFrame:
    c = F.length(F.col(col))
    if predicate is not None:
        return df.filter(predicate)
    if lt is not None:
        return df.filter(c < lt)
    if eq is not None:
        return df.filter(c == eq)
    raise ValueError("one of predicate/lt/eq required")


def regex_filter(df: DataFrame, col: str, pattern: str) -> DataFrame:
    return df.filter(F.col(col).rlike(pattern))


def array_exists_filter(df: DataFrame, array_col: Column, pattern: str) -> DataFrame:
    """Keep rows where any array element matches ``pattern``.

    `domain_cert_issued.go:39-41` loops over the array in Go; Spark's
    ``exists`` higher-order function evaluates JVM-side inside codegen with
    no explode/shuffle.
    """
    return df.filter(F.exists(array_col, lambda x: x.rlike(pattern)))
