"""Determinism helpers shared by queries and their oracles.

The driver hash-compares Spark output to DuckDB output, so every emitted
value must be bit-identical across engines:

* **Timestamps** → formatted UTC strings (both engines truncate to seconds
  the same way; the session is pinned to UTC in session.py).
* **Money sums** → the doubles in testdata are exact 2-decimal values, so we
  cast to DECIMAL(18,2) *before* summing. Decimal addition is exact and
  order-independent, unlike double addition, whose result would depend on
  Spark's partitioning. The final CAST back to DOUBLE is deterministic on
  both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S"


def ts_str(col: Column | str) -> Column:
    """Spark side: timestamp → canonical UTC string."""
    return F.date_format(col, SPARK_TS_FMT)


def duck_ts_str(expr: str) -> str:
    """DuckDB side: timestamp expression → canonical UTC string."""
    return f"strftime({expr}, '{DUCK_TS_FMT}')"


def money_sum(col: Column | str) -> Column:
    """Order-independent exact sum of a 2-decimal double column (Spark)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double")


def duck_money_sum(expr: str) -> str:
    """DuckDB mirror of :func:`money_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def money_sum6(col: Column | str) -> Column:
    """Exact sum for derived money expressions (price×discount products
    need 6 fractional digits before the sum is exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(22,6)")).cast("double")
