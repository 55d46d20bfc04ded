"""Vector column expressions (dot product, norms, cosine) over
``array<float>`` embedding columns.

Built from higher-order functions (``zip_with`` + ``aggregate``), so the
math runs JVM-side per row with zero Python involvement. All arithmetic is
promoted to double *before* accumulation: float accumulation would make the
result depend on nothing but still diverge (~1e-6) from any double-based
oracle, breaking hash comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def duck_cosine(a: str, b: str, dim: int) -> str:
    """DuckDB mirror of :func:`cosine`: explicit double-promoted
    sequential sums (NOT list_cosine_similarity, whose float accumulation
    order is unspecified)."""

    def s(expr: str) -> str:
        return f"list_sum([{expr} for i in range(1, {dim + 1})])"

    d = s(f"{a}[i]::DOUBLE * {b}[i]::DOUBLE")
    na = s(f"{a}[i]::DOUBLE * {a}[i]::DOUBLE")
    nb = s(f"{b}[i]::DOUBLE * {b}[i]::DOUBLE")
    return f"({d} / (sqrt({na}) * sqrt({nb})))"
