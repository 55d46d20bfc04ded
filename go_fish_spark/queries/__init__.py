"""Declared query inventory (SURVEY.md §2.7) — the correctness contract.

Each query is registered with:
  * a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` built from the
    operator library, and
  * (where SQL-expressible) a DuckDB oracle SQL string producing the same
    rows with the same column names, run by the driver side-by-side.

Register via the ``@query`` decorator; ``REGISTRY`` preserves insertion
order. ``__spark_entry__.py`` exposes this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all_modules() -> None:
    # Import order defines registry order (q01..q20, then extensions).
    from . import core  # noqa: F401
    from . import relational  # noqa: F401
    from . import stateful  # noqa: F401
    from . import coverage  # noqa: F401
    from . import extensions  # noqa: F401


_load_all_modules()
