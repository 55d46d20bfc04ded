"""Projection / construction / scalar-derivation operators.

Reference semantics reproduced:
  * OutputEvent construction — build the canonical output record from event
    fields (rename, literal, nested extraction): `s2s_rules/
    cloudTrail_s2s_join.go:80-96`, `output/event.go:9-20`.
  * principal-name derivation — the 6-way switch over ``UserIdentity.Type``
    producing ``"user/X"``, ``"account/Y"``, ... : `s2s_rules/
    cloudTrail_s2s_join.go:98-130` (same pattern `agg_rules/
    cloudTrail_agg.go:98-115`).
  * dispatch/split — ``switch EventName`` routing events to different
    handling branches: `s2s_rules/cloudTrail_s2s_join.go:43-56`.

All are pure Column expressions (when/otherwise + concat), fully inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical output schema ≡ OutputEvent (`output/event.go:9-20`).
OUTPUT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("level", T.StringType()),  # error|warn|info (event.go:22-55)
        T.StructField("event_id", T.StringType()),
        T.StructField("entity", T.StringType()),
        T.StructField("source_ip", T.StringType()),
        T.StructField("body", T.MapType(T.StringType(), T.StringType())),
        T.StructField("occurrences", T.IntegerType()),
    ]
)

LEVELS = ("error", "warn", "info")


def principal_name(kind: Column, ident: Column, mapping: dict[str, str], default_prefix: str = "root") -> Column:
    """``when/otherwise`` chain ≡ generatePrincipalName's 6-way switch
    (`cloudTrail_s2s_join.go:98-130`): prefix chosen by ``kind``, then
    ``concat(prefix, '/', ident)``."""
    ident_s = ident.cast("string")
    expr = None
    for kind_value, prefix in mapping.items():
        cond = kind == F.lit(kind_value)
        branch = F.concat(F.lit(prefix + "/"), ident_s)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    default = F.concat(F.lit(default_prefix + "/"), ident_s)
    return default if expr is None else expr.otherwise(default)


def dispatch(df: DataFrame, key_col: str, branches: dict[str, list[Column]]) -> dict[str, DataFrame]:
    """Split a stream by a dispatch key into per-branch projections
    (≡ `cloudTrail_s2s_join.go:43-56`). Returns {key_value: projected df}."""
    return {
        value: df.filter(F.col(key_col) == F.lit(value)).select(*cols)
        for value, cols in branches.items()
    }
