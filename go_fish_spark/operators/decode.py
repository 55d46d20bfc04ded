"""Trial-decode event matching — the reference's schema-on-read cascade.

Reference semantics (`event_types.go:52-65`, `pipeline.go:393-405`): raw
bytes are matched by trying every registered decoder in sequence until one
succeeds; events matching no decoder are logged and dropped.

Spark-first design: each candidate event type is a (name, StructType,
required_fields) triple; the raw ``value`` column is decoded with a
``from_json`` **cascade** — first candidate whose required fields are all
non-null wins. This fixes the reference's nondeterminism ("first match
wins" depended on plugin registration order and Go's lenient JSON unmarshal,
SURVEY §7 hard-point 1): precedence here is the explicit list order, and
discrimination is by required fields, not decode success alone.

The whole cascade is one projection — no UDFs, no shuffle; unmatched rows
go to a dead-letter branch instead of being silently dropped (upgrade over
the reference's log-and-drop).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class EventType:
    """≡ the eventType plugin interface Name()/Decode() (`event_types.go:
    13-16`), declaratively: a name, a schema, and the fields that must be
    present for a payload to count as this type."""

    name: str
    schema: T.StructType
    required: tuple[str, ...] = ()


def decode_cascade(
    df: DataFrame, raw_col: str, event_types: list[EventType]
) -> DataFrame:
    """Add ``event_type_name`` (string, null = unmatched) and one struct
    column per candidate type (``decoded_<name>``, null unless matched).

    Matching = JSON parses AND all required fields non-null; precedence =
    list order (deterministic, unlike `event_types.go:52-65`).
    """
    out = df
    for et in event_types:
        parsed = F.from_json(F.col(raw_col), et.schema)
        ok = F.lit(True)
        for req in et.required:
            ok = ok & parsed[req].isNotNull()
        out = out.withColumn(f"_try_{et.name}", F.when(ok, parsed))

    name_expr: Column = F.lit(None).cast("string")
    # Build the precedence cascade back-to-front so earlier types win.
    for et in reversed(event_types):
        name_expr = F.when(
            F.col(f"_try_{et.name}").isNotNull(), F.lit(et.name)
        ).otherwise(name_expr)

    out = out.withColumn("event_type_name", name_expr)
    for et in event_types:
        out = out.withColumn(
            f"decoded_{et.name}",
            F.when(F.col("event_type_name") == et.name, F.col(f"_try_{et.name}")),
        ).drop(f"_try_{et.name}")
    return out


def matched(df: DataFrame) -> DataFrame:
    """Events that decoded to some type."""
    return df.filter(F.col("event_type_name").isNotNull())


def dead_letter(df: DataFrame) -> DataFrame:
    """Events matching no decoder — the reference logs and drops these
    (`pipeline.go:395-399`); we keep them addressable as a branch."""
    return df.filter(F.col("event_type_name").isNull())
