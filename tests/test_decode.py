"""Trial-decode cascade tests (≡ `event_types.go:52-65`,
`pipeline.go:393-405`): ordered candidates, required-field discrimination,
dead-letter branch for unmatched payloads."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from go_fish_spark.operators import decode


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        ('{"eventName": "AssumeRole", "eventTime": "2024-01-01T00:00:00Z"}',),
        ('{"str": "a"}',),  # ≡ ExampleType (example.go:3-11)
        ("not json at all",),
        ('{"unrelated": 1}',),
    ]
    return spark.createDataFrame(rows, "value string")


TYPES = [
    decode.EventType(
        name="cloudtrail",
        schema=T.StructType(
            [
                T.StructField("eventName", T.StringType()),
                T.StructField("eventTime", T.TimestampType()),
            ]
        ),
        required=("eventName",),
    ),
    decode.EventType(
        name="example",
        schema=T.StructType([T.StructField("str", T.StringType())]),
        required=("str",),
    ),
]


def test_cascade_matches_in_order(raw):
    out = decode.decode_cascade(raw, "value", TYPES)
    got = {r.value: r.event_type_name for r in out.collect()}
    assert got['{"eventName": "AssumeRole", "eventTime": "2024-01-01T00:00:00Z"}'] == "cloudtrail"
    assert got['{"str": "a"}'] == "example"
    assert got["not json at all"] is None
    assert got['{"unrelated": 1}'] is None


def test_decoded_struct_populated_only_for_match(raw):
    out = decode.decode_cascade(raw, "value", TYPES)
    m = {r.value: r for r in out.collect()}
    ct = m['{"eventName": "AssumeRole", "eventTime": "2024-01-01T00:00:00Z"}']
    assert ct.decoded_cloudtrail.eventName == "AssumeRole"
    assert ct.decoded_example is None
    ex = m['{"str": "a"}']
    assert ex.decoded_example.str == "a"
    assert ex.decoded_cloudtrail is None


def test_dead_letter_branch(raw):
    out = decode.decode_cascade(raw, "value", TYPES)
    dead = [r.value for r in decode.dead_letter(out).collect()]
    live = [r.value for r in decode.matched(out).collect()]
    assert sorted(dead) == ["not json at all", '{"unrelated": 1}']
    assert len(live) == 2


def test_precedence_is_list_order(spark):
    """A payload satisfying BOTH candidates goes to the first — the
    deterministic fix for the reference's registration-order dependence
    (SURVEY §7 hard-point 1)."""
    both = spark.createDataFrame(
        [('{"eventName": "X", "str": "y"}',)], "value string"
    )
    out = decode.decode_cascade(both, "value", TYPES)
    assert out.collect()[0].event_type_name == "cloudtrail"
    flipped = decode.decode_cascade(both, "value", list(reversed(TYPES)))
    assert flipped.collect()[0].event_type_name == "example"
