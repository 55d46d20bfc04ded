"""Keyed parquet upsert (operators/upsert.py + the parquet_upsert sink
type): MERGE semantics, partition-pruned rewrite, replay idempotence."""

from __future__ import annotations

import os

import pytest


def _t(spark, rows):
    return spark.createDataFrame(rows, "k long, part string, v string")


def _read(spark, path):
    return {
        (r.k, r.part, r.v) for r in spark.read.parquet(path).collect()
    }


def test_upsert_merges_and_appends(spark, tmp_path):
    from go_fish_spark.operators.upsert import upsert_parquet

    path = str(tmp_path / "tbl")
    upsert_parquet(spark, path, _t(spark, [(1, "a", "v1"), (2, "a", "v2")]), ["k"])
    upsert_parquet(spark, path, _t(spark, [(2, "a", "v2b"), (3, "b", "v3")]), ["k"])
    assert _read(spark, path) == {(1, "a", "v1"), (2, "a", "v2b"), (3, "b", "v3")}


def test_partitioned_upsert_rewrites_only_affected_partitions(spark, tmp_path):
    from go_fish_spark.operators.upsert import upsert_parquet

    path = str(tmp_path / "tbl")
    upsert_parquet(
        spark,
        path,
        _t(spark, [(1, "a", "v1"), (2, "b", "v2"), (3, "b", "v3")]),
        ["k"],
        partition_col="part",
    )
    untouched = {
        f: os.path.getmtime(os.path.join(path, "part=a", f))
        for f in os.listdir(os.path.join(path, "part=a"))
        if f.endswith(".parquet")
    }
    # update a key in partition b only
    upsert_parquet(
        spark, path, _t(spark, [(2, "b", "v2b")]), ["k"], partition_col="part"
    )
    after = {
        f: os.path.getmtime(os.path.join(path, "part=a", f))
        for f in os.listdir(os.path.join(path, "part=a"))
        if f.endswith(".parquet")
    }
    assert after == untouched  # partition a: same files, same mtimes
    assert _read(spark, path) == {(1, "a", "v1"), (2, "b", "v2b"), (3, "b", "v3")}


def test_upsert_replay_is_idempotent(spark, tmp_path):
    from go_fish_spark.operators.upsert import upsert_batch_writer

    path = str(tmp_path / "tbl")
    w = upsert_batch_writer(path, ["k"])
    w(_t(spark, [(1, "a", "v1")]), 0)
    batch = _t(spark, [(1, "a", "v1b"), (2, "a", "v2")])
    w(batch, 1)
    w(batch, 1)  # re-delivery of the same micro-batch
    assert _read(spark, path) == {(1, "a", "v1b"), (2, "a", "v2")}


def test_upsert_requires_keys(spark, tmp_path):
    from go_fish_spark.operators.upsert import upsert_parquet

    with pytest.raises(ValueError, match="key_cols"):
        upsert_parquet(spark, str(tmp_path / "t"), _t(spark, [(1, "a", "v")]), [])


def test_pipeline_parquet_upsert_sink(spark, tmp_path):
    """The sink type is spec-addressable (batch dispatch)."""
    from go_fish_spark.plans.compiler import write_sink
    from go_fish_spark.plans.spec import SinkSpec

    path = str(tmp_path / "tbl")
    sink = SinkSpec(name="out", type="parquet_upsert",
                    options={"path": path, "keys": ["k"]})
    write_sink(_t(spark, [(1, "a", "v1")]), sink)
    write_sink(_t(spark, [(1, "a", "v1b"), (2, "a", "v2")]), sink)
    assert _read(spark, path) == {(1, "a", "v1b"), (2, "a", "v2")}
