"""Sharded corpus writer (sources/sharding.py): one file per shard dir,
manifest totals, deterministic assignment, and read-side partition
pruning."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from conftest import SF_SMALL
from go_fish_spark.catalog import table
from go_fish_spark.operators.sampling import split_assign
from go_fish_spark.sources import sharding


def _curated(spark):
    return table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "n_chars",
        split_assign("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
    )


def test_write_sharded_layout_and_manifest(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = _curated(spark)
    manifest = sharding.write_sharded(
        docs, path, "doc_id", n_shards=8,
        partition_cols=["split"], size_col="n_chars", sort_col="doc_id",
    )
    # exactly one data file per (split, shard) directory
    shard_dirs = glob.glob(f"{path}/split=*/shard=*")
    assert shard_dirs
    for d in shard_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    # manifest totals == corpus totals
    m = manifest.agg(F.sum("n_docs"), F.sum("tok_total")).collect()[0]
    tot = docs.agg(F.count(F.lit(1)), F.sum("n_chars")).collect()[0]
    assert (m[0], m[1]) == (tot[0], tot[1])
    # round trip preserves every row
    back = sharding.read_sharded(spark, path)
    assert back.count() == docs.count()
    assert set(back.columns) >= {"doc_id", "text", "split", "shard"}


def test_sharded_read_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "corpus")
    sharding.write_sharded(
        _curated(spark), path, "doc_id", n_shards=4, partition_cols=["split"]
    )
    df = sharding.read_sharded(spark, path).filter(F.col("split") == "train")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "split" in plan
    # pruned read returns only the train split
    assert df.select("split").distinct().collect() == [("train",)]


def test_shard_assignment_is_deterministic_and_balanced(spark):
    docs = table(spark, SF_SMALL, "documents")
    a = {r.doc_id: r.shard for r in sharding.with_shard(docs, "doc_id", 16).collect()}
    b = {r.doc_id: r.shard for r in sharding.with_shard(docs, "doc_id", 16).collect()}
    assert a == b
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    n, k = len(a), 16
    # md5-uniform: no shard more than 3x the mean at 500 docs/16 shards
    assert max(counts.values()) <= 3 * (n / k)


def test_stream_sharded_delivery_matches_batch_layout(spark, tmp_path):
    """Streaming delivery lands rows in the same shard directories the
    batch writer would choose (shard membership is a pure key hash), and
    the round trip preserves every row."""
    import json

    indir = tmp_path / "in"
    indir.mkdir()
    rows = [dict(doc_id=i, text=f"doc {i}", split="train" if i % 5 else "val")
            for i in range(40)]
    (indir / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("doc_id long, text string, split string")
        .json(str(indir))
    )
    out = str(tmp_path / "corpus")
    q = sharding.stream_sharded(
        stream, out, str(tmp_path / "ckpt"), "doc_id",
        n_shards=4, partition_cols=["split"],
    )
    q.awaitTermination(120)

    back = spark.read.parquet(out)
    assert back.count() == len(rows)
    # every row sits in the shard directory its key hash dictates
    expected = {
        r.doc_id: r.shard
        for r in sharding.with_shard(
            spark.createDataFrame(
                [(r["doc_id"],) for r in rows], "doc_id long"
            ),
            "doc_id", 4,
        ).collect()
    }
    got = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    assert got == expected


def test_write_sharded_append_keeps_manifest_invariant(spark, tmp_path):
    """mode="append" delivers a second batch into the same layout; the
    manifest must describe EVERYTHING now at path — still one row per
    (partition, shard), totals covering both deliveries (it is rebuilt
    from the written files, not appended to)."""
    path = str(tmp_path / "corpus")
    docs = _curated(spark)
    sharding.write_sharded(
        docs.filter(F.col("doc_id") % 2 == 0), path, "doc_id",
        n_shards=4, partition_cols=["split"],
    )
    manifest = sharding.write_sharded(
        docs.filter(F.col("doc_id") % 2 == 1), path, "doc_id",
        n_shards=4, partition_cols=["split"], mode="append",
    )
    dup_keys = (
        manifest.groupBy("split", "shard").count()
        .filter(F.col("count") > 1).collect()
    )
    assert dup_keys == []
    assert manifest.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    assert sharding.read_sharded(spark, path).count() == docs.count()


def test_write_sharded_empty_input_yields_empty_manifest(spark, tmp_path):
    """Round-5 ADVICE fix: an empty curated split must produce an empty
    manifest, not an unable-to-infer-schema crash — the manifest pass
    re-reads the written path with the writer's schema pinned."""
    path = str(tmp_path / "corpus")
    docs = _curated(spark).filter(F.lit(False))
    manifest = sharding.write_sharded(
        docs, path, "doc_id", n_shards=8,
        partition_cols=["split"], size_col="n_chars",
    )
    assert manifest.count() == 0
    assert {"n_docs", "tok_total", "shard", "split"} <= set(manifest.columns)


def test_compact_shards_one_file_per_dir_and_data_preserved(spark, tmp_path):
    """compact_shards: after an append delivery fragments the shard
    directories, compaction restores exactly ONE data file per shard
    dir, preserves every row bit-for-bit, reuses the existing shard
    assignment (no row changes shard), and refreshes the manifest."""
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = str(tmp_path / "corpus")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    sharding.write_sharded(first, path, "doc_id", n_shards=4)
    sharding.write_sharded(second, path, "doc_id", n_shards=4, mode="append")

    def files_per_shard():
        return {
            d: len(glob.glob(os.path.join(path, d, "*.parquet")))
            for d in os.listdir(path)
            if d.startswith("shard=")
        }

    fragmented = files_per_shard()
    assert any(n > 1 for n in fragmented.values())
    before = {
        (r.doc_id, r.text, r.shard)
        for r in sharding.read_sharded(spark, path).collect()
    }

    manifest = sharding.compact_shards(spark, path)
    compacted = files_per_shard()
    assert set(compacted) == set(fragmented)
    assert all(n == 1 for n in compacted.values())
    after = {
        (r.doc_id, r.text, r.shard)
        for r in sharding.read_sharded(spark, path).collect()
    }
    assert after == before
    assert manifest.agg(F.sum("n_docs")).collect()[0][0] == len(before)
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_compact_shards_rolls_back_on_failed_swap(spark, tmp_path, monkeypatch):
    """Round-6 ADVICE regression: if the second rename of the directory
    swap fails, compact_shards renames the old tree back so `path` is
    never left empty — the corpus stays readable and the error
    propagates."""
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = str(tmp_path / "corpus")
    sharding.write_sharded(docs, path, "doc_id", n_shards=4)
    before = {
        (r.doc_id, r.shard)
        for r in sharding.read_sharded(spark, path).collect()
    }

    real_rename = os.rename
    calls = []

    def flaky_rename(src, dst):
        calls.append((src, dst))
        # fail ONLY the tmp → path rename (second of the swap); the
        # rollback rename (old → path) must go through
        if src.endswith("__compact_tmp") and dst == path:
            raise OSError("simulated rename failure")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky_rename)
    try:
        sharding.compact_shards(spark, path)
        raised = False
    except OSError:
        raised = True
    monkeypatch.setattr(os, "rename", real_rename)
    assert raised
    # rollback restored the original tree under `path`
    after = {
        (r.doc_id, r.shard)
        for r in sharding.read_sharded(spark, path).collect()
    }
    assert after == before
    assert not os.path.exists(path + "__compact_old")
