"""Round-13 regressions: the four r12 ADVICE findings (BPE mirror
degenerate-corpus parity, lease-dir normalization, prune key guard,
lease renewal/fencing) plus the round's sig-store compaction and
recall-monitor work."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# --- ADVICE r12 #2: BPE DuckDB mirror on a vocabulary-exhausting corpus -------


def test_bpe_mirror_parity_when_vocab_exhausts(spark, duck):
    """A corpus whose pair population exhausts before n_merges used to
    EMPTY the DuckDB mirror (empty b_i cross-joined away every later
    v_j) while the Spark loop breaks and keeps the last folded vocab.
    The LEFT JOIN ON TRUE passthrough must make both mirrors agree."""
    from go_fish_spark.operators.ngrams import (
        bpe_tokenize,
        bpe_train,
        duck_bpe_tokenize_sql,
        duck_bpe_train_sql,
    )

    # 'ab ab cd' exhausts after 2 merges (a+b, c+d) — ask for 6
    df = spark.createDataFrame([("ab ab cd",), ("ab cd",)], "text string")
    duck.execute(
        "CREATE OR REPLACE VIEW _bpe13 AS "
        "SELECT * FROM (VALUES ('ab ab cd'), ('ab cd')) t(text)"
    )

    got_train = [
        tuple(r)
        for r in bpe_train(df, "text", n_merges=6)
        .orderBy("merge_idx")
        .collect()
    ]
    want_train = duck.execute(duck_bpe_train_sql("_bpe13", "text", 6)).fetchall()
    assert got_train == [tuple(r) for r in want_train]
    assert len(got_train) == 2  # exhausted after two merges, both sides

    got_tok = [
        tuple(r)
        for r in bpe_tokenize(df, "text", n_merges=6, top_k=10).collect()
    ]
    want_tok = duck.execute(
        duck_bpe_tokenize_sql("_bpe13", "text", 6, 10)
    ).fetchall()
    assert got_tok == [tuple(r) for r in want_tok]
    assert len(got_tok) == 2  # real rows, not the old empty mirror


# --- ADVICE r12 #3: relative store paths must not crash the lease -------------


def test_compact_label_store_relative_path(spark, tmp_path, monkeypatch):
    import shutil

    from go_fish_spark.streaming.labelstore import (
        append_label_patch,
        compact_label_store,
        read_label_store,
    )

    # NOTE: Spark resolves relative parquet paths against the JVM cwd,
    # not Python's — the store data lands under the JVM cwd while the
    # Python-side lease/manifest paths resolve against Python's cwd.
    # The bug under test is Python-side (dirname('') crashing makedirs),
    # so chdir covers it; sweep both roots afterwards.
    monkeypatch.chdir(tmp_path)
    jvm_cwd = spark.sparkContext._jvm.System.getProperty("user.dir")
    try:
        patch = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 3)], "id long, component long"
        )
        append_label_patch(patch, "labels", batch_id=0, n_shards=4)
        # bare relative path: dirname('labels') == '' crashed makedirs
        n = compact_label_store(spark, "labels", n_shards=4)
        assert n == 3
        got = {
            (r["id"], r["component"])
            for r in read_label_store(spark, "labels").collect()
        }
        assert got == {(1, 1), (2, 1), (3, 3)}
    finally:
        for root in {str(tmp_path), jvm_cwd}:
            for leaf in ("labels", "labels_gen", "labels_MANIFEST.json"):
                p = os.path.join(root, leaf)
                shutil.rmtree(p, ignore_errors=True)
                if os.path.isfile(p):
                    os.remove(p)


# --- ADVICE r12 #4: prune_covered_files refuses non-partition keys ------------


def test_prune_covered_files_guards_nonconstant_key(spark, tmp_path):
    from go_fish_spark.streaming import storekernel as sk

    path = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, 10, 0), (2, 20, 0)], "id long, shard long, _batch_id long"
    ).coalesce(1).write.parquet(path)  # shard NOT a partition column
    with pytest.raises(ValueError, match="not .*constant within file"):
        sk.prune_covered_files(
            spark, path, 5, key_col="shard", covered_by_key={"10": 5}
        )
    # a real partition column still prunes
    path2 = str(tmp_path / "part")
    spark.createDataFrame(
        [(1, 0, 0), (2, 1, 0)], "id long, shard long, _batch_id long"
    ).write.partitionBy("shard").parquet(path2)
    removed = sk.prune_covered_files(
        spark, path2, -1, key_col="shard", covered_by_key={"0": 5}
    )
    assert removed >= 1
