"""Custom Python DataSource (sources/pyds.py) — the Spark-4 pluggable
source surface paralleling the reference's input plugins
(`input/input.go:29-47`): batch partitioning, determinism, streaming
offset continuation across checkpointed restarts, and the compiler's
`certstream` dispatch."""

from __future__ import annotations

import glob
import json

import pyspark.sql.functions as F

from go_fish_spark.sources import pyds
from go_fish_spark.sources.pyds import _event


def test_batch_read_partitioned_and_deterministic(spark):
    pyds.register(spark)
    df = (
        spark.read.format("gofish_certstream")
        .option("n_rows", 25).option("n_partitions", 3).load()
    )
    assert df.count() == 25
    assert df.rdd.getNumPartitions() == 3
    # content is a pure function of (seed, i) — matches the generator
    doms = sorted(r.domain for r in df.collect())
    assert doms == sorted(_event("certs0", i)[1] for i in range(25))
    # seed changes the stream, re-read doesn't
    other = (
        spark.read.format("gofish_certstream")
        .option("n_rows", 25).option("seed", "other").load()
    )
    assert sorted(r.domain for r in other.collect()) != doms
    # decode step: typed columns the regex rule consumes
    dec = pyds.decode_cert_events(df)
    assert {"domain", "has_www_san"} <= set(dec.columns)
    n_www = dec.filter("has_www_san").count()
    assert 0 < n_www < 25  # md5-split ~half


def test_stream_offsets_continue_across_restart(spark, tmp_path):
    """Two trigger-once drains against the SAME checkpoint must produce
    rows 0..2b-1 exactly once — the SimpleDataSourceStreamReader offset
    (row counter) survives the restart and replays deterministically."""
    pyds.register(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("gofish_certstream")
            .option("rows_per_batch", 7).load()
            .writeStream.format("json").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(once=True).start()
        )
        q.awaitTermination(120)

    drain()
    drain()
    rows = [
        json.loads(line)
        for f in glob.glob(out + "/*.json")
        for line in open(f)
        if line.strip()
    ]
    assert sorted(r["domain"] for r in rows) == sorted(
        _event("certs0", i)[1] for i in range(14)
    )


def test_compiler_certstream_dispatch(spark):
    """`{"type": "certstream"}` in a pipeline spec reads the Python
    DataSource (batch arm here; the demo rate stand-in is retired)."""
    from go_fish_spark.plans.compiler import make_source
    from go_fish_spark.plans.spec import SourceSpec

    df = make_source(
        spark,
        SourceSpec(name="c", type="certstream",
                   options={"n_rows": 9, "seed": "pipeline"}),
        streaming=False,
    )
    assert df.count() == 9
    assert sorted(r.domain for r in df.collect()) == sorted(
        _event("pipeline", i)[1] for i in range(9)
    )


def test_audit_sink_two_phase_commit_batch_and_stream(spark, tmp_path):
    """The writer side of the pluggable surface: batch write publishes
    only via driver commit (temp dir left empty, manifest counts rows);
    streaming write publishes per-batch manifests; aborted temp files
    never become visible."""
    import os

    pyds.register_sink(spark)
    pyds.register(spark)

    out = str(tmp_path / "audit")
    df = (
        spark.read.format("gofish_certstream")
        .option("n_rows", 20).option("n_partitions", 3).load()
    )
    df.write.format("gofish_audit").option("path", out).mode(
        "append"
    ).save()
    files = sorted(glob.glob(out + "/part-b*.jsonl"))
    assert files, "no published files"
    rows = [json.loads(l) for f in files for l in open(f) if l.strip()]
    assert len(rows) == 20
    assert not os.listdir(os.path.join(out, "_tmp"))  # nothing stranded
    man = json.load(open(glob.glob(out + "/_manifest-b*.json")[0]))
    assert man["n_rows"] == 20

    # streaming arm: per-batch manifest, offset continuation
    sout = str(tmp_path / "audit_stream")
    q = (
        spark.readStream.format("gofish_certstream")
        .option("rows_per_batch", 6).load()
        .writeStream.format("gofish_audit").option("path", sout)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(once=True).start()
    )
    q.awaitTermination(120)
    srows = [
        json.loads(l)
        for f in glob.glob(sout + "/part-*.jsonl")
        for l in open(f)
        if l.strip()
    ]
    assert sorted(r["domain"] for r in srows) == sorted(
        _event("certs0", i)[1] for i in range(6)
    )
    assert glob.glob(sout + "/_manifest-*.json")
