"""Pipeline control-plane tests, mirroring the reference's test strategy:

* spec validation rejections with exact failure classes
  (≡ `pipeline_test.go:122-206`: duplicate keys, invalid state,
  shared state)
* end-to-end stateless pipeline over the reference's literal corpus
  a/ab/abc/abcd (≡ `integration_test.go:144-168` + fixtures
  `testdata/pipelines/input`): equality rule matches only "a", length
  rule matches only 1-char lines.
* task protocol check ≡ `go-fish -checkRule` (`rule.go:31-43`).
* registry store/get roundtrip ≡ `backend_test.go:38-85`.
"""

from __future__ import annotations

import json

import pytest

from go_fish_spark.plans import ValidationError, compile_pipeline, parse_spec
from go_fish_spark.plans.registry import PipelineRegistry


def spec_dict(**over):
    base = {
        "sources": {"in": {"type": "memory", "options": {"rows": [("a",), ("ab",), ("abc",), ("abcd",)], "schema": "value string"}}},
        "rules": {
            "is_a": {"source": "in", "task": "filter_eq", "sink": "out",
                      "options": {"column": "value", "value": "a"}},
            "len1": {"source": "in", "task": "filter_length", "sink": "out",
                      "options": {"column": "value", "length": 1}},
        },
        "sinks": {"out": {"type": "memory"}},
        "states": {},
    }
    base.update(over)
    return base


def test_parse_roundtrip():
    spec = parse_spec(json.dumps(spec_dict()))
    assert set(spec.rules) == {"is_a", "len1"}
    assert spec.children_of("in") == ["is_a", "len1"]


def test_reject_unknown_source():
    d = spec_dict()
    d["rules"]["is_a"]["source"] = "nope"
    with pytest.raises(ValidationError, match="unknown source"):
        parse_spec(d)


def test_reject_duplicate_name_across_kinds():
    d = spec_dict()
    d["sinks"]["is_a"] = {"type": "memory"}
    with pytest.raises(ValidationError, match="duplicate name"):
        parse_spec(d)


def test_reject_shared_state():
    d = spec_dict(states={"s1": {"type": "KV"}})
    d["rules"]["is_a"]["state"] = "s1"
    d["rules"]["len1"]["state"] = "s1"
    with pytest.raises(ValidationError, match="rule-local"):
        parse_spec(d)


def test_reject_unknown_state():
    d = spec_dict()
    d["rules"]["is_a"]["state"] = "ghost"
    with pytest.raises(ValidationError, match="unknown state"):
        parse_spec(d)


def test_reject_unknown_state_type():
    """≡ state.Create's closed type set (`state/state.go:20-32`)."""
    d = spec_dict(states={"s1": {"type": "Redis"}})
    with pytest.raises(ValidationError, match="unknown state type"):
        parse_spec(d)


def test_reject_rule_cycle():
    d = spec_dict()
    d["rules"]["is_a"]["source"] = "len1"
    d["rules"]["len1"]["source"] = "is_a"
    with pytest.raises(ValidationError, match="cycle"):
        parse_spec(d)


def test_chain_is_not_cycle():
    # A.source=B and B.sink=A describe the same edge B→A; must validate.
    d = spec_dict()
    d["rules"]["is_a"]["source"] = "len1"
    d["rules"]["len1"]["sink"] = "is_a"
    parse_spec(d)


def test_doubly_declared_edge_delivers_once(spark):
    """A.source=B AND B.sink=A declare the SAME edge B→A from both ends;
    each event must be delivered to A exactly once, not unioned twice
    (≡ the reference's duplicate AddChild collapsing into competing
    consumers that deliver once, `pipeline.go:354-356`)."""
    d = spec_dict()
    d["rules"]["is_a"]["source"] = "len1"
    d["rules"]["len1"]["sink"] = "is_a"
    compiled = compile_pipeline(spark, parse_spec(d))
    # len1 keeps only "a"; is_a must see it exactly once.
    assert [r.value for r in compiled.result("is_a").collect()] == ["a"]
    assert [r.value for r in compiled.result("out").collect()] == ["a"]


def test_kinesis_source_dispatch_arm(spark):
    """≡ input/kinesis.go:44-64 at config level: the kinesis type is
    recognized and its options map to the public aws-kinesis connector
    surface; in a build without the connector jar the error must say so
    (NOT 'unknown source type')."""
    from go_fish_spark.plans.compiler import make_source
    from go_fish_spark.plans.spec import SourceSpec

    src = SourceSpec(
        name="k",
        type="kinesis",
        options={"stream_name": "events", "region": "eu-west-1",
                 "starting_position": "TRIM_HORIZON"},
    )
    with pytest.raises(RuntimeError) as ei:
        make_source(spark, src, streaming=True)
    msg = str(ei.value)
    assert "aws-kinesis" in msg and "kinesis.streamName" in msg
    assert "'events'" in msg and "eu-west-1" in msg


def test_sqs_sink_batch_sends_json_per_event(spark, tmp_path):
    """≡ output/sqs.go:40-61: each event is JSON-marshaled and sent as one
    message; sends run executor-side (foreachPartition). The test injects
    a file-append transport in place of boto3."""
    out = tmp_path / "sqs_messages.jsonl"

    def file_sender(body: str) -> None:
        with open(out, "a") as f:
            f.write(body + "\n")

    d = spec_dict()
    d["sinks"]["out"] = {"type": "sqs",
                         "options": {"queue_url": "q", "sender": file_sender}}
    compiled = compile_pipeline(spark, parse_spec(d))
    compiled.run()
    msgs = [json.loads(line) for line in out.read_text().splitlines()]
    # both rules pass only "a" → two messages, each a JSON event body
    assert sorted(m["value"] for m in msgs) == ["a", "a"]


def test_sqs_sink_without_transport_fails_at_submit(spark, monkeypatch):
    """In a build without boto3 the sqs sink must fail driver-side at
    submit with a clear message, not inside an executor task."""
    import importlib.util

    real = importlib.util.find_spec
    monkeypatch.setattr(
        importlib.util,
        "find_spec",
        lambda name, *a: None if name == "boto3" else real(name, *a),
    )
    d = spec_dict()
    d["sinks"]["out"] = {"type": "sqs", "options": {"queue_url": "q"}}
    compiled = compile_pipeline(spark, parse_spec(d))
    with pytest.raises(RuntimeError, match="boto3"):
        compiled.run()


def test_e2e_stateless_pipeline(spark):
    """≡ integration_test.go:144-168: input 'a' passes both rules,
    'abc' passes neither; fan-in union reaches the sink."""
    compiled = compile_pipeline(spark, parse_spec(spec_dict()))
    is_a = [r.value for r in compiled.result("is_a").collect()]
    len1 = [r.value for r in compiled.result("len1").collect()]
    assert is_a == ["a"]
    assert len1 == ["a"]
    # fan-in: both rules name sink "out" → union delivered to the sink
    merged = sorted(r.value for r in compiled.result("out").collect())
    assert merged == ["a", "a"]


def test_rule_chaining(spark):
    """Rule sourcing another rule (`pipeline.go:318-322`)."""
    d = spec_dict()
    d["rules"]["short"] = {
        "source": "in", "task": "filter_length", "sink": None,
        "options": {"column": "value", "max_length": 3},
    }
    d["rules"]["is_a"]["source"] = "short"
    compiled = compile_pipeline(spark, parse_spec(d))
    assert [r.value for r in compiled.result("is_a").collect()] == ["a"]


def test_check_task_rejects_non_task():
    from go_fish_spark.tasks import TaskCheckError, check_task

    class NotATask:
        def apply(self, df):
            return df

    with pytest.raises(TaskCheckError, match="missing"):
        check_task(NotATask())


def test_check_task_accepts_basic_task():
    from go_fish_spark.tasks import BasicTask, check_task

    check_task(BasicTask())


def test_registry_roundtrip(tmp_path):
    reg = PipelineRegistry(str(tmp_path / "pipelines"))
    cfg = json.dumps(spec_dict())
    uid = reg.store(cfg)
    assert reg.get(uid) == cfg
    assert reg.get("missing-uuid") is None
    assert uid in reg.list()


def test_sqlite_registry_roundtrip(tmp_path):
    """≡ backend_test.go:38-85 (DynamoDB store/get roundtrip), on the
    second pluggable backend."""
    from go_fish_spark.plans.registry import SQLiteRegistry

    reg = SQLiteRegistry(str(tmp_path / "pipelines.db"))
    cfg = json.dumps(spec_dict())
    uid = reg.store(cfg)
    assert reg.get(uid) == cfg
    assert reg.get("missing-uuid") is None
    assert reg.list() == [uid]
    # upsert on same uuid ≡ PutItem overwrite
    reg.store('{"v": 2}', uuid=uid)
    assert reg.get(uid) == '{"v": 2}'
    # durable across connections
    assert SQLiteRegistry(str(tmp_path / "pipelines.db")).get(uid) == '{"v": 2}'


def test_make_registry_dispatch(tmp_path):
    """≡ backendConfig.Create (`backend.go:29-56`) incl. the invalid-type
    branch (`backend.go:55`)."""
    from go_fish_spark.plans.registry import (
        SQLiteRegistry,
        make_registry,
    )

    assert isinstance(
        make_registry({"type": "file", "root": str(tmp_path / "r")}),
        PipelineRegistry,
    )
    assert isinstance(
        make_registry({"type": "sqlite", "path": str(tmp_path / "r.db")}),
        SQLiteRegistry,
    )
    with pytest.raises(ValueError, match="invalid backend type"):
        make_registry({"type": "etcd"})


def test_csv_source_batch_and_stream(spark, tmp_path):
    """csv source arm: schema-projected scan, batch and incremental
    directory-stream compile to the same surface."""
    from go_fish_spark.plans.compiler import make_source
    from go_fish_spark.plans.spec import SourceSpec

    p = tmp_path / "in"
    p.mkdir()
    (p / "a.csv").write_text("id,name\n1,ann\n2,bob\n")
    src = SourceSpec(
        name="c", type="csv",
        options={"path": str(p), "schema": "id long, name string",
                 "header": True},
    )
    rows = {(r.id, r.name) for r in make_source(spark, src).collect()}
    assert rows == {(1, "ann"), (2, "bob")}
    sdf = make_source(spark, src, streaming=True)
    assert sdf.isStreaming and sdf.schema.simpleString() == \
        "struct<id:bigint,name:string>"


def test_parquet_sink_partition_by_layout_and_dynamic_overwrite(spark, tmp_path):
    """partition_by writes hive-style dirs (reads prune on the partition
    column); dynamic overwrite replaces only touched partitions."""
    import os

    from go_fish_spark.plans.compiler import write_sink
    from go_fish_spark.plans.spec import SinkSpec

    out = str(tmp_path / "t")
    sink = SinkSpec(name="s", type="parquet",
                    options={"path": out, "partition_by": ["k"]})
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    write_sink(df, sink)
    assert {d for d in os.listdir(out) if d.startswith("k=")} == {"k=a", "k=b"}
    # overwrite only k=a; k=b must survive
    write_sink(spark.createDataFrame([(9, "a")], "id long, k string"), sink)
    rows = {(r.id, r.k) for r in spark.read.parquet(out).collect()}
    assert rows == {(9, "a"), (2, "b")}


def test_shipped_example_specs_run_end_to_end(spark, tmp_path):
    """The two examples/ specs must stay runnable, not just documentation:
    each is loaded verbatim, its source/sink paths rewired to tmp dirs,
    compiled, and run; outputs are asserted against the reference
    scenarios they encode (certstream heartbeat-skip + www-domain match;
    cloudtrail s2s enrichment + no-MFA counting)."""
    import json as js
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # --- domain_cert_pipeline: heartbeats dropped, www.* domains emitted
    spec = js.load(open(os.path.join(repo, "examples/domain_cert_pipeline.json")))
    indir = tmp_path / "certs_in"
    outdir = tmp_path / "certs_out"
    indir.mkdir()
    spec["sources"]["certs"]["options"]["path"] = str(indir)
    spec["sinks"]["alerts"]["options"]["path"] = str(outdir)
    events = [
        dict(message_type="heartbeat", domains=[], seen=1.0, cert_index=1),
        dict(message_type="certificate_update",
             domains=["www.example.com", "example.com"], seen=2.0, cert_index=2),
        dict(message_type="certificate_update",
             domains=["mail.example.org"], seen=3.0, cert_index=3),
    ]
    with open(indir / "b0.json", "w") as f:
        for e in events:
            f.write(js.dumps(e) + "\n")
    compiled = compile_pipeline(spark, parse_spec(spec))
    compiled.run()
    out = spark.read.schema(
        "message_type string, domains array<string>, seen double, cert_index long"
    ).json(str(outdir))
    assert [r.cert_index for r in out.collect()] == [2]

    # --- cloudtrail_s2s_pipeline: enrichment hit + fallback, no-MFA count
    spec2 = js.load(
        open(os.path.join(repo, "examples/cloudtrail_s2s_pipeline.json"))
    )
    indir2 = tmp_path / "trail_in"
    indir2.mkdir()
    spec2["sources"]["trail"]["options"]["path"] = str(indir2)
    spec2["sinks"]["enriched"]["options"]["path"] = str(tmp_path / "enr_out")
    spec2["sinks"]["alerts"]["options"]["path"] = str(tmp_path / "alert_out")
    trail = [
        dict(event_id=1, ts="2024-01-01T00:00:00Z", role_id="AROLE:Bob",
             event_name="AssumeRole", principal="Bob", mfa="true"),
        dict(event_id=2, ts="2024-01-01T00:05:00Z", role_id="AROLE:Bob",
             event_name="CreateUser", principal=None, mfa="false"),
        dict(event_id=3, ts="2024-01-01T00:06:00Z", role_id="AROLE:nobody",
             event_name="CreateUser", principal=None, mfa="false"),
    ]
    with open(indir2 / "b0.json", "w") as f:
        for e in trail:
            f.write(js.dumps(e) + "\n")
    compiled2 = compile_pipeline(spark, parse_spec(spec2))
    compiled2.run()
    enr = spark.read.json(str(tmp_path / "enr_out"))
    entities = {r.event_id: r.entity for r in enr.collect() if r.event_id != 1}
    assert entities[2] == "user/Bob"          # kv hit
    assert entities[3] == "AROLE:nobody"      # state miss -> fallback
    alerts = spark.read.json(str(tmp_path / "alert_out"))
    counts = {r.role_id: r.occurrences for r in alerts.collect()}
    assert counts == {"AROLE:Bob": 1, "AROLE:nobody": 1}


def test_curation_demo_example_runs(spark):
    """examples/curation_demo.py's composed flow must keep working as the
    operator APIs evolve (it is the user-facing showcase of the Python
    API)."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "curation_demo", os.path.join(repo, "examples/curation_demo.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from conftest import SF_SMALL

    out = mod.curate(spark, SF_SMALL, verbose=False)
    rows = out.collect()
    assert rows and {"train", "val", "test"} >= {r.split for r in rows}


def test_gopher_gate_and_pii_scrub_tasks_in_pipeline_spec(spark, tmp_path):
    """The x42 gate and x23 scrubber are JSON-declarable tasks: the
    SHIPPED examples/curation_pipeline.json spec is loaded verbatim
    (paths rewired), compiled, and batch-run — only the rule-passing doc
    survives, with its email scrubbed."""
    import json
    import os

    from go_fish_spark.plans.compiler import compile_pipeline
    from go_fish_spark.plans.spec import parse_spec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = json.load(open(os.path.join(repo, "examples/curation_pipeline.json")))
    indir = tmp_path / "in"
    indir.mkdir()
    outdir = str(tmp_path / "out")
    spec["sources"]["docs"]["options"]["path"] = str(indir)
    spec["sinks"]["curated"]["options"]["path"] = outdir
    good = " ".join(["the", "a", "of"] + ["wordy"] * 60) + " mail me a@b.com"
    rows = [
        dict(doc_id=1, text=good, source="web"),
        dict(doc_id=2, text="the a tiny doc", source="web"),
    ]
    (indir / "docs.json").write_text("\n".join(json.dumps(r) for r in rows))
    compile_pipeline(spark, parse_spec(spec), streaming=False).run()
    got = spark.read.schema(
        "doc_id long, text string, source string"
    ).json(outdir).collect()
    assert [r.doc_id for r in got] == [1]
    assert "[EMAIL]" in got[0].text and "a@b.com" not in got[0].text


def test_bm25_gate_and_rocchio_tasks_are_declarable(spark, tmp_path):
    """x57/x65's frozen-stat forms as JSON-declarable rules: a pipeline
    spec carries the fitted stats/centroids as plain config, compiles,
    and batch-runs — topic-matched docs survive with scores attached,
    and the labeler tags vectors by nearest centroid."""
    import json

    from go_fish_spark.plans.compiler import compile_pipeline
    from go_fish_spark.plans.spec import parse_spec

    indir = tmp_path / "in"
    indir.mkdir()
    outdir = str(tmp_path / "out")
    rows = [
        dict(doc_id=1, text="spark window spark merge"),
        dict(doc_id=2, text="nothing relevant at all"),
    ]
    (indir / "docs.json").write_text("\n".join(json.dumps(r) for r in rows))
    spec = {
        "sources": {"docs": {"type": "json", "options": {
            "path": str(indir), "schema": "doc_id long, text string"}}},
        "rules": {"topic": {"task": "bm25_gate", "source": "docs",
                            "sink": "hits", "options": {
            "terms": ["spark", "merge"],
            "stats": {"N": 10, "avgdl": 4.0, "df": {"spark": 3, "merge": 2}},
            "min_score": 0.1}}},
        "sinks": {"hits": {"type": "json", "options": {"path": outdir}}},
    }
    compile_pipeline(spark, parse_spec(spec), streaming=False).run()
    # ROW-PRESERVING gate (round-5 ADVICE fix): the curated doc keeps its
    # full payload (text survives for downstream rules/sinks), with the
    # score + match-count columns appended.
    got = spark.read.schema(
        "doc_id long, text string, bm25_n_terms long, bm25 double"
    ).json(outdir).collect()
    assert [r.doc_id for r in got] == [1] and got[0].bm25_n_terms == 2
    assert got[0].text == "spark window spark merge"

    from go_fish_spark.tasks.registry import get_task

    lab = get_task(
        "rocchio_label",
        labels=[0, 1], centroids=[[1.0, 0.0], [0.0, 1.0]], column="v",
    )
    df = spark.createDataFrame([(1, [0.9, 0.1]), (2, [0.2, 0.8])], "id long, v array<double>")
    got2 = {r.id: r.label_pred for r in lab.apply(df).collect()}
    assert got2 == {1: 0, 2: 1}


def test_decontam_gate_task_is_declarable_and_row_preserving(spark, tmp_path):
    """x21's frozen form as a JSON-declarable rule: the benchmark shingle
    set travels as plain config, the compiled pipeline drops leaked docs,
    and survivors keep their full payload (row-preserving gate)."""
    import json

    from go_fish_spark.operators.decontam import fit_eval_shingles
    from go_fish_spark.plans.compiler import compile_pipeline
    from go_fish_spark.plans.spec import parse_spec

    ev = spark.createDataFrame(
        [(100, "saw a quick brown fox run")], "doc_id long, text string"
    )
    shingles = fit_eval_shingles(ev, "text")

    indir = tmp_path / "in"
    indir.mkdir()
    outdir = str(tmp_path / "out")
    rows = [
        dict(doc_id=1, text="the quick brown fox jumps", lang="en"),
        dict(doc_id=2, text="totally unrelated words here", lang="en"),
    ]
    (indir / "docs.json").write_text("\n".join(json.dumps(r) for r in rows))
    spec = {
        "sources": {"docs": {"type": "json", "options": {
            "path": str(indir),
            "schema": "doc_id long, text string, lang string"}}},
        "rules": {"clean": {"task": "decontam_gate", "source": "docs",
                            "sink": "out", "options": {
            "shingles": shingles, "min_hits": 1}}},
        "sinks": {"out": {"type": "json", "options": {"path": outdir}}},
    }
    compile_pipeline(spark, parse_spec(spec), streaming=False).run()
    got = spark.read.schema("doc_id long, text string, lang string").json(outdir).collect()
    assert [(r.doc_id, r.lang) for r in got] == [(2, "en")]
    assert got[0].text == "totally unrelated words here"


def test_length_gate_task_is_declarable_and_row_preserving(spark, tmp_path):
    """x67's enforcement arm as a JSON-declarable rule: the frozen
    length-bin baseline travels as plain config (fit once with
    profile.fit_length_baseline), the compiled pipeline drops docs whose
    length bin history never saw (or saw below min_share), and survivors
    keep their full payload."""
    import json

    from go_fish_spark.operators.profile import fit_length_baseline
    from go_fish_spark.plans.compiler import compile_pipeline
    from go_fish_spark.plans.spec import parse_spec

    hist = spark.createDataFrame(
        [(i, "x" * 40) for i in range(8)] + [(9, "y" * 300)],
        "doc_id long, text string",
    )
    baseline = fit_length_baseline(hist, "text")  # bins {5: 8, 8: 1}

    indir = tmp_path / "in"
    indir.mkdir()
    outdir = str(tmp_path / "out")
    rows = [
        dict(doc_id=1, text="z" * 50, lang="en"),     # bin 5 — majority, kept
        dict(doc_id=2, text="z" * 260, lang="en"),    # bin 8 — share 1/9 < 0.5
        dict(doc_id=3, text="z" * 70000, lang="en"),  # bin 16 — never seen
        dict(doc_id=4, text=None, lang="en"),         # NULL — no bin, dropped
    ]
    (indir / "docs.json").write_text("\n".join(json.dumps(r) for r in rows))
    spec = {
        "sources": {"docs": {"type": "json", "options": {
            "path": str(indir),
            "schema": "doc_id long, text string, lang string"}}},
        "rules": {"admit": {"task": "length_gate", "source": "docs",
                            "sink": "out", "options": {
            "baseline": {str(k): v for k, v in baseline.items()},
            "min_share": 0.5}}},
        "sinks": {"out": {"type": "json", "options": {"path": outdir}}},
    }
    compile_pipeline(spark, parse_spec(spec), streaming=False).run()
    got = spark.read.schema(
        "doc_id long, text string, lang string"
    ).json(outdir).collect()
    assert [(r.doc_id, r.lang) for r in got] == [(1, "en")]
    assert got[0].text == "z" * 50


def test_admission_pipeline_spec_batch_and_streaming(spark, tmp_path):
    """The SHIPPED examples/admission_pipeline.json chains three frozen-
    config map-only gates (gopher_gate → length_gate → decontam_gate);
    loaded verbatim (paths rewired) it must admit exactly the doc that
    clears all three, in BATCH and — unchanged — in STREAMING mode (the
    round-6 length_gate is a pure per-row expression like its
    siblings)."""
    import json
    import os

    from go_fish_spark.plans.compiler import compile_pipeline
    from go_fish_spark.plans.spec import parse_spec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = json.load(open(os.path.join(repo, "examples/admission_pipeline.json")))
    indir = tmp_path / "in"
    indir.mkdir()
    outdir = str(tmp_path / "out")
    spec["sources"]["crawl"]["options"]["path"] = str(indir)
    spec["sinks"]["admitted"]["options"]["path"] = outdir

    base = ["the", "a", "of"] + ["wordy"] * 55
    rows = [
        # 1: clears every gate (structure ok, length bin 8 in baseline,
        # no benchmark shingles)
        dict(doc_id=1, text=" ".join(base + ["alpha", "beta"]), source="web"),
        # 2: structure ok but ~1.2k chars → bin 10, absent from the
        # frozen baseline → length_gate drops it
        dict(doc_id=2, text=" ".join(["the", "a", "of"] + ["wordy"] * 200),
             source="web"),
        # 3: contains the 4-token benchmark shingle → decontam_gate
        dict(doc_id=3,
             text=" ".join(base + "the eval answer is forty two".split()),
             source="web"),
        # 4: structurally broken → gopher_gate
        dict(doc_id=4, text="the a tiny doc", source="web"),
    ]
    (indir / "docs.json").write_text("\n".join(json.dumps(r) for r in rows))

    compile_pipeline(spark, parse_spec(spec), streaming=False).run()
    got = spark.read.schema(
        "doc_id long, text string, source string"
    ).json(outdir).collect()
    assert [r.doc_id for r in got] == [1]
    assert got[0].text.startswith("the a of wordy")  # row-preserving

    out2 = str(tmp_path / "out2")
    spec["sinks"]["admitted"]["options"]["path"] = out2
    compiled = compile_pipeline(spark, parse_spec(spec), streaming=True)
    for q in compiled.start(str(tmp_path / "ckpt"), available_now=True):
        q.awaitTermination(120)
    streamed = spark.read.schema(
        "doc_id long, text string, source string"
    ).json(out2).collect()
    assert [(r.doc_id, r.text) for r in streamed] == [
        (got[0].doc_id, got[0].text)
    ]
