"""Spec → DataFrame DAG compiler (≡ `pipeline.go:257-330` + the execution
startup `pipeline.go:332-385`).

The reference hand-schedules one goroutine per node and per edge with
unbuffered channels; here "compilation" just composes DataFrame
transformations and Catalyst/AQE do the physical planning — the whole
optimizer the reference lacks (SURVEY §4.1) comes free.

Structural semantics reproduced:
  * rule chaining — a rule's source may be another rule (`pipeline.go:
    318-322`): compose on the upstream's DataFrame.
  * fan-out — a node's output feeds every child (`pipeline.go:400-404`):
    children share the same DataFrame; nodes with >1 consumer are
    persisted (MEMORY_AND_DISK) so the source isn't recomputed per branch.
  * fan-in — several rules naming one sink (`pipeline.go:387-391`):
    ``unionByName`` before the write.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..session import tune
from ..tasks import get_task
from .spec import PipelineSpec, SinkSpec, SourceSpec


def make_source(
    spark: SparkSession, src: SourceSpec, streaming: bool = False
) -> DataFrame:
    """Source factory ≡ `input/input.go:29-47` type dispatch.

    ``streaming=True`` compiles file/parquet sources as incremental
    directory streams (readStream); kafka/rate are inherently streaming.
    """
    tune(spark)
    opts = src.options
    if src.type == "parquet":
        if streaming:
            return spark.readStream.schema(opts["schema"]).parquet(opts["path"])
        return spark.read.parquet(opts["path"])
    if src.type == "file":
        # ≡ file source: one line = one event, `value` column
        # (`input/file.go:22-37`).
        return spark.readStream.text(opts["path"]) if streaming else spark.read.text(opts["path"])
    if src.type == "json":
        if streaming:
            return spark.readStream.schema(opts["schema"]).json(opts["path"])
        return spark.read.schema(opts["schema"]).json(opts["path"])
    if src.type == "memory":
        if streaming:
            raise ValueError("memory source is batch-only")
        # literal rows for tests (≡ the reference's literal-input
        # integration harness, integration_test.go:126-142)
        return spark.createDataFrame(opts["rows"], schema=opts.get("schema"))
    if src.type == "kafka":
        # ≡ `input/kafka.go:25-58`; latest offsets like OffsetNewest.
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", opts["brokers"])
            .option("subscribe", opts["topic"])
            .option("startingOffsets", opts.get("starting_offsets", "latest"))
            .load()
        )
    if src.type == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(opts.get("rows_per_second", 10)))
            .load()
        )
    raise ValueError(f"unknown source type {src.type!r}")


def write_sink(df: DataFrame, sink: SinkSpec) -> None:
    """Sink factory ≡ `output/output.go:28-42` type dispatch (batch)."""
    opts = sink.options
    if sink.type in ("file", "json"):
        # ≡ JSON-marshal + append (`output/file.go:31-54`); per-event
        # fsync becomes per-task-commit (documented semantic difference,
        # SURVEY §4.2).
        df.write.mode(opts.get("mode", "overwrite")).json(opts["path"])
    elif sink.type == "parquet":
        df.write.mode(opts.get("mode", "overwrite")).parquet(opts["path"])
    elif sink.type == "console":
        df.show(int(opts.get("num_rows", 20)), truncate=False)
    elif sink.type == "memory":
        pass  # results are read via CompiledPipeline.result()
    else:
        raise ValueError(f"unknown sink type {sink.type!r}")


@dataclass
class CompiledPipeline:
    spec: PipelineSpec
    node_frames: dict[str, DataFrame]
    sink_inputs: dict[str, DataFrame]
    streaming: bool = False

    def result(self, node: str) -> DataFrame:
        """DataFrame produced by a rule/source node or flowing into a sink."""
        if node in self.sink_inputs:
            return self.sink_inputs[node]
        return self.node_frames[node]

    def run(self) -> None:
        """Execute every sink (≡ StartPipeline, `pipeline.go:332-385` —
        but ordering/backpressure is Spark's problem, not ours)."""
        if self.streaming:
            raise ValueError("streaming pipeline: use start() instead of run()")
        for name, df in self.sink_inputs.items():
            write_sink(df, self.spec.sinks[name])

    def start(self, checkpoint_root: str, available_now: bool = False) -> list:
        """Start the streaming sinks; returns the StreamingQuerys
        (≡ StartPipeline's goroutine swarm, but one query per sink with
        Spark owning scheduling/backpressure/recovery).

        Multiple sinks over one source would each re-read it as separate
        queries; that fan-out case routes through streaming.sinks.
        fanout_sink (one read, persist, drive every branch — SURVEY §4.3d).
        """
        from ..streaming import sinks as ssinks

        queries = []
        sink_items = list(self.sink_inputs.items())
        if len(sink_items) > 1 and len(self.spec.sources) == 1:
            # single-read DAG fan-out
            [(src_name, _)] = self.spec.sources.items()
            src_df = self.node_frames[src_name]

            def make_writer(sink_spec: SinkSpec, path_key: str):
                def w(batch_df: DataFrame, batch_id: int) -> None:
                    if sink_spec.type in ("file", "json"):
                        batch_df.write.mode("append").json(sink_spec.options["path"])
                    elif sink_spec.type == "parquet":
                        batch_df.write.mode("append").parquet(sink_spec.options["path"])
                    elif sink_spec.type == "console":
                        batch_df.show(truncate=False)
                    else:
                        raise ValueError(
                            f"sink type {sink_spec.type!r} unsupported in streaming fan-out"
                        )

                return w

            # Branch transformations replayed against the micro-batch: for
            # each sink, the composition of rules from source to sink.
            branches = {}
            writers = {}
            for sink_name, _df in sink_items:
                rules_chain = [
                    r for r in self.spec.rules.values() if r.sink == sink_name
                ]

                def make_branch(rules_for_sink):
                    def branch(batch_df: DataFrame) -> DataFrame:
                        from ..tasks import get_task

                        outs = []
                        for r in rules_for_sink:
                            # recompose rule chain bottom-up
                            chain = []
                            cur = r
                            while True:
                                chain.append(cur)
                                if cur.source in self.spec.rules:
                                    cur = self.spec.rules[cur.source]
                                else:
                                    break
                            df = batch_df
                            for rule in reversed(chain):
                                task = get_task(rule.task, **rule.options)
                                task.init(None)
                                df = task.apply(df)
                            outs.append(df)
                        merged = outs[0]
                        for o in outs[1:]:
                            merged = merged.unionByName(o)
                        return merged

                    return branch

                branches[sink_name] = make_branch(rules_chain)
                writers[sink_name] = make_writer(self.spec.sinks[sink_name], sink_name)

            q = ssinks.fanout_sink(
                src_df,
                branches,
                writers,
                checkpoint=os.path.join(checkpoint_root, "fanout"),
                trigger_available_now=available_now,
            )
            return [q]

        for name, df in sink_items:
            sink = self.spec.sinks[name]
            ckpt = os.path.join(checkpoint_root, name)
            if sink.type in ("file", "json"):
                queries.append(
                    ssinks.json_sink(
                        df, sink.options["path"], ckpt, trigger_available_now=available_now
                    )
                )
            elif sink.type == "memory":
                queries.append(
                    ssinks.memory_sink(
                        df,
                        sink.options.get("name", name),
                        output_mode=sink.options.get("output_mode", "append"),
                        trigger_available_now=available_now,
                    )
                )
            else:
                raise ValueError(f"sink type {sink.type!r} unsupported in streaming")
        return queries


def compile_pipeline(
    spark: SparkSession, spec: PipelineSpec, streaming: bool = False
) -> CompiledPipeline:
    frames: dict[str, DataFrame] = {}

    for name, src in spec.sources.items():
        frames[name] = make_source(spark, src, streaming=streaming)

    # Resolve rules in dependency order (spec.validate guarantees a DAG).
    pending = dict(spec.rules)
    while pending:
        progressed = False
        for name, rule in list(pending.items()):
            if rule.source in frames:
                task = get_task(rule.task, **rule.options)
                state = spec.states.get(rule.state) if rule.state else None
                task.init(state)
                frames[name] = task.apply(frames[rule.source])
                del pending[name]
                progressed = True
        if not progressed:  # pragma: no cover — validate() prevents this
            raise ValueError(f"unresolvable rules: {sorted(pending)}")

    # Fan-out: persist any node consumed by >1 child so the upstream isn't
    # recomputed per branch (the reference streams each event to every
    # child for free; in batch Spark the equivalent is a shared
    # materialization). Streaming DataFrames can't persist — fan-out there
    # is handled by start()'s single-read foreachBatch path.
    if not streaming:
        consumers: dict[str, int] = {}
        for rule in spec.rules.values():
            consumers[rule.source] = consumers.get(rule.source, 0) + 1
        for node, n in consumers.items():
            if n > 1:
                frames[node] = frames[node].persist(StorageLevel.MEMORY_AND_DISK)

    # Fan-in: group rules by sink, union.
    sink_inputs: dict[str, DataFrame] = {}
    for rule in spec.rules.values():
        if rule.sink is None or rule.sink not in spec.sinks:
            continue
        df = frames[rule.name]
        if rule.sink in sink_inputs:
            sink_inputs[rule.sink] = sink_inputs[rule.sink].unionByName(df)
        else:
            sink_inputs[rule.sink] = df

    return CompiledPipeline(
        spec=spec, node_frames=frames, sink_inputs=sink_inputs, streaming=streaming
    )
