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


def make_source(spark: SparkSession, src: SourceSpec) -> DataFrame:
    """Source factory ≡ `input/input.go:29-47` type dispatch."""
    tune(spark)
    opts = src.options
    if src.type == "parquet":
        return spark.read.parquet(opts["path"])
    if src.type == "file":
        # ≡ file source: one line = one event, `value` column
        # (`input/file.go:22-37`).
        return spark.read.text(opts["path"])
    if src.type == "memory":
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

    def result(self, node: str) -> DataFrame:
        """DataFrame produced by a rule/source node or flowing into a sink."""
        if node in self.sink_inputs:
            return self.sink_inputs[node]
        return self.node_frames[node]

    def run(self) -> None:
        """Execute every sink (≡ StartPipeline, `pipeline.go:332-385` —
        but ordering/backpressure is Spark's problem, not ours)."""
        for name, df in self.sink_inputs.items():
            write_sink(df, self.spec.sinks[name])


def compile_pipeline(spark: SparkSession, spec: PipelineSpec) -> CompiledPipeline:
    frames: dict[str, DataFrame] = {}

    for name, src in spec.sources.items():
        frames[name] = make_source(spark, src)

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
    # materialization).
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

    return CompiledPipeline(spec=spec, node_frames=frames, sink_inputs=sink_inputs)
