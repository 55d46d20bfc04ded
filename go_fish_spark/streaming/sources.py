"""Streaming sources (≡ `input/`).

| reference | here |
|---|---|
| File source, line = event (`input/file.go:22-37`) | ``text_stream`` / ``json_stream`` over a directory |
| Kafka source, latest offsets (`input/kafka.go:25-58`) | ``kafka_stream`` (partition-preserving parallel read — the reference merges partitions into one unordered channel, `input/kafka.go:46-51`) |
| Kinesis, TRIM_HORIZON + DynamoDB lease (`input/kinesis.go:44-64`) | kafka/file config parity; checkpointing ≡ ``checkpointLocation`` |
| CertStream websocket (`input/cert_stream.go:15-41`, demo-only) | custom Python DataSource ``gofish_certstream`` (sources/pyds.py — Spark 4's pluggable-source API, the analogue of the reference's input plugins): deterministic synthetic cert events, batch + checkpointed streaming; ``rate_stream`` remains for raw-throughput demos |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..session import tune


def text_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    tune(spark)
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.text(path)


def json_stream(
    spark: SparkSession, path: str, schema: T.StructType | str, max_files_per_trigger: int | None = None
) -> DataFrame:
    tune(spark)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def kafka_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The reference's Kafka consumer config mapped onto the Structured
    Streaming kafka source's option surface (`input/kafka.go:25-58`):
    broker list ≡ ``kafka.bootstrap.servers``, topic subscription ≡
    ``subscribe`` (the reference consumes every partition of one topic,
    `input/kafka.go:41-51`), ``startingOffsets=latest`` ≡
    sarama.OffsetNewest (`input/kafka.go:30`), and
    ``maxOffsetsPerTrigger`` as the back-pressure knob replacing the
    reference's unbuffered-channel blocking (`pipeline.go:403`).

    Split out as a pure mapping so the config surface is contract-tested
    without a broker or the kafka connector jar
    (tests/test_streaming.py::test_kafka_reader_options_contract)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """``value`` bytes column ≡ emitting msg.Value (`input/kafka.go:54-57`);
    option mapping in :func:`kafka_options`."""
    tune(spark)
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(
        brokers, topic, starting_offsets, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    tune(spark)
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
