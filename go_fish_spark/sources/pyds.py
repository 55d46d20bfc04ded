"""Custom Python DataSource — the Spark-4 pluggable-source mechanism,
paralleling the reference's input-plugin surface (`input/input.go:29-47`
dispatches to compiled Go plugins; Spark 4's `pyspark.sql.datasource`
API is the modern equivalent: register a Python class, then
``spark.read.format(name)`` / ``spark.readStream.format(name)``).

Shipped source: ``gofish_certstream`` — a DETERMINISTIC simulator of the
reference's demo CertStream input (`input/cert_stream.go:11-14`, a
websocket feed of certificate-transparency events; demo-only upstream,
no auth). Batch arm: ``n_rows`` synthetic cert events split across
``n_partitions`` true input partitions (each partition generates its own
id range — the reader is embarrassingly parallel, no driver
materialization). Streaming arm: a SimpleDataSourceStreamReader whose
offset is the row counter — every micro-batch continues exactly where
the last left off, so `availableNow`-style drains are replayable.

Determinism contract: event i is a pure function of (seed, i) — same
rows on every engine, every run, every partitioning (md5-derived fields,
the sampling.py recipe) — so tests can assert exact content, not just
counts.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "seen_at string, domain string, issuer string, not_before string, "
    "all_domains array<string>"
)

_ISSUERS = ("LetsEncrypt", "DigiCert", "Sectigo", "GlobalSign")
_TLDS = ("com", "org", "net", "io")


def _event(seed: str, i: int) -> tuple:
    """Deterministic cert event i — pure function of (seed, i)."""
    h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
    domain = f"site-{h[:8]}.{_TLDS[int(h[8], 16) % len(_TLDS)]}"
    issuer = _ISSUERS[int(h[9], 16) % len(_ISSUERS)]
    day = 1 + int(h[10:12], 16) % 28
    sans = [domain] + (
        [f"www.{domain}"] if int(h[12], 16) % 2 == 0 else []
    )
    return (
        f"2026-01-{day:02d}T{int(h[13], 16) % 24:02d}:00:00Z",
        domain,
        issuer,
        f"2026-01-{day:02d}",
        sans,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _CertBatchReader(DataSourceReader):
    def __init__(self, options):
        self.seed = options.get("seed", "certs0")
        self.n_rows = int(options.get("n_rows", 100))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self):
        n, p = self.n_rows, max(1, self.n_partitions)
        step = -(-n // p)
        return [
            _RangePartition(lo, min(lo + step, n))
            for lo in range(0, n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _event(self.seed, i)


class _CertStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"i": next_row}; each micro-batch emits
    ``rows_per_batch`` events from the counter. readBetweenOffsets
    replays deterministically (same pure _event function), which is what
    makes checkpoint recovery exact."""

    def __init__(self, options):
        self.seed = options.get("seed", "certs0")
        self.rows_per_batch = int(options.get("rows_per_batch", 10))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = lo + self.rows_per_batch
        return (
            iter([_event(self.seed, i) for i in range(lo, hi)]),
            {"i": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_event(self.seed, i) for i in range(int(start["i"]), int(end["i"]))]
        )


class CertStreamDataSource(DataSource):
    """``spark.read.format("gofish_certstream")`` after
    :func:`register`. Options: seed, n_rows, n_partitions (batch);
    rows_per_batch (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "gofish_certstream"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _CertBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _CertStreamReader(self.options)


def register(spark) -> None:
    """Register the source on this session (idempotent)."""
    spark.dataSource.register(CertStreamDataSource)


def decode_cert_events(df):
    """The reference's CertStream DECODE step
    (`event_types.go` + `domain_cert_issued.go:33-54` operate on the
    `all_domains` array): normalize to the columns its regex rule
    consumes. Pure column expressions — works on batch and streaming
    frames alike."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("seen_at"),
        F.col("domain"),
        F.col("issuer"),
        F.col("all_domains"),
        F.exists(
            "all_domains", lambda d: d.rlike(r"^www\.")
        ).alias("has_www_san"),
    )


def certstream_json(df):
    """Render events back to the wire-ish JSON the reference's websocket
    delivers — for feeding the decode-cascade tests the same bytes both
    arms see."""
    from pyspark.sql import functions as F

    return df.select(
        F.to_json(
            F.struct("seen_at", "domain", "issuer", "all_domains")
        ).alias("value")
    )


__all__ = [
    "CertStreamDataSource",
    "register",
    "decode_cert_events",
    "certstream_json",
    "SCHEMA_DDL",
]
