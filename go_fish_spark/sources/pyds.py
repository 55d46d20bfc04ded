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
        if n <= 0:  # dry-run configs: zero rows, not range(0,0,0)
            return [_RangePartition(0, 0)]
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


# ---------------------------------------------------------------------------
# Writer side — the pluggable SINK surface (≡ `output/output.go:28-42`'s
# sink plugin dispatch), with the two-phase commit the compiled plugins
# never had: tasks write to temp files and return commit messages; only
# the DRIVER's commit() publishes them (rename + manifest), so a failed
# task leaves nothing visible and a retried task cannot double-publish.

import os as _os
import uuid as _uuid

from dataclasses import dataclass

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class _AuditWriterMixin:
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("gofish_audit writer requires option 'path'")
        # concurrent-writer safety margin for the orphan sweep (round 9)
        self.orphan_grace_sec = float(options.get("orphan_grace_sec", "300"))

    def write(self, iterator) -> _FileCommit:
        _os.makedirs(_os.path.join(self.path, "_tmp"), exist_ok=True)
        tmp = _os.path.join(self.path, "_tmp", f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True)) + "\n")
                n += 1
        return _FileCommit(tmp_path=tmp, n_rows=n)

    def _publish(self, messages, suffix: str) -> None:
        # idempotent re-commit: a crashed PARTIAL publish of this same
        # suffix (driver died mid-rename, then the batch re-ran — maybe
        # with a different partition count) must not leave stale part
        # files beside the new set with a manifest that undercounts
        import glob as _glob

        for stale in _glob.glob(
            _os.path.join(self.path, f"part-{suffix}-*.jsonl")
        ):
            _os.remove(stale)
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = _os.path.join(self.path, f"part-{suffix}-{i:05d}.jsonl")
            _os.rename(m.tmp_path, final)
            total += m.n_rows
        with open(
            _os.path.join(self.path, f"_manifest-{suffix}.json"), "w"
        ) as f:
            json.dump({"n_rows": total, "n_files": sum(1 for m in messages if m)}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.tmp_path):
                _os.remove(m.tmp_path)


class _AuditBatchWriter(_AuditWriterMixin, DataSourceWriter):
    """Batch commits publish under a UNIQUE per-job suffix (uuid chosen
    once in ``writer()``, driver-side), so ``mode("append")`` stacks
    commits instead of silently replacing the previous one. A commit is
    COMPLETE only once its ``_manifest-<suffix>.json`` exists (written
    last in ``_publish``), so a driver crash mid-publish leaves part
    files with no manifest — the next commit() removes exactly those
    ORPHANED suffixes before publishing (single-writer directory, the
    same assumption every manifest-last sink makes), which is what keeps
    readers that glob ``part-*.jsonl`` from double-counting a crashed
    job's partial rows. ``mode("overwrite")`` clears every previously
    published part file and manifest before publishing."""

    def __init__(self, options, overwrite: bool):
        _AuditWriterMixin.__init__(self, options)
        self.overwrite = bool(overwrite)
        self.suffix = f"b{_uuid.uuid4().hex[:12]}"

    def commit(self, messages) -> None:
        import glob as _glob
        import re as _re

        if self.overwrite:
            for old in _glob.glob(
                _os.path.join(self.path, "part-*.jsonl")
            ) + _glob.glob(_os.path.join(self.path, "_manifest-*.json")):
                _os.remove(old)
        else:
            # drop orphans of crashed batch publishes: part files whose
            # suffix never got its manifest (manifest is written LAST).
            # GRACE PERIOD: a concurrent writer renames its parts before
            # writing its manifest, so a manifest-less part that is
            # FRESH may be another writer's in-flight publish, not a
            # crash — only sweep parts older than the grace window
            # (default 300 s; tests shrink it via the option) so a live
            # publish is never deleted out from under its writer.
            import time as _time

            grace = self.orphan_grace_sec
            now = _time.time()
            for f in _glob.glob(_os.path.join(self.path, "part-b*.jsonl")):
                m = _re.match(r"part-(b[0-9a-f]+)-\d+\.jsonl$",
                              _os.path.basename(f))
                if m and not _os.path.exists(
                    _os.path.join(self.path, f"_manifest-{m.group(1)}.json")
                ):
                    try:
                        if now - _os.path.getmtime(f) > grace:
                            _os.remove(f)
                    except OSError:
                        pass  # already swept by a concurrent commit
        self._publish(messages, self.suffix)


class _AuditStreamWriter(_AuditWriterMixin, DataSourceStreamWriter):
    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        self._publish(messages, f"{batchId:08d}")

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _AuditWriterMixin.abort(self, messages)


class AuditSinkDataSource(DataSource):
    """``df.write.format("gofish_audit").option("path", DIR)
    .mode("append").save()`` (Python data sources require an explicit
    Append/Overwrite mode; or ``writeStream``): JSON-lines sink with
    driver-side two-phase commit
    and a per-commit row-count manifest — the pluggable-sink analogue of
    the reference's output plugins, carrying the atomicity its
    fsync-per-event file sink (`output/file.go:49-52`) lacked."""

    @classmethod
    def name(cls) -> str:
        return "gofish_audit"

    def writer(self, schema: StructType, overwrite: bool):
        return _AuditBatchWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _AuditStreamWriter(self.options)


def register_sink(spark) -> None:
    """Register the audit sink on this session (idempotent)."""
    spark.dataSource.register(AuditSinkDataSource)
