"""Pipeline monitoring ≡ `monitoring.go`.

The reference counts pipelines and events-received per pipeline and exposes
them via Prometheus `/metrics`, CloudWatch, or a noop backend
(`monitoring.go:27-31,54-95,97-201`). Spark's native equivalent is the
StreamingQueryListener: progress events carry per-query input/processed
rates; this listener aggregates them into the same counter shapes.

All three reference backends are implemented with the same typed dispatch
(:func:`monitoring_service` ≡ `monitoring.go:33-46`): noop, Prometheus
(exposition text), and CloudWatch (buffered counters + interval flush with
an injectable client, `monitoring.go:97-201`).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class PipelineMetrics:
    """≡ the counters in `monitoring.go:27-31`."""

    queries_started: int = 0
    queries_terminated: int = 0
    events_received: int = 0  # ≡ incrEventsReceived per pipeline
    by_query: dict = field(default_factory=dict)


class MetricsListener(StreamingQueryListener):
    def __init__(self) -> None:
        self.metrics = PipelineMetrics()
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.metrics.queries_started += 1

    def onQueryProgress(self, event) -> None:
        n = int(event.progress.numInputRows)
        name = event.progress.name or str(event.progress.id)
        with self._lock:
            self.metrics.events_received += n
            self.metrics.by_query[name] = self.metrics.by_query.get(name, 0) + n

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.metrics.queries_terminated += 1

    def snapshot(self) -> PipelineMetrics:
        with self._lock:
            return PipelineMetrics(
                queries_started=self.metrics.queries_started,
                queries_terminated=self.metrics.queries_terminated,
                events_received=self.metrics.events_received,
                by_query=dict(self.metrics.by_query),
            )


class NoopMonitoringService:
    """≡ `noopMonitoringService` (`monitoring.go:48-52`)."""

    def incr_pipelines(self, pipeline_name: str) -> None:
        pass

    def incr_event_received(self, pipeline_name: str) -> None:
        pass


class PrometheusMonitoringService:
    """≡ `prometheusMonitoringService` (`monitoring.go:54-95`): gauge
    ``<ns>Pipelines`` + counter ``<ns>EventsReceived``, labeled by
    pipeline name; :func:`render` emits the exposition text the reference
    serves at ``/metrics`` (golden-compared in tests, mirroring
    `monitoring_test.go:45-83`)."""

    def __init__(self, namespace: str = "go-fish") -> None:
        self.namespace = namespace or "go-fish"
        self._lock = threading.Lock()
        self._pipelines: dict[str, float] = {}
        self._events: dict[str, float] = {}

    def incr_pipelines(self, pipeline_name: str) -> None:
        with self._lock:
            self._pipelines[pipeline_name] = (
                self._pipelines.get(pipeline_name, 0.0) + 1.0
            )

    def incr_event_received(self, pipeline_name: str) -> None:
        with self._lock:
            self._events[pipeline_name] = (
                self._events.get(pipeline_name, 0.0) + 1.0
            )

    def render(self) -> str:
        with self._lock:
            return prometheus_text(
                dict(self._pipelines), dict(self._events), self.namespace
            )


class CloudWatchMonitoringService:
    """≡ `cloudWatchMonitoringService` (`monitoring.go:97-201`): buffered
    per-pipeline counters flushed to CloudWatch every ``resolution_sec``
    as two ``Count`` metric data (``Pipelines``, ``EventsReceived``)
    dimensioned by ``Pipeline``.

    The AWS client is INJECTABLE (the SQS-sink treatment,
    `plans/compiler.py`): ``put_metric_data(namespace, metric_data)``
    receives the exact datum shape the reference builds
    (`monitoring.go:144-180`). When no client is injected, the default
    transport is boto3's ``client('cloudwatch')`` (built lazily on first
    flush, wrapped so the call shape stays identical for tests). The
    reference's ResolutionSec=1 cost warning applies verbatim.

    ``flush_daemon`` mirrors `monitoring.go:134-142`: a background
    thread flushing every ``resolution_sec``, drift-corrected the same
    way (sleep = resolution − elapsed-since-last-flush)."""

    def __init__(
        self,
        namespace: str = "go-fish",
        resolution_sec: int = 60,
        client=None,
        clock=None,
    ) -> None:
        import time as _time

        self.namespace = namespace or "go-fish"
        self.resolution_sec = resolution_sec or 60
        self._client = client
        self._clock = clock or _time.time
        self._lock = threading.Lock()
        self._metrics: dict[str, dict[str, float]] = {}
        self._stop = threading.Event()
        self._daemon: threading.Thread | None = None

    def incr_pipelines(self, pipeline_name: str) -> None:
        with self._lock:
            m = self._metrics.setdefault(
                pipeline_name, {"pipelines": 0.0, "events_received": 0.0}
            )
            m["pipelines"] += 1.0

    def incr_event_received(self, pipeline_name: str) -> None:
        with self._lock:
            m = self._metrics.setdefault(
                pipeline_name, {"pipelines": 0.0, "events_received": 0.0}
            )
            m["events_received"] += 1.0

    def flush(self) -> None:
        """One PutMetricData call per pipeline, two data each — the same
        payload shape as `monitoring.go:146-180`. With no injected client
        the default boto3 CloudWatch transport is built on first flush
        (mirrors the SQS sink's default-boto3/injectable-sender pattern,
        `plans/compiler.py:_sqs_writer`)."""
        if self._client is None:
            self._client = _Boto3CloudWatchClient()
        with self._lock:
            snapshot = {k: dict(v) for k, v in self._metrics.items()}
        ts = self._clock()
        for pipeline, m in snapshot.items():
            dim = [{"Name": "Pipeline", "Value": pipeline}]
            self._client.put_metric_data(
                self.namespace,
                [
                    {
                        "Dimensions": dim,
                        "MetricName": "Pipelines",
                        "Unit": "Count",
                        "Timestamp": ts,
                        "Value": m["pipelines"],
                    },
                    {
                        "Dimensions": dim,
                        "MetricName": "EventsReceived",
                        "Unit": "Count",
                        "Timestamp": ts,
                        "Value": m["events_received"],
                    },
                ],
            )

    def start_flush_daemon(self) -> None:
        if self._daemon is not None:
            return

        def _loop() -> None:
            prev = self._clock()
            while not self._stop.wait(
                max(0.0, self.resolution_sec - (self._clock() - prev))
            ):
                self.flush()
                prev = self._clock()

        self._daemon = threading.Thread(target=_loop, daemon=True)
        self._daemon.start()

    def stop_flush_daemon(self) -> None:
        self._stop.set()
        if self._daemon is not None:
            self._daemon.join(timeout=5)
            self._daemon = None


class _Boto3CloudWatchClient:
    """Default CloudWatch transport: adapts the internal
    ``put_metric_data(namespace, metric_data)`` call shape (epoch-float
    timestamps, ≡ `monitoring.go:146-180`) onto boto3's
    ``client('cloudwatch').put_metric_data(Namespace=…, MetricData=…)``
    (datetime timestamps). Constructed lazily so an injected test client
    never touches AWS."""

    def __init__(self, client=None) -> None:
        if client is None:
            import boto3

            client = boto3.client("cloudwatch")
        self._boto = client

    def put_metric_data(self, namespace: str, metric_data: list) -> None:
        from datetime import datetime, timezone

        data = []
        for d in metric_data:
            d = dict(d)
            ts = d.get("Timestamp")
            if isinstance(ts, (int, float)):
                d["Timestamp"] = datetime.fromtimestamp(ts, tz=timezone.utc)
            data.append(d)
        self._boto.put_metric_data(Namespace=namespace, MetricData=data)


def monitoring_service(
    config: dict | None,
) -> NoopMonitoringService | PrometheusMonitoringService | CloudWatchMonitoringService:
    """≡ `monitoringConfiguration.init` (`monitoring.go:33-46`): typed
    dispatch on ``monitoringService`` — ``"prometheus"``,
    ``"cloudwatch"``, ``""``/absent → noop; anything else is the
    reference's exact rejection."""
    config = config or {}
    kind = config.get("monitoringService", "")
    if kind == "prometheus":
        prom = config.get("prometheus", {})
        return PrometheusMonitoringService(namespace=prom.get("namespace", "go-fish"))
    if kind == "cloudwatch":
        cw = config.get("cloudWatch", {})
        return CloudWatchMonitoringService(
            namespace=cw.get("namespace", "go-fish"),
            resolution_sec=cw.get("resolutionSec", 60),
            client=cw.get("client"),
        )
    if kind == "":
        return NoopMonitoringService()
    raise ValueError(f"Invalid monitoring service type {kind}")


def _fmt_value(v: float | int) -> str:
    # Prometheus text format renders integral values without a decimal
    # point (client_golang prints `1`, not `1.0`).
    return str(int(v)) if float(v).is_integer() else repr(float(v))


def prometheus_text(
    pipelines: dict[str, float],
    events: dict[str, float],
    namespace: str = "go-fish",
) -> str:
    """Prometheus exposition text for the reference's two metric families
    (`monitoring.go:65-72`): gauge ``<ns>Pipelines`` ("The number of
    pipelines configured") and counter ``<ns>EventsReceived`` ("The number
    of events received"), both labeled ``pipelineName`` — the same body
    golden-compared by `monitoring_test.go:45-83`. Label values are sorted
    for deterministic scrapes."""
    out: list[str] = []
    fams = (
        ("Pipelines", "The number of pipelines configured", "gauge", pipelines),
        ("EventsReceived", "The number of events received", "counter", events),
    )
    for name, help_text, mtype, values in fams:
        fq = f"{namespace}{name}"
        out.append(f"# HELP {fq} {help_text}")
        out.append(f"# TYPE {fq} {mtype}")
        for label in sorted(values):
            out.append(
                f'{fq}{{pipelineName="{label}"}} {_fmt_value(values[label])}'
            )
    return "\n".join(out) + "\n"
