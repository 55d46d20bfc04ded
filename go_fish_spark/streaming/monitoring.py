"""Pipeline monitoring ≡ `monitoring.go`.

The reference counts pipelines and events-received per pipeline and exposes
them via Prometheus `/metrics`, CloudWatch, or a noop backend
(`monitoring.go:27-31,54-95,97-201`). Spark's native equivalent is the
StreamingQueryListener: progress events carry per-query input/processed
rates; this listener aggregates them into the same counter shapes.
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
