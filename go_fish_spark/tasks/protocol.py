"""Task protocol — the engine's extensibility surface.

Reference: a rule plugin exports a 6-method interface
``Init/Process/String/WindowInterval/Window/Close`` (`rule.go:15-22`),
loaded from a compiled ``.so`` (`rule.go:45-62`) and validated by
``go-fish -checkRule`` (`rule.go:31-43`, `main.go:28-29`).

Spark-first reframing: ``Process(event) -> result`` (map/filter/flatMap-1
hybrid returning nil to drop, `rule.go:15-22`) becomes
``apply(df) -> DataFrame`` — a *whole-relation* transformation, so a task
can be a pure Column expression (Catalyst-optimizable) instead of opaque
per-row code. Row-at-a-time logic still fits: wrap it in ``mapInPandas``
inside ``apply``. The nil-drop convention becomes "return a filtered
DataFrame"; sinks no longer need nil-skipping (`output/file.go:38-40`).
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame


@runtime_checkable
class Task(Protocol):
    """≡ the Rule interface (`rule.go:15-22`)."""

    def init(self, state: Any | None = None) -> None:
        """≡ Init(state...) (`rule.go:17`, state handle `pipeline.go:304`)."""
        ...

    def apply(self, df: DataFrame) -> DataFrame:
        """≡ Process (`rule.go:18`), relation-at-a-time."""
        ...

    def name(self) -> str:
        """≡ String() (`rule.go:19`)."""
        ...

    def window_interval(self) -> int:
        """≡ WindowInterval() seconds; 0 = unwindowed (`rule.go:20`,
        gating behavior `rule.go:76-78`)."""
        ...

    def window(self, df: DataFrame) -> DataFrame:
        """≡ Window() — the periodic drain/emission (`rule.go:21`,
        drain pattern `agg_rules/cloudTrail_agg.go:78-96`)."""
        ...

    def close(self) -> None:
        """≡ Close() (`rule.go:22`)."""
        ...


class BasicTask:
    """Stateless-task helper ≡ `ruleHelpers/basic_rule.go:17-37`: stubs
    everything except ``apply``."""

    def __init__(self, **options: Any) -> None:
        self.options = options
        self.state = None

    def init(self, state: Any | None = None) -> None:
        self.state = state

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError("subclass must implement apply()")

    def name(self) -> str:
        return type(self).__name__

    def window_interval(self) -> int:
        return 0

    def window(self, df: DataFrame) -> DataFrame:
        return df

    def close(self) -> None:
        pass


class TaskCheckError(TypeError):
    """Task failed protocol validation (≡ the -checkRule failure path)."""


def check_task(obj: Any) -> None:
    """≡ ``go-fish -checkRule rule.so`` (`rule.go:31-43`): load-time
    interface assertion, no execution."""
    missing = [
        m
        for m in ("init", "apply", "name", "window_interval", "window", "close")
        if not callable(getattr(obj, m, None))
    ]
    if missing:
        raise TaskCheckError(
            f"{type(obj).__name__} does not satisfy Task: missing {missing}"
        )
