"""Task registry — name → Task factory.

≡ the reference's plugin loading (`rule.go:45-62`): a rule config names a
``.so`` path, ``plugin.Open`` + symbol lookup produce the Rule. Here a rule
spec names a registered task; registration validates the protocol up front
(the reference only validates via the separate -checkRule CLI).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from .protocol import Task, check_task

TASKS: dict[str, Callable[..., Task]] = {}


def register_task(name: str):
    """Register a Task factory (class or callable) under ``name``."""

    def deco(factory: Callable[..., Task]):
        probe = factory()
        check_task(probe)
        TASKS[name] = factory
        return factory

    return deco


def get_task(name: str, **options: Any) -> Task:
    if name not in TASKS:
        raise KeyError(f"unknown task {name!r}; registered: {sorted(TASKS)}")
    return TASKS[name](**options)
