"""Pluggable task surface (≡ go-fish rule plugins, `rule.go:15-22`)."""

from .protocol import BasicTask, Task, TaskCheckError, check_task  # noqa: F401
from .registry import TASKS, get_task, register_task  # noqa: F401
from . import builtin  # noqa: F401  (registers the built-in tasks)
from . import builtin_stateful  # noqa: F401  (declarative stateful built-ins)
