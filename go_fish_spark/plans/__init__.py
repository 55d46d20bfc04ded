"""Pipeline control plane: spec parsing/validation, DAG compilation, and
the pipeline registry (≡ `pipeline.go`, `backend.go`)."""

from .spec import PipelineSpec, ValidationError, parse_spec  # noqa: F401
from .compiler import compile_pipeline, resolve_tasks  # noqa: F401
