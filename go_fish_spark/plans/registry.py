"""Pipeline registry: Store/Get pipeline specs by UUID.

≡ the reference's backend interface Init/Store/Get (`backend.go:17-21`)
with BoltDB (`backend.go:64-100`) and DynamoDB (`backend.go:108-188`)
implementations keyed by pipeline UUID (`pipeline.go:104,269`).

Here: a directory of JSON files (one per UUID) — durable, concurrent-safe
enough for a control plane whose write rate is "a human submitted a
pipeline". Swappable for an object store / Delta table at scale.
"""

from __future__ import annotations

import json
import os
import uuid as uuidlib


class PipelineRegistry:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, uuid: str) -> str:
        # IDs are path components — reject separators/traversal outright
        # so a crafted GET /pipelines/{id} can't read outside the registry.
        if not uuid or any(c in uuid for c in ("/", "\\", "\x00")) or ".." in uuid:
            raise KeyError(f"invalid pipeline id {uuid!r}")
        return os.path.join(self.root, f"{uuid}.json")

    def store(self, raw_config: str | dict, uuid: str | None = None) -> str:
        """≡ Store(pipe) (`backend.go:76-100`); returns the UUID."""
        uid = uuid or str(uuidlib.uuid4())
        cfg = raw_config if isinstance(raw_config, str) else json.dumps(raw_config)
        tmp = self._path(uid) + ".tmp"
        with open(tmp, "w") as f:
            f.write(cfg)
        os.replace(tmp, self._path(uid))
        return uid

    def get(self, uuid: str) -> str | None:
        """≡ Get(uuid) (`backend.go:88-100`); None if absent (the API maps
        this to 404, `api.go:95-98`)."""
        try:
            with open(self._path(uuid)) as f:
                return f.read()
        except (FileNotFoundError, KeyError):
            return None

    def list(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self.root) if f.endswith(".json")
        )
