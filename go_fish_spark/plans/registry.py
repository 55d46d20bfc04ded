"""Pipeline registry: Store/Get pipeline specs by UUID.

≡ the reference's backend interface Init/Store/Get (`backend.go:17-21`)
with BoltDB (`backend.go:64-100`) and DynamoDB (`backend.go:108-188`)
implementations keyed by pipeline UUID (`pipeline.go:104,269`), selected
by a typed backend config (`backend.go:29-56`).

Two backends, same three-method surface:
  * ``PipelineRegistry`` (type "file") — a directory of JSON files, the
    BoltDB analogue: single-node durable store, atomic replace per key.
  * ``SQLiteRegistry`` (type "sqlite") — the DynamoDB analogue: one
    transactional table keyed by uuid (sqlite3 stdlib stands in for the
    hosted KV service absent from this environment).
``make_registry`` is the config dispatch ≡ ``backendConfig.Create``,
including the invalid-type error branch (`backend.go:55`).
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
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


class SQLiteRegistry:
    """DynamoDB-analogue backend (`backend.go:108-188`): one table keyed
    by pipeline uuid, transactional upsert ≡ PutItem, point lookup ≡
    GetItem returning None on empty result (`backend.go:171-186`)."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()
        # ≡ Init()'s create-table-if-absent retry loop (`backend.go:131-158`)
        with self._conn() as con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS pipelines "
                "(uuid TEXT PRIMARY KEY, config TEXT NOT NULL)"
            )

    def _conn(self) -> sqlite3.Connection:
        return sqlite3.connect(self.path)

    def store(self, raw_config: str | dict, uuid: str | None = None) -> str:
        uid = uuid or str(uuidlib.uuid4())
        cfg = raw_config if isinstance(raw_config, str) else json.dumps(raw_config)
        with self._lock, self._conn() as con:
            con.execute(
                "INSERT INTO pipelines (uuid, config) VALUES (?, ?) "
                "ON CONFLICT(uuid) DO UPDATE SET config = excluded.config",
                (uid, cfg),
            )
        return uid

    def get(self, uuid: str) -> str | None:
        with self._lock, self._conn() as con:
            row = con.execute(
                "SELECT config FROM pipelines WHERE uuid = ?", (uuid,)
            ).fetchone()
        return row[0] if row else None

    def list(self) -> list[str]:
        with self._lock, self._conn() as con:
            return sorted(
                r[0] for r in con.execute("SELECT uuid FROM pipelines")
            )


def make_registry(cfg: dict):
    """Backend config dispatch ≡ `backendConfig.Create` (`backend.go:29-56`).

    ``{"type": "file", "root": dir}`` or ``{"type": "sqlite", "path": db}``;
    unknown types raise, mirroring `backend.go:55`."""
    btype = cfg.get("type", "file")
    if btype == "file":
        return PipelineRegistry(cfg["root"])
    if btype == "sqlite":
        return SQLiteRegistry(cfg["path"])
    raise ValueError(f"invalid backend type {btype!r}")
