"""Offset/checkpoint store — SURVEY.md §2.1 S8 / §2.8 T2.

The reference keeps one ``(updated_at, last_id)`` cursor per
(source-table, target-index) pair in Redis/dbm
(/root/reference/postgres_to_es/state.py:9-51, keys at
daemon.py:104-107,123-126). Here: a single JSON file with atomic
replace (write-temp + ``os.replace``), so a crash mid-commit leaves
the previous consistent cursor — the commit-after-sink contract's
storage half. On a cluster this would be the streaming
``checkpointLocation`` (structured.py uses exactly that); this store
backs the batch-incremental mode.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile

EPOCH_ZERO = dt.datetime(1970, 1, 1)
UUID_SENTINEL = "00000000-0000-0000-0000-000000000000"


class OffsetStore:
    """(ts, id) cursor per pipeline key, JSON-file backed."""

    def __init__(self, path: str, id_default: str | int = UUID_SENTINEL) -> None:
        self.path = path
        self.id_default = id_default

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, key: str) -> tuple[dt.datetime, str | int]:
        """Cursor for ``key``; epoch-0 + sentinel id before first commit
        (daemon.py:104-107 defaults — i.e. 'backfill from the start')."""
        entry = self._load().get(key)
        if entry is None:
            return EPOCH_ZERO, self.id_default
        return dt.datetime.fromisoformat(entry["ts"]), entry["id"]

    def set(self, key: str, ts: dt.datetime, last_id: str | int) -> None:
        data = self._load()
        data[key] = {"ts": ts.isoformat(), "id": last_id}
        d = os.path.dirname(self.path) or "."
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".offsets-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(data, f)
            os.replace(tmp, self.path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
