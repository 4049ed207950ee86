"""Active append-only enforcement for audit-log directories (A12).

The reference installs ``no_dml_on_audit_table`` constraint triggers that
RAISE on any UPDATE / DELETE / TRUNCATE against an audit table
(audit.go:627-645; wired per-table at :796-806). Parquet directories have
no triggers, so the Spark-native equivalent is a write-path integrity
guard: a manifest of every data file ever committed to the log (path +
size). Before each new append the guard re-walks the directory — a file
that disappeared is a DELETE/TRUNCATE, a file whose size changed is an
UPDATE — and raises ``AppendOnlyViolation`` instead of letting capture
continue over a mutated log.

Sanctioned exceptions, mirroring ingest semantics:
- a replayed micro-batch may rewrite exactly its own ``__batch=N``
  directory (idempotent replay is not DML);
- ``compact_log`` rewrites the layout wholesale and must call ``reset()``
  after verifying row counts (table maintenance, documented deviation —
  the reference has no compaction).
"""

from __future__ import annotations

import json
import os


class AppendOnlyViolation(RuntimeError):
    """Raised when an audit log shows evidence of update/delete/truncate
    (the Spark analog of the reference's RAISE EXCEPTION trigger)."""


MANIFEST = "_append_manifest.json"


class AppendOnlyGuard:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.manifest_path = os.path.join(log_dir, MANIFEST)

    # -- manifest I/O -----------------------------------------------------
    def _load(self) -> dict[str, int]:
        if not os.path.exists(self.manifest_path):
            return {}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _walk(self) -> dict[str, int]:
        """Data files of the LOG TABLE only — ``__batch=*`` partition dirs
        (including the compacted ``__batch=-1`` segment) and root-level
        files. Sibling artifacts under the log root (the ``_state``
        snapshot store, whose keep-2 GC deletes its own old versions) are
        maintained materializations, not the append-only audit table the
        reference's trigger guards."""
        out: dict[str, int] = {}
        for root, dirs, files in os.walk(self.log_dir):
            if root == self.log_dir:
                dirs[:] = [d for d in dirs if d.startswith("__batch=")]
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                p = os.path.join(root, fn)
                out[os.path.relpath(p, self.log_dir)] = os.path.getsize(p)
        return out

    # -- the trigger body -------------------------------------------------
    def verify(self, ignore_prefix: str | None = None) -> None:
        """Raise AppendOnlyViolation if any previously-committed file was
        removed or rewritten. ``ignore_prefix`` exempts one ``__batch=N``
        directory (the micro-batch currently being replayed)."""
        recorded = self._load()
        current = self._walk()
        deleted, updated = [], []
        for rel, size in recorded.items():
            if ignore_prefix and rel.startswith(ignore_prefix):
                continue
            if rel not in current:
                deleted.append(rel)
            elif current[rel] != size:
                updated.append(rel)
        if deleted or updated:
            raise AppendOnlyViolation(
                "No common-case updates/deletes/truncates allowed on audit "
                f"table ({self.log_dir}): "
                f"deleted={sorted(deleted)[:5]} updated={sorted(updated)[:5]}"
            )

    def update(self) -> None:
        """Record the post-append state (trigger bookkeeping)."""
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._walk(), f)
        os.replace(tmp, self.manifest_path)

    def reset(self) -> None:
        """Sanctioned-maintenance escape hatch (compaction only)."""
        self.update()
