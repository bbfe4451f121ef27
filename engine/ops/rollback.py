"""Snapshot rollback — restore the table to an earlier snapshot's file
set with ONE metadata-only commit (the Iceberg ``rollback_to_snapshot``
analog; no data files are read, written, or moved).

The rollback itself is a NEW snapshot whose file set equals the
target's, so history stays linear and auditable: the rolled-back-from
snapshot remains in the log (its now-unreferenced files are reclaimed
by the normal expire/sweep lifecycle), and a rollback can itself be
rolled back.  Re-added files are existence-checked first — a target
whose files were already expired fails loudly listing what is missing,
rather than committing a snapshot that cannot be scanned.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from ..tablefmt import SnapshotNotFound, Table


@dataclass
class RollbackResult:
    target_snapshot_id: int
    files_removed: int
    files_restored: int
    snapshot_id: int | None
    duration_s: float


def rollback_to(table: Table, snapshot_id: int) -> RollbackResult:
    """Make the table's current state equal snapshot ``snapshot_id``.

    Pure metadata: commits added = (target - current) file entries and
    removed = (current - target) paths.  No-op (snapshot_id None in the
    result) when the file sets already match."""
    t0 = time.monotonic()
    expected_parent = table.current_snapshot_id
    target = {e.path: e for e in table.files(snapshot_id)}  # raises if expired
    current = {e.path: e for e in table.files()}

    to_restore = [e for p, e in sorted(target.items()) if p not in current]
    to_remove = {p for p in current if p not in target}
    if not to_restore and not to_remove:
        return RollbackResult(snapshot_id, 0, 0, None, time.monotonic() - t0)

    missing = [
        e.path
        for e in to_restore
        if not os.path.exists(os.path.join(table.root, e.path))
    ]
    if missing:
        raise SnapshotNotFound(
            f"cannot roll back to snapshot {snapshot_id}: "
            f"{len(missing)} of its data files were already reclaimed "
            f"(expired): {missing[:5]}"
        )

    snap = table.commit(
        "rollback",
        to_restore,
        removed_paths=to_remove,
        summary={
            "rollback_to": snapshot_id,
            "files_removed": len(to_remove),
            "files_restored": len(to_restore),
        },
        expected_parent=expected_parent,
    )
    return RollbackResult(
        snapshot_id,
        len(to_remove),
        len(to_restore),
        snap.snapshot_id,
        time.monotonic() - t0,
    )
