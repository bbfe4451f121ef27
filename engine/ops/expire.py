"""Snapshot expiration + orphan-file sweep.

Snapshot expiry is the table-format analog of the reference's cache
clear/replace lifecycle (clear = drop data + reset ledger,
/root/reference/src/client/mod.rs:683-714; replace-wholesale cache
update, /root/reference/src/client/indexing/mod.rs:632-640): old table
states stop being reachable, and any physical file no longer referenced
by a live state is deleted.

The orphan sweep also reclaims files staged by crashed jobs that never
committed (write-then-commit means a crash leaks data files, never
corrupts a snapshot) — the GC half of the dirty-flag protocol.

All operations are metadata-sized on the driver except the final
file-listing diff, which is O(#files) name comparisons (at real scale
this listing would itself be distributed; the set algebra is identical).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..tablefmt import SnapshotNotFound, Table


@dataclass
class ExpireResult:
    expired_snapshots: list[int]
    retained_snapshots: list[int]
    orphans_deleted: int
    bytes_reclaimed: int
    manifests_deleted: int


def expire_snapshots(
    table: Table,
    retain_last: int | None = None,
    retain_ids: list[int] | None = None,
    sweep_orphans: bool = True,
) -> ExpireResult:
    """Expire all snapshots except the retained set (default: keep the
    current one).  Reads of an expired snapshot raise SnapshotNotFound;
    retained snapshots remain byte-identical (asserted by tests)."""
    all_ids = table.snapshot_ids()
    if retain_ids is not None:
        retained = sorted(set(retain_ids) | {table.current_snapshot_id})
    else:
        k = retain_last if retain_last is not None else 1
        retained = all_ids[-k:]
    expired = [s for s in all_ids if s not in retained]

    keep_files = table.referenced_files(retained)
    keep_manifests: set[str] = set()
    for sid in retained:
        keep_manifests.update(table.snapshot(sid).manifests)

    # drop expired snapshot logs + their now-unreferenced manifests
    manifests_deleted = 0
    for sid in expired:
        os.unlink(os.path.join(table.meta_dir, f"v{sid}.json"))
    for name in os.listdir(table.meta_dir):
        if name.startswith("manifest-") and name not in keep_manifests:
            os.unlink(os.path.join(table.meta_dir, name))
            manifests_deleted += 1

    orphans = 0
    bytes_reclaimed = 0
    if sweep_orphans:
        orphans, bytes_reclaimed = sweep_orphan_files(table, keep_files)

    return ExpireResult(expired, retained, orphans, bytes_reclaimed, manifests_deleted)


def sweep_orphan_files(
    table: Table, keep_files: set[str] | None = None
) -> tuple[int, int]:
    """Delete data files not referenced by any live snapshot (includes
    leftovers of crashed, never-committed writes)."""
    if keep_files is None:
        keep_files = table.referenced_files()
    n = 0
    reclaimed = 0
    for name in os.listdir(table.data_dir):
        rel = os.path.join("data", name)
        if rel not in keep_files:
            p = os.path.join(table.data_dir, name)
            reclaimed += os.path.getsize(p)
            os.unlink(p)
            n += 1
    # stale stage dirs from crashed writers
    for name in os.listdir(table.root):
        if name.startswith("_stage-"):
            import shutil

            d = os.path.join(table.root, name)
            for f in os.listdir(d):
                reclaimed += os.path.getsize(os.path.join(d, f))
                n += 1
            shutil.rmtree(d, ignore_errors=True)
    return n, reclaimed
