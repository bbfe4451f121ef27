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

Concurrent-writer safety: the engine supports concurrent writers
(merge_with_retry), which write data files and manifests BEFORE their
snapshot commit.  A sweep that deletes ANY unreferenced file would race
them: the writer's later commit would reference deleted files — a
corrupted table.  Hence everything younger than ``min_age_s`` (default
3 days, like Iceberg's ``older_than``) is protected, and so are outputs
recorded in active checkpoint ledgers (``engine.checkpoint``).  Pass
``min_age_s=0`` only when no writer can be in flight (tests, single
sequential job).

All operations are metadata-sized on the driver except the final
file-listing diff, which is O(#files) name comparisons (at real scale
this listing would itself be distributed; the set algebra is identical).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from ..tablefmt import SnapshotNotFound, Table

# Iceberg's expire_snapshots older_than default is 5 days; 3 days here.
DEFAULT_MIN_AGE_S = 3 * 24 * 3600


@dataclass
class ExpireResult:
    expired_snapshots: list[int]
    retained_snapshots: list[int]
    orphans_deleted: int
    bytes_reclaimed: int
    manifests_deleted: int


def _ledger_protected_files(table: Table) -> set[str]:
    """Root-relative output paths referenced by ANY checkpoint ledger —
    an in-flight resumable job's outputs must survive a sweep even when
    no snapshot references them yet."""
    import glob as _glob

    from ..checkpoint import Ledger

    protected: set[str] = set()
    for path in _glob.glob(os.path.join(table.root, "checkpoints", "*.json")):
        job_id = os.path.splitext(os.path.basename(path))[0]
        led = Ledger.open(table.root, job_id)
        for u in led.units.values():
            protected.update(u.outputs)
    return protected


def expire_snapshots(
    table: Table,
    retain_last: int | None = None,
    retain_ids: list[int] | None = None,
    sweep_orphans: bool = True,
    min_age_s: float = DEFAULT_MIN_AGE_S,
) -> ExpireResult:
    """Expire all snapshots except the retained set (default: keep the
    current one).  Reads of an expired snapshot raise SnapshotNotFound;
    retained snapshots remain byte-identical (asserted by tests).

    ``min_age_s`` guards the orphan sweep (not snapshot expiry itself —
    expiring an explicitly-named snapshot is intentional): uncommitted
    files younger than the cutoff are presumed in-flight and kept.
    """
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

    now = time.time()
    # drop expired snapshot logs + their now-unreferenced manifests.
    # Manifests younger than the cutoff may belong to an uncommitted
    # concurrent writer (manifests are written before the snapshot) —
    # keep them; a later sweep reclaims them once aged.
    manifests_deleted = 0
    for sid in expired:
        os.unlink(os.path.join(table.meta_dir, f"v{sid}.json"))
    for name in os.listdir(table.meta_dir):
        if name.startswith("manifest-") and name not in keep_manifests:
            p = os.path.join(table.meta_dir, name)
            if now - os.path.getmtime(p) < min_age_s:
                continue  # possibly an in-flight writer's manifest
            os.unlink(p)
            manifests_deleted += 1

    orphans = 0
    bytes_reclaimed = 0
    if sweep_orphans:
        orphans, bytes_reclaimed = sweep_orphan_files(
            table, keep_files, min_age_s=min_age_s
        )

    return ExpireResult(expired, retained, orphans, bytes_reclaimed, manifests_deleted)


def sweep_orphan_files(
    table: Table,
    keep_files: set[str] | None = None,
    min_age_s: float = DEFAULT_MIN_AGE_S,
) -> tuple[int, int]:
    """Delete data files not referenced by any live snapshot (includes
    leftovers of crashed, never-committed writes).

    Skips files/stage dirs younger than ``min_age_s`` (mtime cutoff) and
    outputs recorded in active checkpoint ledgers — both may belong to a
    concurrent writer that has not committed its snapshot yet.
    """
    if keep_files is None:
        keep_files = table.referenced_files()
    keep_files = keep_files | _ledger_protected_files(table)
    now = time.time()
    n = 0
    reclaimed = 0
    for name in os.listdir(table.data_dir):
        rel = os.path.join("data", name)
        if rel in keep_files:
            continue
        p = os.path.join(table.data_dir, name)
        if now - os.path.getmtime(p) < min_age_s:
            continue  # too fresh: may be an uncommitted writer's file
        reclaimed += os.path.getsize(p)
        os.unlink(p)
        n += 1
    # stale stage dirs from crashed writers
    for name in os.listdir(table.root):
        if name.startswith("_stage-"):
            import shutil

            d = os.path.join(table.root, name)
            if now - os.path.getmtime(d) < min_age_s:
                continue
            for f in os.listdir(d):
                reclaimed += os.path.getsize(os.path.join(d, f))
                n += 1
            shutil.rmtree(d, ignore_errors=True)
    return n, reclaimed
