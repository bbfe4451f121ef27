"""Per-partition checkpoint ledger — resumable maintenance jobs.

Re-expresses project-rag's crash-recovery protocol as a per-job ledger
over work units (compaction bins / cluster partitions / merge file
groups):

- mark a unit ``dirty`` (persisted) BEFORE any write for it
  (/root/reference/src/client/indexing/mod.rs:1087-1098),
- mark it ``clean`` with row/byte metrics + lineage only on success
  (/root/reference/src/client/indexing/mod.rs:1145-1165),
- on restart, validate each dirty unit into one of three outcomes
  (/root/reference/src/client/indexing/mod.rs:848-947):
  ``STALE``  — dirty flag older than 2h: the writer died long ago;
               clear and redo the unit,
  ``COMPLETE`` — outputs ≥ 80% present: trust and resume,
  ``CORRUPT``  — fresh dirty flag with partial output: discard unit
               output and redo.

The ledger itself is JSON written atomically (write-temp + rename), the
same durability trick the reference uses for its hash cache
(/root/reference/src/cache.rs:133-145).  Ledgers live under
``<table>/checkpoints/<job_id>.json`` — metadata-sized, never row data,
so driver-side IO stays O(work units), not O(rows).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

STALE_AFTER_S = 2 * 3600  # /root/reference/src/client/indexing/mod.rs:848-850
COMPLETE_FRACTION = 0.8  # /root/reference/src/client/indexing/mod.rs:867-947


class DirtyTableError(Exception):
    """A maintenance job is mid-flight (dirty units on disk)."""


def assert_clean(table_root: str) -> None:
    """Dirty-path guard (P8, /root/reference/src/client/mod.rs:301-315):
    refuse an operation while any ledger in <root>/checkpoints has dirty
    units — the caller should resume/finish that job first."""
    import glob as _glob

    for path in _glob.glob(os.path.join(table_root, "checkpoints", "*.json")):
        job_id = os.path.splitext(os.path.basename(path))[0]
        led = Ledger.open(table_root, job_id)
        if led.has_dirty():
            raise DirtyTableError(
                f"table has in-flight maintenance job '{job_id}' with dirty "
                "units; resume it (same job_id) or sweep before querying"
            )


class Validation(Enum):
    CLEAN = "clean"
    STALE = "stale"
    COMPLETE = "complete"
    CORRUPT = "corrupt"


@dataclass
class Unit:
    unit_id: str
    state: str = "pending"  # pending | dirty | clean
    dirty_ts: float | None = None
    expected_outputs: int = 0
    outputs: list[str] = field(default_factory=list)  # produced file paths (rel)
    rows_written: int = 0
    bytes_written: int = 0
    lineage: list[int] = field(default_factory=list)  # snapshot-id chain
    meta: dict[str, Any] = field(default_factory=dict)


class Ledger:
    def __init__(self, path: str, job_id: str, units: dict[str, Unit], meta: dict):
        self.path = path
        self.job_id = job_id
        self.units = units
        self.meta = meta

    # -- persistence --------------------------------------------------------
    @staticmethod
    def _ledger_path(table_root: str, job_id: str) -> str:
        d = os.path.join(table_root, "checkpoints")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{job_id}.json")

    @staticmethod
    def open(table_root: str, job_id: str, meta: dict | None = None) -> "Ledger":
        """Load an existing ledger for job_id, or start an empty one."""
        p = Ledger._ledger_path(table_root, job_id)
        if os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            units = {u["unit_id"]: Unit(**u) for u in d["units"]}
            return Ledger(p, job_id, units, d.get("meta", {}))
        return Ledger(p, job_id, {}, meta or {})

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "job_id": self.job_id,
                    "meta": self.meta,
                    "units": [u.__dict__ for u in self.units.values()],
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    def delete(self) -> None:
        if os.path.exists(self.path):
            os.unlink(self.path)

    # -- unit lifecycle -----------------------------------------------------
    def register(self, unit_id: str, expected_outputs: int = 1, **meta) -> Unit:
        if unit_id not in self.units:
            self.units[unit_id] = Unit(
                unit_id=unit_id, expected_outputs=expected_outputs, meta=meta
            )
        return self.units[unit_id]

    def mark_dirty(
        self,
        unit_id: str,
        now: float | None = None,
        expected_paths: list[str] | None = None,
    ) -> None:
        """MUST be called (and persisted) before writing unit output.

        ``expected_paths`` records where the unit WILL write (when the
        writer knows its output paths up front) so that the COMPLETE
        (>=80% present) recovery outcome can actually fire on a dirty
        unit — without it, a dirty unit has no output evidence and
        always validates CORRUPT (ADVICE round 1: the 3-outcome protocol
        otherwise degenerates to redo-everything-dirty)."""
        u = self.units[unit_id]
        u.state = "dirty"
        u.dirty_ts = time.time() if now is None else now
        if expected_paths is not None:
            u.outputs = list(expected_paths)
            u.expected_outputs = max(u.expected_outputs, len(expected_paths))
        self.save()

    def mark_clean(
        self,
        unit_id: str,
        outputs: list[str],
        rows: int,
        nbytes: int,
        snapshot_id: int | None = None,
    ) -> None:
        """Only on success — crash between dirty and clean leaves evidence."""
        u = self.units[unit_id]
        u.state = "clean"
        u.outputs = outputs
        u.rows_written = rows
        u.bytes_written = nbytes
        if snapshot_id is not None and snapshot_id not in u.lineage:
            u.lineage.append(snapshot_id)
        self.save()

    # -- recovery -----------------------------------------------------------
    def validate(
        self, unit_id: str, table_root: str, now: float | None = None
    ) -> Validation:
        """Three-outcome dirty validation (see module docstring)."""
        u = self.units[unit_id]
        if u.state == "clean":
            # trust, but verify outputs still exist (expiry may have swept them)
            if all(os.path.exists(os.path.join(table_root, o)) for o in u.outputs):
                return Validation.CLEAN
            return Validation.CORRUPT
        if u.state != "dirty":
            return Validation.CORRUPT  # pending = never started; redo
        now = time.time() if now is None else now
        if u.dirty_ts is not None and (now - u.dirty_ts) > STALE_AFTER_S:
            return Validation.STALE
        present = sum(
            1 for o in u.outputs if os.path.exists(os.path.join(table_root, o))
        )
        expected = max(u.expected_outputs, 1)
        if present / expected >= COMPLETE_FRACTION and present > 0:
            return Validation.COMPLETE
        return Validation.CORRUPT

    def units_to_redo(self, table_root: str, now: float | None = None) -> list[str]:
        """Units a restarted job must (re)process; CLEAN/COMPLETE are kept.

        For redo units, partial outputs are discarded here (the caller's
        orphan sweep would also catch them)."""
        redo = []
        for uid, u in self.units.items():
            v = self.validate(uid, table_root, now)
            if v in (Validation.CLEAN, Validation.COMPLETE):
                continue
            for o in u.outputs:
                p = os.path.join(table_root, o)
                if os.path.exists(p):
                    os.unlink(p)
            u.state = "pending"
            u.dirty_ts = None
            u.outputs = []
            redo.append(uid)
        if redo:
            self.save()
        return redo

    def has_dirty(self) -> bool:
        return any(u.state == "dirty" for u in self.units.values())

    # -- metrics ------------------------------------------------------------
    def totals(self) -> dict[str, int]:
        clean = [u for u in self.units.values() if u.state == "clean"]
        return {
            "units_total": len(self.units),
            "units_clean": len(clean),
            "rows_written": sum(u.rows_written for u in clean),
            "bytes_written": sum(u.bytes_written for u in clean),
        }
