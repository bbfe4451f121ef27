"""Checkpoint ledger: dirty/clean lifecycle + 3-outcome validation
(mirrors /root/reference/src/client/indexing/mod.rs:848-947)."""

import os
import time

from engine.checkpoint import STALE_AFTER_S, Ledger, Validation


def _touch(root, rel):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write("x")
    return rel


def test_lifecycle_and_persistence(tmp_path):
    root = str(tmp_path)
    led = Ledger.open(root, "job1", meta={"op": "compact"})
    led.register("u1", expected_outputs=1)
    led.mark_dirty("u1")

    # reload from disk: dirty state survives a crash
    led2 = Ledger.open(root, "job1")
    assert led2.units["u1"].state == "dirty"

    out = _touch(root, "data/f1.parquet")
    led2.mark_clean("u1", [out], rows=10, nbytes=100, snapshot_id=7)
    led3 = Ledger.open(root, "job1")
    u = led3.units["u1"]
    assert u.state == "clean" and u.lineage == [7]
    assert led3.totals()["rows_written"] == 10


def test_validation_three_outcomes(tmp_path):
    root = str(tmp_path)
    led = Ledger.open(root, "job2")
    now = time.time()

    # CLEAN: outputs present
    led.register("clean_u")
    led.mark_dirty("clean_u", now=now)
    led.mark_clean("clean_u", [_touch(root, "data/a.parquet")], 1, 1)
    assert led.validate("clean_u", root, now) == Validation.CLEAN

    # STALE: dirty for > 2h
    led.register("stale_u")
    led.mark_dirty("stale_u", now=now - STALE_AFTER_S - 10)
    assert led.validate("stale_u", root, now) == Validation.STALE

    # COMPLETE: fresh dirty but >= 80% of expected outputs exist
    led.register("complete_u", expected_outputs=2)
    led.mark_dirty("complete_u", now=now)
    led.units["complete_u"].outputs = [
        _touch(root, "data/b1.parquet"),
        _touch(root, "data/b2.parquet"),
    ]
    assert led.validate("complete_u", root, now) == Validation.COMPLETE

    # CORRUPT: fresh dirty, no outputs
    led.register("corrupt_u", expected_outputs=3)
    led.mark_dirty("corrupt_u", now=now)
    assert led.validate("corrupt_u", root, now) == Validation.CORRUPT

    # CLEAN whose outputs were swept -> CORRUPT (must redo)
    led.register("swept_u")
    led.mark_dirty("swept_u", now=now)
    gone = _touch(root, "data/gone.parquet")
    led.mark_clean("swept_u", [gone], 1, 1)
    os.unlink(os.path.join(root, gone))
    assert led.validate("swept_u", root, now) == Validation.CORRUPT


def test_units_to_redo_discards_partials(tmp_path):
    root = str(tmp_path)
    led = Ledger.open(root, "job3")
    now = time.time()
    led.register("done")
    led.mark_dirty("done", now=now)
    led.mark_clean("done", [_touch(root, "data/done.parquet")], 5, 50)

    led.register("partial", expected_outputs=4)
    led.mark_dirty("partial", now=now)
    led.units["partial"].outputs = [_touch(root, "data/p1.parquet")]
    led.save()

    redo = led.units_to_redo(root, now)
    assert redo == ["partial"]
    # partial output discarded
    assert not os.path.exists(os.path.join(root, "data/p1.parquet"))
    # finished unit untouched
    assert os.path.exists(os.path.join(root, "data/done.parquet"))
    assert led.units["partial"].state == "pending"


def test_complete_via_mark_dirty_expected_paths(tmp_path):
    """mark_dirty(expected_paths=...) makes the COMPLETE outcome real:
    a crash after outputs landed but before mark_clean validates
    COMPLETE, and units_to_redo keeps (does not discard) the unit."""
    root = str(tmp_path)
    led = Ledger.open(root, "job4")
    now = time.time()
    led.register("u", expected_outputs=2)
    paths = ["data/x1.parquet", "data/x2.parquet"]
    led.mark_dirty("u", now=now, expected_paths=paths)
    # before any output exists: CORRUPT (must redo)
    assert led.validate("u", root, now) == Validation.CORRUPT
    for p in paths:
        _touch(root, p)
    assert led.validate("u", root, now) == Validation.COMPLETE
    assert led.units_to_redo(root, now) == []
    assert all(os.path.exists(os.path.join(root, p)) for p in paths)
