"""Table layer: round-trip, atomic commit, pruning, time travel.

Mirrors the reference's store-level suite
(/root/reference/src/vector_db/lance_client/tests.rs): store/retrieve
roundtrip, filters, statistics — re-expressed against our table format.
"""

import pytest

from engine import corpus, tablefmt
from engine.tablefmt import CommitConflict, SnapshotNotFound, Table


@pytest.fixture()
def tiny(spark):
    return corpus.generate_corpus(spark, n_files=200, n_repos=5, partitions=4)


def test_roundtrip_digest(spark, tiny, tmp_path):
    """Full scan after commit is set-equal (sha256 digest) to the source."""
    t = Table.create(str(tmp_path / "t"))
    tablefmt.append(spark, t, tiny, num_files=4)
    assert corpus.corpus_digest(t.scan(spark)) == corpus.corpus_digest(tiny)
    assert t.total_rows() == 200


def test_append_accumulates_snapshots(spark, tiny, tmp_path):
    t = Table.create(str(tmp_path / "t"))
    tablefmt.append(spark, t, tiny.limit(50), num_files=2)
    tablefmt.append(spark, t, tiny.limit(50), num_files=2)
    assert t.current_snapshot_id == 2
    assert t.total_rows() == 100
    # time travel: snapshot 1 still reads 50 rows
    assert t.scan(spark, as_of=1).count() == 50


def test_commit_conflict_first_writer_wins(spark, tiny, tmp_path):
    t = Table.create(str(tmp_path / "t"))
    files = t.write_data_files(spark, tiny, num_files=2)
    t.commit("append", files)
    # a second writer that planned against parent 0 must lose
    with pytest.raises(CommitConflict):
        t.commit("append", files, expected_parent=0)


def test_snapshot_not_found(tmp_path):
    t = Table.create(str(tmp_path / "t"))
    with pytest.raises(SnapshotNotFound):
        t.snapshot(99)


def test_manifest_pruning_by_repo(spark, tiny, tmp_path):
    """Files written per-repo are pruned by an equality predicate."""
    t = Table.create(str(tmp_path / "t"))
    files = []
    for r in ["repo_0000", "repo_0001", "repo_0002", "repo_0003", "repo_0004"]:
        files += t.write_data_files(
            spark, tiny.filter(f"repo = '{r}'"), partition=r, num_files=1
        )
    t.commit("append", files)
    pred = [("repo", "==", "repo_0002")]
    pruned = t.files(pred=pred)
    assert len(pruned) == 1
    all_files = t.files()
    assert len(all_files) == 5
    # scan result matches plain filter
    got = t.scan(spark, pred=pred).count()
    want = tiny.filter("repo = 'repo_0002'").count()
    assert got == want


def test_scan_columns_and_empty_table(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"))
    df = t.scan(spark, columns=["repo", "path"])
    assert df.columns == ["repo", "path"]
    assert df.count() == 0


def test_corpus_deterministic(spark):
    a = corpus.generate_corpus(spark, n_files=100, n_repos=5, partitions=2)
    b = corpus.generate_corpus(spark, n_files=100, n_repos=5, partitions=7)
    assert corpus.corpus_digest(a) == corpus.corpus_digest(b)
    # (repo, path) is a primary key
    assert a.select("repo", "path").distinct().count() == 100
