"""Row-level DELETE WHERE: COW rewrite of touched files, one commit."""

import json

from pyspark.sql import functions as F

from engine import corpus
from engine.ops.delete import delete_where
from engine.tablefmt import Table, append as tbl_append


def _mk_table(spark, tmp_path, n=120, files=4):
    root = str(tmp_path / "t")
    Table.create(root)
    df = corpus.generate_corpus(spark, n_files=n, n_repos=4, partitions=4)
    tbl_append(spark, Table.load(root), df, num_files=files)
    return Table.load(root), df


def test_delete_predicate_cow(spark, tmp_path):
    table, df = _mk_table(spark, tmp_path)
    before_files = {e.path for e in table.files()}
    want_survivors = corpus.corpus_digest(df.filter("lang <> 'rust'"))
    n_rust = df.filter("lang = 'rust'").count()
    assert n_rust > 0

    r = delete_where(spark, table, "lang = 'rust'")
    assert r.rows_deleted == n_rust
    table = Table.load(table.root)
    got = table.scan(spark)
    assert got.filter("lang = 'rust'").count() == 0
    assert corpus.corpus_digest(got) == want_survivors
    # manifest row counts match physical rows
    assert table.total_rows() == df.count() - n_rust
    # only touched files were swapped; rewrites are new paths
    after_files = {e.path for e in table.files()}
    assert r.files_rewritten == len(before_files - after_files)

    # replay: nothing matches now -> no-op, no new snapshot
    r2 = delete_where(spark, table, "lang = 'rust'")
    assert r2.rows_deleted == 0 and r2.snapshot_id is None


def test_delete_untouched_files_not_rewritten(spark, tmp_path):
    """A predicate confined to one repo must leave files without
    matching rows physically in place (COW granularity = file)."""
    table, df = _mk_table(spark, tmp_path, files=8)
    before = {e.path for e in table.files()}
    r = delete_where(spark, table, "repo = 'repo_0001' AND lang = 'rust'")
    after = {e.path for e in Table.load(table.root).files()}
    kept_in_place = before & after
    assert r.files_rewritten < len(before)
    assert len(kept_in_place) == len(before) - r.files_rewritten


def test_delete_all_rows_adds_nothing(spark, tmp_path):
    table, df = _mk_table(spark, tmp_path, n=40, files=2)
    r = delete_where(spark, table, "true")
    assert r.rows_deleted == 40 and r.files_added == 0
    table = Table.load(table.root)
    assert table.total_rows() == 0 and not table.files()


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL stay."""
    root = str(tmp_path / "t")
    Table.create(root)
    df = corpus.generate_corpus(spark, n_files=30, n_repos=2, partitions=2)
    with_null = df.withColumn(
        "lang",
        F.when(F.col("path").endswith("0.rs"), F.lit(None)).otherwise(
            F.col("lang")
        ),
    )
    n_null = with_null.filter("lang IS NULL").count()
    assert n_null > 0
    tbl_append(spark, Table.load(root), with_null, num_files=2)

    r = delete_where(spark, Table.load(root), "lang = lang")  # NULL on null rows
    got = Table.load(root).scan(spark)
    assert got.count() == n_null
    assert got.filter("lang IS NULL").count() == n_null
    assert r.rows_deleted == 30 - n_null


def test_delete_by_keys_applies_sweep_drops(spark, tmp_path, capsys):
    """The operational composition: dedup_sweep --table --emit drops ->
    maintain --op delete --input drops.parquet removes exactly the
    dropped rows from the live table."""
    from engine.jobs.dedup_sweep import main as sweep_main
    from engine.jobs.maintain import main as maintain_main

    root = str(tmp_path / "t")
    df = corpus.generate_corpus(spark, n_files=60, n_repos=3, partitions=2)
    dup = (
        df.limit(2)
        .withColumn("path", F.concat(F.lit("copies/"), "path"))
    )
    Table.create(root)
    tbl_append(spark, Table.load(root), df.unionByName(dup), num_files=3)

    drops = str(tmp_path / "drops")
    assert sweep_main(["--table", root, "--method", "exact",
                       "--output", drops, "--emit", "drops"]) == 0
    assert spark.read.parquet(drops).count() == 2

    assert maintain_main(["--table", root, "--op", "delete",
                          "--input", drops]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_deleted"] == 2
    got = Table.load(root).scan(spark)
    assert got.count() == 60
    # the kept copy of each sha survives, content set intact
    assert got.select("commit").distinct().count() == 60
    assert maintain_main(["--table", root, "--op", "verify"]) == 0


def test_update_where_cow(spark, tmp_path):
    """UPDATE SET ... WHERE: matching rows transformed, others
    byte-identical; SET expressions see the pre-update row."""
    from engine.ops.delete import update_where

    table, df = _mk_table(spark, tmp_path, files=4)
    n_rust = df.filter("lang = 'rust'").count()
    want = corpus.corpus_digest(
        df.withColumn(
            "lang",
            F.when(F.col("lang") == "rust", F.concat("lang", F.lit("-v2")))
            .otherwise(F.col("lang")),
        )
    )
    before = {e.path for e in table.files()}
    r = update_where(
        spark, table, {"lang": "concat(lang, '-v2')"}, "lang = 'rust'"
    )
    assert r.rows_deleted == n_rust  # rows UPDATED
    table = Table.load(table.root)
    got = table.scan(spark)
    assert corpus.corpus_digest(got) == want
    assert got.count() == df.count()
    after = {e.path for e in table.files()}
    assert r.files_rewritten == len(before - after)

    # replay: predicate no longer matches -> no-op
    r2 = update_where(
        spark, table, {"lang": "concat(lang, '-v2')"}, "lang = 'rust'"
    )
    assert r2.rows_deleted == 0 and r2.snapshot_id is None


def test_update_where_swap_semantics(spark, tmp_path):
    """All SET expressions evaluate against the PRE-update row."""
    from engine.ops.delete import update_where

    table, df = _mk_table(spark, tmp_path, n=20, files=1)
    update_where(
        spark, table, {"repo": "path", "path": "repo"}, "true"
    )
    got = Table.load(table.root).scan(spark)
    want = {(r["path"], r["repo"]) for r in df.select("repo", "path").collect()}
    assert {(r["repo"], r["path"]) for r in got.select("repo", "path").collect()} == want


def test_update_cli(spark, tmp_path, capsys):
    import json as _json

    from engine.jobs.maintain import main as maintain_main

    table, df = _mk_table(spark, tmp_path, n=30, files=2)
    assert maintain_main([
        "--table", table.root, "--op", "update",
        "--where", "lang = 'python'", "--set", "lang=upper(lang)",
    ]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_updated"] == df.filter("lang = 'python'").count()
    got = Table.load(table.root).scan(spark)
    assert got.filter("lang = 'PYTHON'").count() == out["rows_updated"]
    assert got.filter("lang = 'python'").count() == 0


def test_rollback_restores_deleted_rows(spark, tmp_path, capsys):
    """rollback: one metadata-only commit restores the pre-delete file
    set; the rollback itself is a snapshot (history stays linear) and
    replaying it is a no-op."""
    import json as _json

    from engine.jobs.maintain import main as maintain_main
    from engine.ops.rollback import rollback_to

    table, df = _mk_table(spark, tmp_path)
    want = corpus.corpus_digest(df)
    sid_before = table.current_snapshot_id
    delete_where(spark, table, "lang = 'rust'")
    table = Table.load(table.root)
    assert table.total_rows() < df.count()

    assert maintain_main(["--table", table.root, "--op", "rollback",
                          "--snapshot-id", str(sid_before)]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rollback_to"] == sid_before and out["files_restored"] > 0
    table = Table.load(table.root)
    got = table.scan(spark)
    assert got.count() == df.count()
    assert corpus.corpus_digest(got) == want

    # replay: file sets already equal -> no-op, no new snapshot
    r2 = rollback_to(table, sid_before)
    assert r2.snapshot_id is None


def test_rollback_refuses_expired_target(spark, tmp_path):
    """A target whose files were reclaimed fails loudly instead of
    committing an unscannable snapshot."""
    import pytest

    from engine.ops.expire import expire_snapshots, sweep_orphan_files
    from engine.ops.rollback import rollback_to
    from engine.tablefmt import SnapshotNotFound

    table, df = _mk_table(spark, tmp_path, n=30, files=2)
    sid_before = table.current_snapshot_id
    delete_where(spark, table, "true")  # drop everything
    table = Table.load(table.root)
    expire_snapshots(table, retain_last=1, min_age_s=0, spark=spark)
    sweep_orphan_files(table, min_age_s=0, spark=spark)
    table = Table.load(table.root)
    with pytest.raises(SnapshotNotFound):
        rollback_to(table, sid_before)


def test_delete_conflicts_with_concurrent_commit(spark, tmp_path):
    """A commit landing between delete's detection and its own commit
    must raise CommitConflict (optimistic concurrency), not silently
    base itself on a stale snapshot."""
    import pytest

    from engine.ops import delete as delete_mod
    from engine.tablefmt import CommitConflict

    table, df = _mk_table(spark, tmp_path, n=40, files=2)

    real_scan = table.scan
    state = {"raced": False}

    def racing_scan(*a, **kw):
        out = real_scan(*a, **kw)
        if not state["raced"]:
            state["raced"] = True
            tbl_append(
                spark, Table.load(table.root),
                corpus.generate_corpus(spark, n_files=5, n_repos=1,
                                       partitions=1),
                num_files=1,
            )
        return out

    table.scan = racing_scan
    with pytest.raises(CommitConflict):
        delete_mod.delete_where(spark, table, "lang = 'rust'")
