"""Incremental (CDC) scan between snapshots: exact row diff, bounded
by churned files; maintenance rewrites emit zero changes."""

import json

import pytest
from pyspark.sql import functions as F

from engine import corpus
from engine.ops.changes import changes_file_diff, scan_changes
from engine.ops.compact import compact
from engine.ops.delete import delete_where, update_where
from engine.ops.merge import merge_into
from engine.tablefmt import SnapshotNotFound, Table, append as tbl_append


def _mk(spark, tmp_path, n=120, files=6):
    root = str(tmp_path / "t")
    Table.create(root)
    df = corpus.generate_corpus(spark, n_files=n, n_repos=4, partitions=4)
    tbl_append(spark, Table.load(root), df, num_files=files)
    return Table.load(root), df


def _full_scan_oracle(spark, table, a, b):
    """Ground truth the hard way: full-table EXCEPT in both directions."""
    sa, sb = table.scan(spark, as_of=a), table.scan(spark, as_of=b)
    ins = sb.exceptAll(sa).withColumn("_change_type", F.lit("insert"))
    dels = sa.exceptAll(sb).withColumn("_change_type", F.lit("delete"))
    return ins.unionByName(dels)


def _rows(df):
    return sorted(map(repr, (tuple(r) for r in df.collect())))


def test_changes_append_all_inserts(spark, tmp_path):
    table, df = _mk(spark, tmp_path)
    ch = scan_changes(spark, table, 0, 1)
    assert ch.filter("_change_type = 'delete'").count() == 0
    assert ch.count() == df.count()
    assert corpus.corpus_digest(ch.drop("_change_type")) == (
        corpus.corpus_digest(df)
    )


def test_changes_update_is_delete_plus_insert(spark, tmp_path):
    table, df = _mk(spark, tmp_path)
    a = table.current_snapshot_id
    n_upd = df.filter("lang = 'rust'").count()
    assert n_upd > 0
    update_where(
        spark, table,
        {"content": "concat(content, ' // touched')"},
        "lang = 'rust'",
    )
    table = Table.load(table.root)
    b = table.current_snapshot_id

    ch = scan_changes(spark, table, a, b)
    assert ch.filter("_change_type = 'insert'").count() == n_upd
    assert ch.filter("_change_type = 'delete'").count() == n_upd
    # exactly the full-scan EXCEPT oracle
    assert _rows(ch) == _rows(_full_scan_oracle(spark, table, a, b))
    # updated rows pair up: same (repo, path) on both sides
    pair = (
        ch.groupBy("repo", "path")
        .agg(F.count("*").alias("n"))
        .filter("n <> 2")
    )
    assert pair.count() == 0


def test_changes_delete_only_deletes(spark, tmp_path):
    table, df = _mk(spark, tmp_path)
    a = table.current_snapshot_id
    n_del = df.filter("lang = 'go'").count()
    assert n_del > 0
    delete_where(spark, table, "lang = 'go'")
    table = Table.load(table.root)
    ch = scan_changes(spark, table, a)  # to = current (default)
    assert ch.filter("_change_type = 'insert'").count() == 0
    got = ch.filter("_change_type = 'delete'")
    assert got.count() == n_del
    assert corpus.corpus_digest(got.drop("_change_type")) == (
        corpus.corpus_digest(df.filter("lang = 'go'"))
    )


def test_changes_compact_emits_nothing(spark, tmp_path):
    table, _ = _mk(spark, tmp_path)
    a = table.current_snapshot_id
    compact(spark, table)
    table = Table.load(table.root)
    b = table.current_snapshot_id
    assert b > a
    ch = scan_changes(spark, table, a, b)
    assert ch.count() == 0
    # ...even though every file churned physically
    diff = changes_file_diff(table, a, b)
    assert diff.added and diff.removed


def test_changes_merge_matches_oracle_and_is_churn_bounded(spark, tmp_path):
    table, df = _mk(spark, tmp_path)
    a = table.current_snapshot_id
    # delta: 10 updated files + 5 brand-new ones
    upd = (
        df.orderBy("repo", "path").limit(10)
        .withColumn("content", F.concat("content", F.lit(" v2")))
        .withColumn("commit", F.lit("c_v2"))
    )
    new = corpus.generate_corpus(
        spark, n_files=5, n_repos=1, partitions=1
    ).withColumn("repo", F.lit("brand_new_repo"))
    merge_into(spark, table, upd.unionByName(new))
    table = Table.load(table.root)
    b = table.current_snapshot_id

    ch = scan_changes(spark, table, a, b)
    assert _rows(ch) == _rows(_full_scan_oracle(spark, table, a, b))
    assert ch.filter("_change_type = 'insert'").count() == 15
    assert ch.filter("_change_type = 'delete'").count() == 10
    # churn-bounded: the file diff never touches unchanged files
    diff = changes_file_diff(table, a, b)
    all_files = {e.path for e in table.files()}
    assert len(diff.added) < len(all_files)


def test_changes_expired_from_raises(spark, tmp_path):
    from engine.ops.expire import expire_snapshots

    table, _ = _mk(spark, tmp_path)
    compact(spark, table)
    table = Table.load(table.root)
    expire_snapshots(table, retain_last=1)
    table = Table.load(table.root)
    with pytest.raises(SnapshotNotFound):
        scan_changes(spark, table, 0)


def test_changes_cli(spark, tmp_path, capsys):
    from engine.jobs.maintain import main as maintain_main

    table, df = _mk(spark, tmp_path)
    delete_where(spark, table, "lang = 'go'")
    out_path = str(tmp_path / "changelog")
    rc = maintain_main([
        "--table", table.root, "--op", "changes",
        "--from-snapshot", "1", "--output", out_path,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_del = df.filter("lang = 'go'").count()
    assert out["inserts"] == 0 and out["deletes"] == n_del
    written = spark.read.parquet(out_path)
    assert written.count() == n_del
    assert set(written.columns) == set(df.columns) | {"_change_type"}
