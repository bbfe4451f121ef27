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


def test_incremental_pipeline_changes_sweep_delete(spark, tmp_path, capsys):
    """The 100-TB loop, end-to-end through both CLIs: signature-index
    the corpus ONCE, then each delta = CDC changelog -> sweep --against
    the index -> apply the drop set.  The corpus text is never re-read
    after the initial indexing."""
    from engine.jobs.dedup_sweep import main as sweep_main
    from engine.jobs.maintain import main as maintain_main

    table, df = _mk(spark, tmp_path, n=40, files=2)
    # one doc with UNIQUE content (the generated corpus is templated —
    # docs are mutually 0.75+ similar — so step 6 needs a doc whose
    # only near-dup in the index can be its own previous version)
    uniq = " ".join(f"ux{i} uy{i} uz{i}" for i in range(60))
    merge_into(spark, table, spark.createDataFrame(
        [("rU", "uniq.rs", "c1", "rust", uniq)], df.schema))
    table = Table.load(table.root)

    # 1. index the corpus once
    sigs = str(tmp_path / "sigs.parquet")
    sweep_main(["--table", table.root, "--method", "minhash",
                "--emit", "signatures", "--output", sigs])
    ckpt = Table.load(table.root).current_snapshot_id

    # 2. delta lands: a near-dup of an indexed doc + a fresh doc
    some = df.orderBy("repo", "path").limit(1).collect()[0]
    delta = spark.createDataFrame(
        [("rX", "nd.rs", "c0", some["lang"],
          some["content"] + " tiny trailing tweak"),
         ("rX", "fresh.rs", "c0", "rust",
          " ".join(f"tok{i} tik{i}" for i in range(60)))],
        df.schema,
    )
    merge_into(spark, table, delta)
    table = Table.load(table.root)

    # 3. CDC changelog since the checkpoint (2 inserts, 0 deletes)
    chlog = str(tmp_path / "delta.parquet")
    maintain_main(["--table", table.root, "--op", "changes",
                   "--from-snapshot", str(ckpt), "--output", chlog])

    # 4. sweep ONLY the delta against the index (load_corpus
    #    synthesizes the same \x1f identity from the natural key)
    drops = str(tmp_path / "drops.parquet")
    sweep_main(["--input", chlog, "--method", "minhash",
                "--against", sigs, "--emit", "drops",
                "--output", drops, "--text-col", "content",
                "--threshold", "0.4"])
    drop_ids = {r["doc_id"] for r in spark.read.parquet(drops).collect()}
    assert drop_ids == {"rX\x1fnd.rs\x1fc0"}

    # 5. apply the drop set as a row-level delete
    maintain_main(["--table", table.root, "--op", "delete",
                   "--input", drops])
    paths = {
        r["path"]
        for r in Table.load(table.root).scan(spark)
        .select("path").collect()
    }
    assert "nd.rs" not in paths and "fresh.rs" in paths
    assert Table.load(table.root).total_rows() == 42

    # 6. an UPDATE of an indexed doc must flow through the loop
    #    WITHOUT being dropped: its only index match is its own
    #    previous version (same (repo, path), excluded), and the
    #    changelog's delete-typed old version is not a live batch doc
    table = Table.load(table.root)
    ckpt2 = table.current_snapshot_id
    upd = spark.createDataFrame(
        [("rU", "uniq.rs", "c_v2", "rust", uniq + " edited")],
        df.schema,
    )
    merge_into(spark, table, upd)
    table = Table.load(table.root)
    chlog2 = str(tmp_path / "delta2.parquet")
    maintain_main(["--table", table.root, "--op", "changes",
                   "--from-snapshot", str(ckpt2), "--output", chlog2])
    ch2 = spark.read.parquet(chlog2)
    assert ch2.filter("_change_type = 'insert'").count() == 1
    assert ch2.filter("_change_type = 'delete'").count() == 1
    drops2 = str(tmp_path / "drops2.parquet")
    sweep_main(["--input", chlog2, "--method", "minhash",
                "--against", sigs, "--emit", "drops",
                "--output", drops2, "--text-col", "content",
                "--threshold", "0.4"])
    assert spark.read.parquet(drops2).count() == 0
    # --emit keep over the changelog yields ONLY the live insert row,
    # never the delete-typed old version (which would resurrect it)
    keep2 = str(tmp_path / "keep2.parquet")
    sweep_main(["--input", chlog2, "--method", "minhash",
                "--against", sigs, "--emit", "keep",
                "--output", keep2, "--text-col", "content",
                "--threshold", "0.4"])
    kept = spark.read.parquet(keep2).select("commit").collect()
    assert [r["commit"] for r in kept] == ["c_v2"]


def test_changes_reversed_range_raises(spark, tmp_path):
    table, _ = _mk(spark, tmp_path, n=20, files=2)
    compact(spark, table)
    table = Table.load(table.root)
    with pytest.raises(ValueError, match="reversed"):
        scan_changes(spark, table, table.current_snapshot_id, 1)


def test_changes_cli_overwrites_existing_output(spark, tmp_path, capsys):
    from engine.jobs.maintain import main as maintain_main

    table, df = _mk(spark, tmp_path, n=20, files=2)
    out_path = str(tmp_path / "changelog")
    for _ in range(2):  # second run must overwrite, not crash
        rc = maintain_main([
            "--table", table.root, "--op", "changes",
            "--from-snapshot", "0", "--output", out_path,
        ])
        assert rc == 0
    assert spark.read.parquet(out_path).count() == df.count()


def test_changes_survives_mid_range_expiry(spark, tmp_path):
    """Only the two ENDPOINT snapshots must be alive: the diff reads
    their manifests alone, so expiring every snapshot in between (the
    normal retention policy on a busy table) cannot break an
    incremental consumer whose checkpoint is still retained."""
    from engine.ops.expire import expire_snapshots

    table, df = _mk(spark, tmp_path)
    a = table.current_snapshot_id
    delete_where(spark, table, "lang = 'go'")
    update_where(
        spark, table, {"content": "concat(content, ' t')"}, "lang = 'rust'"
    )
    compact(spark, table)
    table = Table.load(table.root)
    b = table.current_snapshot_id
    want = _rows(_full_scan_oracle(spark, table, a, b))

    expire_snapshots(table, retain_ids=[a, b], min_age_s=0)
    table = Table.load(table.root)
    assert _rows(scan_changes(spark, table, a, b)) == want
    n_go = df.filter("lang = 'go'").count()
    got = scan_changes(spark, table, a, b)
    assert got.filter("_change_type = 'delete'").count() >= n_go


def test_changes_generic_schema_array_column(spark, tmp_path):
    """scan_changes is schema-generic: the to_json row fingerprint must
    handle non-scalar columns (the signature index: doc_id + 8 longs)."""
    from engine.streaming import create_signature_table

    s = create_signature_table(str(tmp_path / "sigs"))
    rows1 = [(f"d{i}", [i, i + 1, i + 2]) for i in range(20)]
    tbl_append(spark, s, spark.createDataFrame(rows1, s.schema))
    a = Table.load(s.root).current_snapshot_id
    # replace one signature's fp (delete + re-append = an update)
    delete_where(spark, Table.load(s.root), "doc_id = 'd3'")
    tbl_append(
        spark, Table.load(s.root),
        spark.createDataFrame([("d3", [99, 98, 97])], s.schema),
    )
    s = Table.load(s.root)
    ch = scan_changes(spark, s, a)
    got = {
        (r["doc_id"], tuple(r["fp"]), r["_change_type"])
        for r in ch.collect()
    }
    assert got == {
        ("d3", (3, 4, 5), "delete"),
        ("d3", (99, 98, 97), "insert"),
    }
