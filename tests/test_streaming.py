"""Streaming ingest: AvailableNow drain -> MERGE sink, idempotent replay."""

import os

from engine import corpus
from engine.streaming import ingest_directory
from engine.tablefmt import Table


def test_stream_ingest_available_now(spark, tmp_path):
    drop = str(tmp_path / "drop")
    df = corpus.generate_corpus(spark, n_files=120, n_repos=4, partitions=4)
    df.write.parquet(drop)

    t = Table.create(str(tmp_path / "t"))
    q = ingest_directory(spark, drop, t, max_files_per_batch=2)
    q.awaitTermination(120)
    assert t.scan(spark).count() == 120
    assert corpus.corpus_digest(t.scan(spark)) == corpus.corpus_digest(df)
    # several micro-batches, each a snapshot commit
    assert t.current_snapshot_id >= 1
    assert all(r.rows_deleted == 0 for r in q._merge_results)

    # replay with a fresh stream checkpoint: every batch MERGEs to no-op
    q2 = ingest_directory(
        spark, drop, t, max_files_per_batch=2,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert t.scan(spark).count() == 120
    assert all(r.counts == (0, 0, 0) for r in q2._merge_results)


def test_windowed_rollup_with_watermark(spark, tmp_path):
    """Event-time tumbling windows + watermark: finalized windows emit
    exactly once in append mode; counts match the batch ground truth."""
    from pyspark.sql import functions as F

    from engine.streaming import windowed_commit_rollup

    drop = str(tmp_path / "events")
    # events across 3 hours: window(10m) x repo counts are deterministic
    events = spark.range(600).select(
        F.format_string("repo_%d", F.col("id") % 3).alias("repo"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id") * 18)).alias("ts"),
    )
    events.write.parquet(drop)

    stream = spark.readStream.schema("repo string, ts timestamp").parquet(drop)
    rolled = windowed_commit_rollup(stream, window="10 minutes", watermark="20 minutes")
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"].isoformat(), r["repo"]): r["n_commits"]
        for r in spark.sql("SELECT * FROM rollup").collect()
    }
    assert got, "watermark should have finalized early windows"
    want = {
        (r["win_start"].isoformat(), r["repo"]): r["n_commits"]
        for r in events.groupBy(F.window("ts", "10 minutes"), "repo")
        .agg(F.count("*").alias("n_commits"))
        .select(F.col("window.start").alias("win_start"), "repo", "n_commits")
        .collect()
    }
    for k, v in got.items():  # every emitted window matches ground truth
        assert want[k] == v, k
    # no duplicates emitted
    assert len(got) == spark.sql("SELECT count(*) FROM rollup").collect()[0][0]


def test_stateful_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: a key re-arriving in a
    LATER micro-batch is suppressed; first occurrences all pass."""
    from pyspark.sql import functions as F

    from engine.streaming import stateful_first_seen

    drop = str(tmp_path / "drop")
    base = corpus.generate_corpus(spark, n_files=60, n_repos=3, partitions=1)
    # batch 1: files 0-39; batch 2: files 20-59 (20 duplicates)
    b1 = base.limit(40)
    b2 = base.subtract(base.limit(20))
    b1.coalesce(1).write.parquet(drop + "/f1")
    b2.coalesce(1).write.parquet(drop + "/f2")
    import glob as g
    import shutil

    os.makedirs(drop + "/in")
    for i, f in enumerate(sorted(g.glob(drop + "/f1/*.parquet"))):
        shutil.copy(f, f"{drop}/in/a{i}.parquet")
    for i, f in enumerate(sorted(g.glob(drop + "/f2/*.parquet"))):
        shutil.copy(f, f"{drop}/in/b{i}.parquet")

    from engine.tablefmt import CORPUS_SCHEMA

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop + "/in")
    )
    deduped = stateful_first_seen(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("firstseen")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT repo, path FROM firstseen").collect()
    keys = [(r["repo"], r["path"]) for r in out]
    assert len(keys) == len(set(keys)), "cross-batch duplicate leaked through"
    assert sorted(set(keys)) == sorted(
        (r["repo"], r["path"]) for r in base.select("repo", "path").collect()
    )


def test_stateful_first_seen_matches_batch_twin(spark, tmp_path):
    """The streamed stateful dedup (order_cols) over time-ordered
    micro-batches is row-identical to the batch window query — the
    oracle-checked `first_seen_dedup` driver entry (round-3 VERDICT:
    the stateful op lacked an oracle twin)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from engine.streaming import stateful_first_seen

    sf_dir = os.environ.get("QUERY_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # replay the event log in time order, 5 micro-batches
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    n = events.count()
    ordered = events.orderBy("ts", "event_id")
    per = (n + 4) // 5
    rows = ordered.collect()
    for b in range(5):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(
                f"{drop}/b{b}"
            )
    import glob as g
    import shutil

    os.makedirs(f"{drop}/in")
    for b in range(5):
        for i, f in enumerate(sorted(g.glob(f"{drop}/b{b}/*.parquet"))):
            shutil.copy(f, f"{drop}/in/{b}_{i}.parquet")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/in")
    )
    deduped = stateful_first_seen(
        stream, group_col="user_id", dedup_col="event_type",
        order_cols=["ts", "event_id"],
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("firstseen_twin")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["event_type"], r["event_id"])
        for r in spark.sql(
            "SELECT user_id, event_type, event_id FROM firstseen_twin"
        ).collect()
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    want = sorted(
        (r["user_id"], r["event_type"], r["event_id"])
        for r in events.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    )
    assert got == want


def test_ingest_stream_dedup(spark, tmp_path):
    """Dedup-at-ingest: within-batch near-dups dropped greedily,
    cross-batch near-dups dropped against the signature index, fresh
    docs survive, and a replayed batch changes nothing (corpus merge
    no-op + signature anti-join)."""
    import time as _time

    from engine.streaming import create_signature_table, ingest_stream_dedup
    from engine.tablefmt import CORPUS_SCHEMA, Table

    root = str(tmp_path / "t"); sroot = str(tmp_path / "sigs")
    drop = str(tmp_path / "drop"); os.makedirs(drop)
    Table.create(root)
    create_signature_table(sroot)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    near = base.replace("zeta", "MUTANT", 1)
    fresh = " ".join(f"w{i} x{i} y{i}" for i in range(40))

    def row(repo, path, text):
        return (repo, path, "c0", "rust", text)

    b1 = spark.createDataFrame(
        [row("r1", "a.rs", base), row("r1", "b.rs", fresh)], CORPUS_SCHEMA
    )
    b1.coalesce(1).write.parquet(os.path.join(drop, "f1"))
    q = ingest_stream_dedup(
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*")),
        Table.load(root), Table.load(sroot),
    )
    q.awaitTermination(120)
    assert Table.load(root).total_rows() == 2
    assert Table.load(sroot).total_rows() == 2

    # batch 2: near-dup of an INDEXED doc + a within-batch duplicate
    # pair + one fresh doc
    fresh2 = " ".join(f"q{i} r{i} s{i}" for i in range(40))
    b2 = spark.createDataFrame(
        [row("r2", "near.rs", near),        # near-dup of indexed a.rs
         row("r2", "d1.rs", fresh2),        # within-batch twin (kept)
         row("r2", "d2.rs", fresh2),        # within-batch twin (dropped)
         row("r2", "new.rs", " ".join(f"z{i} u{i} v{i}" for i in range(40)))],
        CORPUS_SCHEMA,
    )
    b2.coalesce(1).write.parquet(os.path.join(drop, "f2"))
    q2 = ingest_stream_dedup(
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(drop, "*")),
        Table.load(root), Table.load(sroot),
        checkpoint_dir=os.path.join(root, "_stream_dedup_checkpoint"),
    )
    q2.awaitTermination(180)
    got = Table.load(root).scan(spark)
    paths = {r["path"] for r in got.select("path").collect()}
    assert paths == {"a.rs", "b.rs", "d1.rs", "new.rs"}, paths
    assert Table.load(sroot).total_rows() == 4

    # replay the batch through the sink directly: everything no-ops
    q2._dedup_sink(b2, 99)
    assert Table.load(root).total_rows() == 4
    assert Table.load(sroot).total_rows() == 4
    last = q2._dedup_results[-1]
    assert last["rows_ingested"] == 0 and last["sigs_added"] == 0
    assert last["sigs_removed"] == 0

    # batch 3: a new VERSION of indexed a.rs (near-identical content,
    # different commit).  This is an UPDATE, not a near-dup of its own
    # previous version — it must pass the against-index sweep, merge as
    # an update, and REPLACE a.rs's signature (index mirrors corpus:
    # one signature per (repo, path)).  It also carries two versions of
    # ONE new file in the same batch: last-writer-wins must keep the
    # max-commit version even though greedy near-dup sweep would have
    # kept the lexicographically smaller identity.
    edited = base.replace("kappa", "REVISED", 1)
    two_txt = " ".join(f"m{i} n{i} o{i}" for i in range(40))
    b3 = spark.createDataFrame(
        [("r1", "a.rs", "c1", "rust", edited),
         ("r3", "two.rs", "c0", "rust", two_txt + " old"),
         ("r3", "two.rs", "c9", "rust", two_txt + " new")],
        CORPUS_SCHEMA,
    )
    q2._dedup_sink(b3, 100)
    got3 = {
        (r["path"], r["commit"]): r["content"]
        for r in Table.load(root).scan(spark).collect()
    }
    assert got3[("a.rs", "c1")] == edited          # update went through
    assert ("two.rs", "c9") in got3                 # newer version won
    assert ("two.rs", "c0") not in got3
    sig_ids = {
        r["doc_id"] for r in Table.load(sroot).scan(spark).collect()
    }
    assert "r1\x1fa.rs\x1fc1" in sig_ids            # new sig appended
    assert "r1\x1fa.rs\x1fc0" not in sig_ids        # stale sig pruned
    assert Table.load(sroot).total_rows() == 5      # one per (repo,path)
    last = q2._dedup_results[-1]
    assert last["sigs_removed"] == 1 and last["sigs_added"] == 2


def test_reconcile_signature_index_after_corpus_delete(spark, tmp_path, capsys):
    """Row-level DELETE on the corpus orphans its signature; without the
    reconcile op the ghost signature vetoes re-ingestion of similar
    content forever.  reconcile-sigs (CLI) restores the mirror."""
    import json

    from pyspark.sql import functions as F

    from engine.dedup import minhash_signatures
    from engine.jobs.maintain import main as maintain_main
    from engine.ops.delete import delete_where
    from engine.streaming import create_signature_table
    from engine.tablefmt import (
        CORPUS_SCHEMA, ROW_IDENTITY_SQL, Table, append as tbl_append,
    )

    root = str(tmp_path / "t"); sroot = str(tmp_path / "sigs")
    t = Table.create(root)
    s = create_signature_table(sroot)

    docs = spark.createDataFrame(
        [("r1", "a.rs", "c0", "rust", "alpha beta gamma " * 20),
         ("r1", "b.rs", "c0", "rust", "delta epsilon zeta " * 20)],
        CORPUS_SCHEMA,
    )
    tbl_append(spark, t, docs)
    tbl_append(
        spark, s,
        minhash_signatures(
            docs.withColumn("_id", F.expr(ROW_IDENTITY_SQL)), "_id", "content"
        ),
    )
    assert s.total_rows() == 2

    delete_where(spark, t, predicate="path = 'a.rs'")
    assert Table.load(root).total_rows() == 1

    rc = maintain_main([
        "--table", root, "--op", "reconcile-sigs", "--sigs-table", sroot,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sigs_removed"] == 1
    left = {r["doc_id"] for r in Table.load(sroot).scan(spark).collect()}
    assert left == {"r1\x1fb.rs\x1fc0"}

    # idempotent: a second run is a no-op
    rc = maintain_main([
        "--table", root, "--op", "reconcile-sigs", "--sigs-table", sroot,
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["sigs_removed"] == 0
    assert Table.load(sroot).total_rows() == 1
