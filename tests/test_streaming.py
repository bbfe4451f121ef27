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
