"""Concurrent writers: first-writer-wins + loser re-plan, no duplicates.

Mirrors the reference's lock suite
(/root/reference/src/client/tests.rs:995-1109): a second concurrent
writer must not duplicate work; it observes the winner's result.
"""

import threading

from pyspark.sql import functions as F

from engine import corpus, tablefmt
from engine.ops.merge import merge_with_retry
from engine.tablefmt import Table


def test_concurrent_merges_both_land(spark, tmp_path):
    base = corpus.generate_corpus(
        spark, n_files=200, n_repos=4, partitions=4, version_col=True
    )
    t = Table.create(str(tmp_path / "t"))
    tablefmt.append(spark, t, base, num_files=4)

    d1 = corpus.bump_versions(base.filter(F.col("repo") == "repo_0000").limit(5))
    d2 = corpus.bump_versions(base.filter(F.col("repo") == "repo_0001").limit(5))

    results = {}
    errs = []

    def run(name, delta):
        try:
            results[name] = merge_with_retry(spark, t, delta)
        except Exception as e:  # pragma: no cover
            errs.append((name, e))

    th1 = threading.Thread(target=run, args=("a", d1))
    th2 = threading.Thread(target=run, args=("b", d2))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs, errs

    assert results["a"].counts == (0, 5, 0)
    assert results["b"].counts == (0, 5, 0)
    assert t.total_rows() == 200
    # both deltas are visible in the final state
    final = t.scan(spark)
    cols = final.columns
    expected = (
        base.filter(~F.col("repo").isin("repo_0000", "repo_0001"))
        .select(*cols)
        .unionByName(
            base.filter(F.col("repo").isin("repo_0000", "repo_0001"))
            .join(
                d1.select("repo", "path").unionByName(d2.select("repo", "path")),
                ["repo", "path"],
                "left_anti",
            )
            .select(*cols)
        )
        .unionByName(d1.select(*cols))
        .unionByName(d2.select(*cols))
    )
    assert corpus.corpus_digest(final) == corpus.corpus_digest(expected)


def test_replayed_merge_after_winner_is_noop(spark, tmp_path):
    """The loser replaying the winner's exact delta observes a no-op."""
    base = corpus.generate_corpus(
        spark, n_files=100, n_repos=3, partitions=2, version_col=True
    )
    t = Table.create(str(tmp_path / "t"))
    tablefmt.append(spark, t, base, num_files=2)
    delta = corpus.bump_versions(base.limit(7))
    r1 = merge_with_retry(spark, t, delta)
    assert r1.counts == (0, 7, 0)
    r2 = merge_with_retry(spark, t, delta)
    assert r2.counts == (0, 0, 0)
    assert r2.snapshot_id is None
