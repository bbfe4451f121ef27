"""Skew: salted repartition bounds task imbalance on a mega-repo corpus."""

from engine import corpus
from engine.skew import partition_row_counts, salted_repartition, skew_metrics


def test_skewed_corpus_is_skewed(spark):
    df = corpus.generate_corpus(spark, n_files=2000, n_repos=10, skew=True, partitions=8)
    m = skew_metrics(df, "repo")
    assert m["skew_ratio"] > 3  # repo_0000 holds ~30%


def test_salting_balances_partitions(spark):
    df = corpus.generate_corpus(spark, n_files=2000, n_repos=10, skew=True, partitions=8)
    # naive repartition by repo: hot repo lands in one task
    naive = df.repartition(8, "repo")
    naive_counts = partition_row_counts(naive)
    salted = salted_repartition(df, 8, "repo", n_salts=16)
    salted_counts = partition_row_counts(salted)

    def imbalance(counts):
        nonzero = [c for c in counts if c > 0]
        med = sorted(nonzero)[len(nonzero) // 2]
        return max(nonzero) / max(med, 1)

    assert imbalance(salted_counts) < imbalance(naive_counts)
    # no task holds more than 4x the median (SURVEY §7.2.7 criterion)
    assert imbalance(salted_counts) <= 4
    # salting preserves rows
    assert sum(salted_counts) == 2000


def test_salt_is_deterministic(spark):
    from engine.skew import with_salt

    df = corpus.generate_corpus(spark, n_files=100, n_repos=4, partitions=4)
    a = with_salt(df).select("path", "salt").collect()
    b = with_salt(df).select("path", "salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_vals = {r["salt"] for r in a}
    assert n_vals.issubset(set(range(16)))
