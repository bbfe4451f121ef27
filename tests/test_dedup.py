"""SimHash: fingerprint properties + near-dup banding recall."""

import pandas as pd
from pyspark.sql import functions as F

from engine import corpus
from engine.dedup import simhash_batch, simhash_near_dups, with_simhash


def test_simhash_identical_and_perturbed():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about spark shuffles " * 10
    s = simhash_batch(pd.Series([base, base, near, far]))
    assert s[0] == s[1]  # identical text, identical signature
    ham_near = bin(int(s[0]) ^ int(s[2])).count("1")
    ham_far = bin(int(s[0]) ^ int(s[3])).count("1")
    assert ham_near < ham_far
    assert ham_near <= 8


def test_simhash_near_dups_finds_planted_pair(spark):
    df = corpus.generate_corpus(spark, n_files=80, n_repos=3, partitions=2)
    # plant an exact duplicate content under a different key
    dup = (
        df.limit(1)
        .withColumn("path", F.lit("src/dup/planted.rs"))
        .withColumn("repo", F.lit("repo_0001"))
    )
    all_docs = df.unionByName(dup).withColumn(
        "doc_key", F.concat_ws("/", "repo", "path")
    )
    pairs = simhash_near_dups(all_docs, "doc_key", "content", max_hamming=3).collect()
    planted = [
        p
        for p in pairs
        if "src/dup/planted.rs" in (p["id_a"], p["id_b"])
        or p["id_a"].endswith("planted.rs")
        or p["id_b"].endswith("planted.rs")
    ]
    # the exact duplicate is recalled with hamming distance 0
    assert any(p["hamming"] == 0 for p in planted), planted


def test_simhash_udf_runs_vectorized(spark):
    df = corpus.generate_corpus(spark, n_files=50, n_repos=2, partitions=2)
    out = with_simhash(df).select("simhash").collect()
    assert len({r["simhash"] for r in out}) > 1
