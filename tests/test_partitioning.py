"""Bijective bin routing: murmur3 parity with Spark + one-bin-per-
partition guarantee (engine/partitioning.py)."""

import numpy as np
from pyspark.sql import functions as F

from engine.partitioning import (
    bijective_bin_proxies,
    murmur3_int32,
    repartition_by_bin,
)


def test_murmur3_matches_spark_hash(spark):
    """Our numpy murmur3 must equal F.hash(int) exactly — the routing
    depends on reproducing Spark's HashPartitioning bit-for-bit."""
    vals = list(range(0, 200)) + [2**31 - 1, -1, -2**31, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = {r["x"]: r["h"] for r in df.select("x", F.hash("x").alias("h")).collect()}
    ours = murmur3_int32(np.array(vals))
    for v, o in zip(vals, ours):
        assert got[v] == int(o), (v, got[v], int(o))


def test_proxies_are_bijective():
    for n in (1, 2, 33, 100, 257):
        proxies = bijective_bin_proxies(n)
        assert len(proxies) == n
        parts = np.mod(murmur3_int32(np.array(proxies)).astype(np.int64), n)
        assert sorted(parts.tolist()) == list(range(n))


def test_repartition_by_bin_one_bin_per_partition(spark):
    n = 33
    df = spark.range(33 * 40).select(
        (F.col("id") % n).cast("int").alias("zbin"), F.col("id").alias("payload")
    )
    routed = repartition_by_bin(df, "zbin", n)
    rows = routed.select(
        F.spark_partition_id().alias("pid"), "zbin"
    ).distinct().collect()
    pid_bins: dict[int, set] = {}
    for r in rows:
        pid_bins.setdefault(r["pid"], set()).add(r["zbin"])
    # every partition holds at most ONE bin, and all n bins are present
    assert all(len(s) == 1 for s in pid_bins.values())
    assert len(pid_bins) == n
    # schema untouched
    assert routed.columns == ["zbin", "payload"]
