"""Bijective bin -> shuffle-partition routing.

``df.repartition(n, "bin")`` HASH-partitions the n distinct bin ids into
n partitions — a birthday problem, not a bijection: at n=33 only ~20
partitions are occupied and the worst partition carries THREE bins
(measured).  For bin-parallel rewrite jobs (compaction bins, cluster
zbins) that is a hard scaling ceiling: the critical-path task does 3
bins of sort+encode+write no matter how many cores exist — the round-3
profile showed the cluster write stage with 21/32 executor threads
parked on it.

Fix: route on a PROXY integer chosen per bin such that Spark's
Murmur3(proxy) pmod n == bin.  The mapping is computed driver-side
(coupon-collector over a vectorized murmur3 — O(n log n) hashes, numpy;
~11M hashes even at the 100-TB scale point of ~800k output files), and
applied either as an ``element_at`` literal (small n, zero extra plan
nodes) or a broadcast join (large n, so the plan never embeds an 800k
literal).  The result: exactly n occupied partitions, one bin each.

Cited behavior: Spark HashPartitioning = ``pmod(hash(cols, seed=42),
numPartitions)`` with Murmur3_x86_32; hashInt reproduced below and
pinned by tests/test_partitioning.py against ``F.hash`` itself.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# above this many bins, ship the mapping as a broadcast join instead of
# an in-plan array literal
LITERAL_LIMIT = 4096


def murmur3_int32(values: np.ndarray, seed: int = 42) -> np.ndarray:
    """Spark's Murmur3_x86_32.hashInt over an int array, vectorized.

    Returns signed int32 results identical to ``F.hash(int_col)``."""
    # int64 -> uint32 via astype: C-cast truncation (mod 2^32), safe for
    # negative inputs on every numpy version (direct uint32 construction
    # from negatives raises on numpy >= 2)
    k = np.asarray(values, dtype=np.int64).astype(np.uint32)
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    k *= c1
    k = (k << np.uint32(15)) | (k >> np.uint32(17))
    k *= c2
    h = np.uint32(seed) ^ k
    h = (h << np.uint32(13)) | (h >> np.uint32(19))
    h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h ^= np.uint32(4)  # len in bytes
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h.astype(np.int32)


def bijective_bin_proxies(n: int) -> list[int]:
    """proxies[b] = smallest k with pmod(murmur3(k), n) == b.

    Coupon-collector sweep in numpy batches: expected O(n log n) hash
    evaluations, no per-bin linear search."""
    if n <= 0:
        raise ValueError(n)
    proxies = np.full(n, -1, dtype=np.int64)
    found = 0
    start = 0
    batch = max(1024, 4 * n)
    while found < n:
        ks = np.arange(start, start + batch, dtype=np.int64)
        part = np.mod(murmur3_int32(ks).astype(np.int64), n)  # pmod
        # first k per partition within this batch
        order = np.argsort(part, kind="stable")
        p_sorted = part[order]
        first_idx = order[np.unique(p_sorted, return_index=True)[1]]
        for idx in first_idx:
            b = part[idx]
            if proxies[b] < 0:
                proxies[b] = ks[idx]
                found += 1
        start += batch
    return proxies.tolist()


def repartition_by_bin(df: DataFrame, bin_col: str, n: int) -> DataFrame:
    """Exactly-n-partition shuffle with ONE bin per partition.

    ``bin_col`` must hold ints in [0, n).  Adds a proxy routing column,
    hash-repartitions on it (bijective by construction), and drops it —
    callers see the same schema back."""
    proxies = bijective_bin_proxies(n)
    # _route MUST be IntegerType: Spark hashes int32 with hashInt (what
    # murmur3_int32 reproduces) but int64 with hashLong — a silent type
    # widening would re-randomize the routing.
    if n <= LITERAL_LIMIT:
        proxy = F.element_at(
            F.array(*[F.lit(int(p)).cast("int") for p in proxies]),
            F.col(bin_col).cast("int") + 1,
        )
        routed = df.withColumn("_route", proxy.cast("int"))
    else:
        spark = df.sparkSession
        mapping = spark.createDataFrame(
            [(b, int(p)) for b, p in enumerate(proxies)],
            f"{bin_col} int, _route int",
        )
        routed = df.withColumn(bin_col, F.col(bin_col).cast("int")).join(
            F.broadcast(mapping), on=bin_col, how="left"
        )
    return routed.repartition(n, "_route").drop("_route")
