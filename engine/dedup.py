"""SimHash near-duplicate detection (the engine-side dedup family).

Complements the SQL-expressible dedup operators in
``engine.queries.pipeline`` (exact hash, MinHash-LSH bands, n-gram
Jaccard) with SimHash: a 64-bit locality-sensitive fingerprint — the
bitwise majority vote of per-token hash vectors — where near-duplicate
texts land within a small Hamming distance.

Scale path: fingerprints are computed in ONE vectorized Arrow UDF pass
(numpy bit ops, no Python loop per token-pair); candidate pairs come
from banding the 64-bit space into ``n_bands`` chunks and equi-joining
on (band, chunk) — a shuffle on short ints, never on content.  Exact
Hamming distance is then verified only within buckets (JVM-side
bit_count on xor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BITS = 64


def _token_hash64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes (md5-derived — engine-portable, no PYTHONHASHSEED)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = np.frombuffer(
            hashlib.md5(t.encode("utf-8", "ignore")).digest()[:8], dtype=np.uint64
        )[0]
    return out


def simhash_batch(texts: pd.Series) -> pd.Series:
    """Vectorized SimHash of a text batch."""
    sigs = np.zeros(len(texts), dtype=np.int64)
    bit_idx = np.arange(BITS, dtype=np.uint64)
    for i, txt in enumerate(texts):
        tokens = (txt or "").split()
        if not tokens:
            continue
        h = _token_hash64(tokens)  # (n_tokens,)
        # bit matrix (n_tokens, 64) of +-1 votes, summed per bit
        bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(tokens)
        sig = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        sigs[i] = sig.astype(np.int64)
    return pd.Series(sigs)


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return simhash_batch(texts)


def with_simhash(df: DataFrame, text_col: str = "content") -> DataFrame:
    return df.withColumn("simhash", simhash_udf(F.col(text_col)))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str = "content",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Candidate pairs within ``max_hamming`` bits.

    Pigeonhole: two signatures within k bits agree exactly on >= 1 of
    k+1 bands — so banding with ``n_bands = max_hamming + 1`` finds ALL
    such pairs while joining only on short band keys.
    """
    n_bands = max(n_bands, max_hamming + 1)
    width = BITS // n_bands
    sigs = with_simhash(df.select(id_col, text_col), text_col).select(
        F.col(id_col).alias("id"), "simhash"
    )
    bands = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.orderBy("id_a", "id_b")
