"""Embedding provider: the reference's one UDF extension point, as a
scalar iterator pandas UDF.

Mirrors EmbeddingProvider.embed_batch(Vec<String>) -> Vec<Vec<f32>>
(/root/reference/src/embedding/mod.rs:8-17): batch-oriented by design,
model loaded once per executor/worker (the iterator-of-series form
keeps state across Arrow batches), vectors L2-normalized like MiniLM
output (/root/reference/src/embedding/fastembed_manager.rs:66-97).

No model weights exist in this container, so the default provider is a
deterministic pseudo-embedder (feature-hashed n-grams -> fixed dim,
L2-normalized).  It is a real vectorized pipeline — only the math
inside the kernel changes when a real ONNX model plugs in.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DIM = 64


def pseudo_embed_batch(texts: "pd.Series", dim: int = DIM) -> np.ndarray:
    """Deterministic feature-hash embedding of a text batch (numpy)."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, txt in enumerate(texts):
        if not txt:
            continue
        data = txt.encode("utf-8", "ignore")
        # hash 4-byte windows into buckets with sign (feature hashing)
        arr = np.frombuffer(data, dtype=np.uint8)
        if len(arr) < 4:
            arr = np.pad(arr, (0, 4 - len(arr)))
        windows = (
            arr[:-3].astype(np.int64) * 131**3
            + arr[1:-2].astype(np.int64) * 131**2
            + arr[2:-1].astype(np.int64) * 131
            + arr[3:].astype(np.int64)
        )
        buckets = (windows % dim).astype(np.int64)
        signs = np.where((windows // dim) % 2 == 0, 1.0, -1.0).astype(np.float32)
        np.add.at(out[i], buckets, signs)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def make_embed_udf(dim: int = DIM):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # per-worker model init would go here (once, before the loop)
        for texts in batches:
            vecs = pseudo_embed_batch(texts, dim)
            yield pd.Series(list(vecs))

    return embed


def with_embeddings(df: DataFrame, text_col: str = "content", dim: int = DIM) -> DataFrame:
    """Append an L2-normalized embedding column (Arrow-batched)."""
    return df.withColumn("embedding", make_embed_udf(dim)(F.col(text_col)))


def cosine_col(a, b):
    """JVM-side cosine over two array<float> columns (no Python)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)


def ann_topk_bruteforce(
    embedded: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "path"
) -> DataFrame:
    """Exact top-k by cosine (the correctness baseline for T1)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embedded.withColumn("cos", cosine_col(F.col("embedding"), q))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def ann_topk_lsh(
    embedded: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "path",
    n_planes: int = 8,
    probe_hamming: int = 1,
    dim: int = DIM,
) -> DataFrame:
    """LSH-bucketed ANN (the scale path): sign-random-projection bucket
    per row, computed JVM-side; the query probes its own bucket plus all
    buckets within ``probe_hamming`` bit flips.  At 100 TB the bucket
    column is a partition/cluster key, so a probe prunes to a handful of
    files instead of scanning every vector."""
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)

    def bucket_expr(vec_col):
        bits = []
        for p in range(n_planes):
            dot = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(v)) for v in planes[p]]),
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    q = np.array(query_vec, dtype=np.float32)
    qbits = sum((1 << p) for p in range(n_planes) if float(planes[p] @ q) >= 0)
    probes = {qbits}
    if probe_hamming >= 1:
        for p in range(n_planes):
            probes.add(qbits ^ (1 << p))

    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embedded.withColumn("bucket", bucket_expr(F.col("embedding")))
        .filter(F.col("bucket").isin(list(probes)))
        .withColumn("cos", cosine_col(F.col("embedding"), qcol))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def train_ivf_centroids(
    embedded: DataFrame,
    n_cells: int = 16,
    dim: int = DIM,
    train_sample: int = 50_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids from a bounded sample.

    The sample collect is capped at ``train_sample`` rows (same bounded-
    driver-work pattern as cluster boundary sampling) — IVF training is
    always sample-based, even in FAISS.  Lloyd iterations run in numpy
    on an (n_sample, dim) matrix; empty cells are reseeded from the
    farthest points.  Returns L2-normalized centroids (n_cells, dim).
    """
    total = embedded.count()
    frac = min(1.0, train_sample / max(total, 1))
    sample = np.array(
        [
            r["embedding"]
            for r in embedded.select("embedding").sample(fraction=frac, seed=seed).collect()
        ],
        dtype=np.float32,
    )
    if len(sample) == 0:
        raise ValueError("no vectors to train on")
    n_cells = min(n_cells, len(sample))
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), n_cells, replace=False)].copy()
    for _ in range(iters):
        sims = sample @ cents.T  # cosine == dot for L2-normalized inputs
        assign = np.argmax(sims, axis=1)
        # worst-served points, ascending by best-centroid similarity:
        # each empty cell takes a DISTINCT reseed (argmin alone handed
        # every empty cell the SAME point -> duplicate centroids,
        # ADVICE r2)
        worst = iter(np.argsort(np.max(sims, axis=1)))
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:  # reseed empty cell from the next worst-served point
                cents[c] = sample[next(worst)]
        norms = np.linalg.norm(cents, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = cents / norms
    return cents


def assign_ivf_cells(embedded: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Append the IVF cell id: one vectorized pandas UDF doing a single
    (batch x dim) @ (dim x n_cells) BLAS call per Arrow batch.  At scale
    ``ivf_cell`` is the partition/cluster key, so a probe prunes to
    nprobe cells' files instead of scanning every vector."""
    cents = centroids.astype(np.float32)

    @F.pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype(np.int32))

    return embedded.withColumn("ivf_cell", cell(F.col("embedding")))


def ann_topk_ivf(
    embedded: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "path",
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN (the second scale path next to LSH): coarse-quantize rows
    into ``n_cells`` k-means cells, probe the ``nprobe`` cells nearest
    the query, exact cosine only on the survivors — the FAISS IVF-Flat
    recipe re-expressed as DataFrame ops.  Recall/latency is tuned by
    nprobe alone; the assignment UDF is one matmul per Arrow batch."""
    if centroids is None:
        centroids = train_ivf_centroids(embedded, n_cells=n_cells)
    q = np.asarray(query_vec, dtype=np.float32)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe_cells = [
        int(c) for c in np.argsort(-(centroids @ qn))[: min(nprobe, len(centroids))]
    ]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assign_ivf_cells(embedded, centroids)
        .filter(F.col("ivf_cell").isin(probe_cells))
        .withColumn("cos", cosine_col(F.col("embedding"), qcol))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )
