"""ANN recall evidence -> BENCH/ANN_RECALL.json (round-4 VERDICT item:
"no recall@k evidence artifact yet").

Measures, at sf0.1 (2,000 x 64-dim vectors):

1. recall@10 of the two ANN scale paths vs exact brute force, averaged
   over ``N_QUERIES`` query vectors drawn from the corpus itself:
   - LSH sign-projection buckets with 1-bit probe expansion
     (``engine.embedding.ann_topk_lsh``)
   - IVF-Flat with nprobe in {1, 2, 4} (``engine.embedding.ann_topk_ivf``,
     centroids trained once and reused — the production shape)
2. the recall-vs-n_tables curve of the composed cosine near-dup
   operator (``engine.dedup.cosine_near_dup_lsh``) against the exact
   all-pairs answer at the dedup threshold — the curve that justifies
   the banding parameters ``dedup_cosine_lsh`` ships with (32 tables ->
   measured recall 1.0 on this corpus).

Ground truth is computed in numpy on the driver (2,000 vectors — the
truth computation is O(n^2) and exists only to grade the ANN paths;
the graded paths themselves run through the engine's Spark operators).

Usage: python BENCH/ann_recall.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from engine.dedup import cosine_near_dup_lsh  # noqa: E402
from engine.embedding import (  # noqa: E402
    ann_topk_ivf,
    ann_topk_lsh,
    train_ivf_centroids,
)
from engine.session import get_spark  # noqa: E402

N_QUERIES = 50
K = 10
DEDUP_THRESHOLD = 0.42


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ann-recall", master="local[8]",
                      shuffle_partitions=8)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.vstack([r["embedding"] for r in rows]).astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    n, dim = V.shape

    rng = np.random.default_rng(7)
    q_idx = rng.choice(n, size=min(N_QUERIES, n), replace=False)

    def truth_topk(i: int) -> set[int]:
        sims = Vn @ Vn[i]
        sims[i] = -np.inf  # exclude self, matching the eval below
        top = np.argsort(-sims, kind="stable")[:K]
        return {int(ids[t]) for t in top}

    centroids = train_ivf_centroids(e, n_cells=16, dim=dim)

    def eval_method(name, fn):
        hits, total = 0, 0
        for i in q_idx:
            want = truth_topk(int(i))
            got = {
                r["vec_id"]
                for r in fn(list(map(float, V[i])))
                .filter(f"vec_id != {int(ids[i])}")
                .limit(K)
                .collect()
            }
            hits += len(want & got)
            total += len(want)
        r = hits / total
        print(f"{name}: recall@{K} = {r:.3f}")
        return r

    results = {"sf_dir": sf_dir, "n_vectors": int(n), "dim": int(dim),
               "n_queries": int(len(q_idx)), "k": K, "recall_at_k": {}}
    # ANN paths ask for K+1 then drop self (truth excludes self).
    results["recall_at_k"]["lsh_8planes_probe1"] = eval_method(
        "lsh", lambda q: ann_topk_lsh(e, q, k=K + 1, id_col="vec_id",
                                      n_planes=8, probe_hamming=1, dim=dim))
    for nprobe in (1, 2, 4):
        results["recall_at_k"][f"ivf16_nprobe{nprobe}"] = eval_method(
            f"ivf nprobe={nprobe}",
            lambda q, p=nprobe: ann_topk_ivf(e, q, k=K + 1, id_col="vec_id",
                                             n_cells=16, nprobe=p,
                                             centroids=centroids))

    # --- near-dup recall-vs-tables curve ---------------------------------
    C = Vn @ Vn.T
    iu = np.triu_indices(n, k=1)
    keep = C[iu] >= DEDUP_THRESHOLD
    truth_pairs = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[iu[0][keep]], ids[iu[1][keep]])
    }
    curve = {}
    for n_tables in (4, 8, 16, 32):
        got = {
            (r["id_a"], r["id_b"])
            for r in cosine_near_dup_lsh(
                e, "vec_id", "embedding", DEDUP_THRESHOLD,
                n_tables=n_tables, n_planes=4, dim=dim).collect()
        }
        assert not (got - truth_pairs), "verify stage must be exact"
        rec = len(got & truth_pairs) / max(len(truth_pairs), 1)
        curve[str(n_tables)] = rec
        print(f"near-dup tables={n_tables}: recall = {rec:.4f} "
              f"({len(got)}/{len(truth_pairs)} pairs)")
    results["neardup_recall_vs_tables"] = curve
    results["neardup_threshold"] = DEDUP_THRESHOLD
    results["neardup_true_pairs"] = len(truth_pairs)

    out = os.path.join(REPO, "BENCH", "ANN_RECALL.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
