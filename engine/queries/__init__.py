from . import extended, pipeline, search  # noqa: F401  (register query batches)
from .catalog import ORACLES as _ORACLES
from .catalog import QUERIES as _QUERIES

# The driver verifies only the FIRST 50 registered queries per round
# (confirmed across r1-r3).  Rotation policy, amended per r4 VERDICT
# task 1a: rank (a) queries whose IMPLEMENTATION CHANGED this round —
# the correctness signal must track changed code, r4's rotation
# verified exactly the code that didn't change — then (b) queries new
# this round, then (c) the queries DISPLACED last round, so every query
# still re-earns a green row within two rounds.
# Round-5 front:
#   changed r5: hash_cache_digest (commutative rewrite), dedup_simhash
#     (chunked triangle candidates), dedup_minhash_bands (single-hash
#     mixes), dedup_cosine_lsh (tracked persists);
#   changed r4 but displaced from the r4 window: dedup_embedding_cosine;
#   new r5: filter_gitignore, dedup_minhash_pairs (the job-facing
#     minhash composition behind jobs/dedup_sweep.py),
#     dedup_minhash_incremental (batch-vs-signature-index sweep,
#     dedup_sweep --against),
#     dedup_connected_components (exact dedup-group labeling),
#     ann_ivf_topk (full IVF pipeline at nprobe=n_cells => exact, so
#     the brute-force SQL is a true oracle), training_funnel (the
#     composed prep pipeline behind jobs/prepare_corpus.py);
#   then the rest of the r4-displaced set (green in r3, absent from r4).
_FRONT = [
    "hash_cache_digest",
    "dedup_simhash",
    "dedup_minhash_bands",
    "dedup_cosine_lsh",
    "dedup_embedding_cosine",
    "filter_gitignore",
    "dedup_minhash_pairs",
    "dedup_minhash_incremental",
    "dedup_connected_components",
    "ann_ivf_topk",
    "training_funnel",
    "bm25_topk",
    "filter_glob_v2",
    "lang_detect_full",
    "pricing_summary",
    "ref_kind_full",
    "revenue_by_nation",
    "search_hybrid",
    "symbol_extraction",
    "visibility_classifier",
    "window_running_total",
    "windowed_rollup",
]


def _reorder(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT if k in d}
    return {**front, **{k: v for k, v in d.items() if k not in front}}


QUERIES = _reorder(_QUERIES)
ORACLES = _reorder(_ORACLES)
