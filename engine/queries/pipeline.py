"""Training-data pipeline operators over documents/embeddings.

The operations a large-scale training-data pipeline needs on top of the
maintenance engine: deduplication (exact, MinHash-band, n-gram
Jaccard), similarity search (brute-force cosine top-k and an
LSH-bucketed scale path), text analysis (language-ID heuristic, quality
scoring, token counting, fingerprinting), and fixed-size chunking (the
reference's C1 chunker, /root/reference/src/indexer/chunker.rs:56-95).

Cross-engine determinism notes:
- hash-based ops use md5/sha256 (identical in Spark and DuckDB) — never
  engine-native hash()/xxhash64 which differ across engines.
- float outputs are rounded; ranked outputs carry deterministic
  tie-breaks on key columns.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .catalog import q, t, t_wide  # t_wide: shared spread-narrow-scan helper

# =========================================================================
# Chunking (SURVEY §2.3 — C1 fixed-size groups, 1-based offsets)
# =========================================================================

CHUNK = 50


@q(
    "chunk_fixed_size",
    f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    )
    SELECT doc_id, CAST(floor((pos - 1) / {CHUNK}) AS BIGINT) AS chunk_id,
           CAST(min(pos) AS BIGINT) AS start_pos, CAST(max(pos) AS BIGINT) AS end_pos,
           count(*) AS n_words
    FROM words GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id
    """,
)
def chunk_fixed_size(spark, sf_dir):
    """C1: split into ceil(n/50) groups of 50 units, 1-based positions —
    pure SQL posexplode/groupBy, no UDF.  Plain scan deliberately: the
    posexplode feeds a partial aggregate (shuffle-bound, cheap per
    row), and an interleaved A/B at sf1 measured the narrow scan
    faster than the t_wide spread (0.74 s vs 0.89 s)."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).withColumn("pos", F.col("pos0") + 1)
    return (
        words.groupBy(
            "doc_id", F.floor((F.col("pos") - 1) / CHUNK).alias("chunk_id")
        )
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            F.max("pos").cast("long").alias("end_pos"),
            F.count("*").alias("n_words"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@q(
    "chunk_reassembly_invariant",
    """
    SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id
    """,
)
def chunk_reassembly_invariant(spark, sf_dir):
    """Chunk then reassemble == original (the chunker's round-trip
    invariant; C1 concatenation property)."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    )
    chunks = (
        words.groupBy("doc_id", F.floor(F.col("pos0") / CHUNK).alias("chunk_id"))
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("pos0", "word"))).word, " ").alias("chunk"))
    )
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))).chunk, " "
            ).alias("text")
        )
    )
    return rebuilt.select("doc_id", F.sha2("text", 256).alias("sha")).orderBy("doc_id")


# =========================================================================
# Deduplication
# =========================================================================


@q(
    "dedup_exact",
    """
    SELECT count(*) AS n_rows, count(DISTINCT md5(text)) AS n_unique,
           count(*) - count(DISTINCT md5(text)) AS n_dups
    FROM documents
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content digest (the reference's
    SHA-256 identity, applied corpus-wide).  At scale this is one
    partial+final hash aggregate — no shuffle of content, only digests."""
    d = t(spark, sf_dir, "documents").select(F.md5("text").alias("h"))
    return d.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("h").alias("n_unique"),
        (F.count("*") - F.countDistinct("h")).alias("n_dups"),
    )


@q(
    "dedup_exact_keep_first",
    """
    WITH ranked AS (
      SELECT doc_id, md5(text) AS h,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents)
    SELECT doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
)
def dedup_exact_keep_first(spark, sf_dir):
    d = t(spark, sf_dir, "documents").withColumn("h", F.md5("text"))
    w = W.partitionBy("h").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
        .orderBy("doc_id")
    )


# Signature construction + universal-hash mix constants live in
# engine.dedup (shared with the job-facing minhash_near_dups operator);
# the oracle f-strings below embed the identical numbers.
from engine.dedup import (  # noqa: E402
    MIX_A,
    MIX_B,
    MIX_P,
    N_MINHASH_BANDS,
    minhash_signatures,
)


@q(
    "dedup_minhash_bands",
    f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ), shingles AS (
      SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS shingle
      FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                   JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ), hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT)
               % {MIX_P} AS hm
      FROM shingles
    ), bands AS (
      SELECT doc_id, band,
             min((hm * CASE band {' '.join(f'WHEN {b} THEN {MIX_A[b]}' for b in range(N_MINHASH_BANDS))} END
                  + CASE band {' '.join(f'WHEN {b} THEN {MIX_B[b]}' for b in range(N_MINHASH_BANDS))} END)
                 % {MIX_P}) AS sig
      FROM hashed, (SELECT unnest(range({N_MINHASH_BANDS})) AS band)
      GROUP BY doc_id, band
    )
    SELECT band, sig, count(DISTINCT doc_id) AS bucket_size
    FROM bands GROUP BY band, sig HAVING count(DISTINCT doc_id) > 1
    ORDER BY band, sig
    """,
)
def dedup_minhash_bands(spark, sf_dir):
    """MinHash+LSH near-dup: 3-word shingles -> per-band min-hash
    signature -> band buckets with >1 doc are near-dup candidates.
    Shingle -> minhash -> band -> bucket-join, entirely in built-in
    functions.

    The per-band min-hashes are N_MINHASH_BANDS *projected aggregate
    columns* over the shingle relation — one groupBy(doc_id) computing
    all band minima at once.  Round 1 crossJoined the shingle relation
    with an 8-row band table, multiplying the (largest) intermediate 8x
    before hashing; round 5 (VERDICT r4 Wrong #5) removed the 8
    md5-per-shingle: each shingle is hashed ONCE (md5, engine-portable)
    into a 31-bit base value and the 8 band functions are affine
    universal-hash mixes (hm*a+b mod 2^31-1) — integer codegen, ~1/8
    the hash cost, identical minhash semantics (any universal family
    works; the mix constants are embedded in both engines' plans).
    Signature construction is shared with the job-facing pair operator
    (engine.dedup.minhash_signatures)."""
    d = t_wide(spark, sf_dir, "documents")
    bands = minhash_signatures(d, "doc_id", "text").select(
        "doc_id", F.posexplode("fp").alias("band", "sig")
    )
    return (
        bands.groupBy("band", "sig")
        # count(*) == count(DISTINCT doc_id) here BY CONSTRUCTION: bands
        # has exactly one row per (doc_id, band) (the wide-agg explode),
        # so doc_ids within a (band, sig) group are already distinct —
        # skips the two-phase distinct-aggregate expand (oracle keeps
        # COUNT(DISTINCT) as the independent formulation)
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > 1)
        .orderBy("band", "sig")
    )


def _minhash_bands_cte(src: str) -> str:
    """DuckDB CTE chain ``words -> shingles -> hashed -> bands`` over
    source relation ``src`` (must expose doc_id, text): per-document
    per-band minhash signature components.  Single-sourced so the mix
    constants and shingle construction are embedded identically in
    every oracle that needs signatures."""
    band_a = " ".join(
        f"WHEN {b} THEN {MIX_A[b]}" for b in range(N_MINHASH_BANDS)
    )
    band_b = " ".join(
        f"WHEN {b} THEN {MIX_B[b]}" for b in range(N_MINHASH_BANDS)
    )
    return f"""words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM {src}
    ), shingles AS (
      SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS shingle
      FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                   JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ), hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT)
               % {MIX_P} AS hm
      FROM shingles
    ), bands AS (
      SELECT doc_id, band,
             min((hm * CASE band {band_a} END
                  + CASE band {band_b} END)
                 % {MIX_P}) AS sig
      FROM hashed, (SELECT unnest(range({N_MINHASH_BANDS})) AS band)
      GROUP BY doc_id, band
    )"""


def _minhash_pairs_cte(src: str) -> str:
    """``_minhash_bands_cte`` + ``prs``: near-dup pairs whose minhash
    signatures agree on >= 4 of 8 components (the est-Jaccard >= 0.5
    shortlist).  Shared by the three oracles that need the pair
    relation."""
    return f"""{_minhash_bands_cte(src)}, prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS matches
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 4
    )"""


@q(
    "dedup_minhash_pairs",
    f"""
    WITH {_minhash_pairs_cte('documents')}
    SELECT doc_a, doc_b, round(matches / 8.0, 6) AS est_jaccard
    FROM prs ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_pairs(spark, sf_dir):
    """The job-facing MinHash composition (engine.dedup.minhash_near_dups,
    the engine of ``engine/jobs/dedup_sweep.py --method minhash``):
    same signature construction as dedup_minhash_bands, but emitting
    near-dup PAIRS with the map-side matching-component Jaccard
    estimate (>= 0.5 here = >= 4 of 8 signature components equal).

    Scale shape: candidate pairs come from chunked_pair_candidates
    (degenerate buckets split into capped chunks, triangle equi-join —
    no single task sees a whole bucket), and the estimate filter runs
    BEFORE the cross-band distinct so only survivors shuffle.  The
    oracle counts matching bands per pair directly — an independent
    formulation of the same estimator."""
    from engine.dedup import minhash_near_dups

    d = t_wide(spark, sf_dir, "documents")
    # no persist before the sort: the operator's cross-band distinct is
    # a shuffle boundary the range sampler reuses (r6 measured a
    # persist here as pure overhead at sf0.1)
    return (
        minhash_near_dups(d, "doc_id", "text", threshold=0.5)
        .select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@q(
    "dedup_connected_components",
    f"""
    WITH RECURSIVE {_minhash_pairs_cte('documents')}, edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION ALL
      SELECT doc_b, doc_a FROM prs
    ), reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS doc_id, min(r) AS component FROM reach
    GROUP BY id ORDER BY doc_id
    """,
)
def dedup_connected_components(spark, sf_dir):
    """Connected components over the minhash near-dup graph — the EXACT
    dedup-group semantics (a chain a~b~c is ONE group even when a!~c)
    that the sweep job's greedy drop policy approximates.

    Spark side: engine.dedup.connected_components — iterative min-label
    propagation, one distributed join + min-aggregate per round, only a
    scalar changed-count crossing the driver; converges in diameter
    rounds (2-4 on near-dup graphs; the oracle's recursive CTE computes
    full reachability, feasible only at oracle scale).  Exercised at
    sf0.01 by a 3-node CHAIN component (transitive closure observable:
    its endpoints never share a band)."""
    from engine.dedup import connected_components, minhash_near_dups

    d = t_wide(spark, sf_dir, "documents")
    pairs = minhash_near_dups(d, "doc_id", "text", threshold=0.5)
    return (
        # pairs_unique: minhash_near_dups emits each pair exactly once
        # (first-band emission), so the edge symmetrize skips its
        # distinct
        connected_components(pairs, pairs_unique=True)
        .select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))
        .orderBy("doc_id")
    )


@q(
    "dedup_minhash_incremental",
    f"""
    WITH {_minhash_bands_cte('documents')}, prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS matches
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      GROUP BY 1, 2 HAVING count(*) >= 4
    )
    SELECT doc_a, doc_b, round(matches / 8.0, 6) AS est_jaccard
    FROM prs ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_incremental(spark, sf_dir):
    """The INCREMENTAL near-dup sweep (engine.dedup.
    minhash_near_dups_against, the engine of ``dedup_sweep --against``):
    even doc_ids play the persisted signature INDEX (only their
    ``minhash_signatures`` output participates — at 100 TB the corpus
    text is shingled once and never re-read), odd doc_ids play the new
    batch; emit every (index, batch) pair whose signatures agree on
    >= 4 of 8 components.

    Scale shape: one equi-join on short (band, sig) keys between the
    index's exploded signature rows and the batch's — a plain join AQE
    can skew-split, with the Jaccard estimate computed map-side from
    the signature arrays carried through the join; only pairs clearing
    the threshold reach the cross-band distinct.  The oracle recomputes
    both sides' signatures from text and counts matching bands per
    cross-parity pair — an independent formulation."""
    from engine.dedup import minhash_near_dups_against, minhash_signatures

    d = t_wide(spark, sf_dir, "documents")
    index_sigs = minhash_signatures(
        d.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    )
    batch = d.filter(F.col("doc_id") % 2 == 1)
    return (
        minhash_near_dups_against(index_sigs, batch, "doc_id", "text",
                                  threshold=0.5)
        .select("doc_a", "doc_b",
                F.round("est_jaccard", 6).alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@q(
    "dedup_ngram_jaccard",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE doc_id < 40
    ), sets AS (SELECT DISTINCT doc_id, word FROM words),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sets a JOIN sets b ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), sizes AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id)
    SELECT p.doc_a, p.doc_b,
           round(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 6) AS jaccard
    FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id
                 JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Unigram-set Jaccard similarity >= 0.5 over a bounded doc subset
    (pairwise compare is quadratic — at scale the MinHash bands above
    shortlist candidate pairs first; this computes exact Jaccard)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sets = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("word")
    )
    a = sets.alias("a")
    b = sets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("sz"))
    jac = F.col("inter").cast("double") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("inter")
    )
    return (
        pairs.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


N_SIMHASH_BITS = 60  # 15 hex chars of md5: fits signed 64-bit in BOTH engines
N_SIMHASH_BANDS = 4  # pigeonhole: any pair with hamming <= 3 shares a band
SIMHASH_BAND_BITS = N_SIMHASH_BITS // N_SIMHASH_BANDS


@q(
    "dedup_simhash",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
    ), bits AS (
      SELECT doc_id, i,
             CASE WHEN sum((((hv >> i) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END AS bit
      FROM h CROSS JOIN (SELECT unnest(range({N_SIMHASH_BITS})) AS i) r
      GROUP BY doc_id, i
    ), fp AS (
      SELECT doc_id, CAST(sum(CAST(bit AS BIGINT) << i) AS BIGINT) AS fp
      FROM bits GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, b, (fp >> (b * {SIMHASH_BAND_BITS})) & {(1 << SIMHASH_BAND_BITS) - 1} AS bv
      FROM fp CROSS JOIN (SELECT unnest(range({N_SIMHASH_BANDS})) AS b) rb
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
    )
    SELECT c.doc_a, c.doc_b, CAST(bit_count(xor(fa.fp, fb.fp)) AS BIGINT) AS hamming
    FROM cand c JOIN fp fa ON c.doc_a = fa.doc_id JOIN fp fb ON c.doc_b = fb.doc_id
    WHERE bit_count(xor(fa.fp, fb.fp)) <= {N_SIMHASH_BANDS - 1}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup as a full SQL-expressible pipeline: 60-bit
    fingerprint (sign of per-bit vote sums over md5-hashed distinct
    tokens) -> 4-band LSH bucketing -> hamming<=3 verify on candidates.
    Pigeonhole makes the banded candidate set COMPLETE for hamming<=3
    (4 bands, <=3 differing bits => some band identical), so the output
    equals the exact all-pairs answer while the plan only joins on band
    buckets — the shape that survives 100 TB (band value is the shuffle
    key; no all-pairs compare).

    Plan notes: the per-bit vote sums are {N_SIMHASH_BITS} PROJECTED
    AGGREGATE columns in ONE groupBy(doc_id) over the token relation
    (the minhash-bands trick) — no 60x row multiplication; the
    fingerprint folds the 60 sums in a single projection.
    engine/dedup.py:28-131 is the vectorized Arrow variant of the same
    operator (pd.util.hash_array + np.add.reduceat) used by the
    maintenance engine; this query is the engine-portable oracle twin
    (md5 hashes identically in Spark and DuckDB).
    Ref parity: near-dup detection over document content mirrors the
    reference's dedup tests (/root/reference/tests/incremental_index
    dedup suite)."""
    d = t_wide(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    h = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("hv"),
    )
    # one groupBy(doc_id): 60 vote-sum aggregate columns, then fold to fp
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("hv"), i).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s_{i}")
            for i in range(N_SIMHASH_BITS)
        ]
    )
    fp_col = None
    for i in range(N_SIMHASH_BITS):
        bit = F.when(F.col(f"s_{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        fp_col = term if fp_col is None else fp_col + term
    fp = votes.select("doc_id", fp_col.alias("fp"))
    # Candidate machinery = engine.dedup.hamming_pairs_from_fps
    # (shared with the simhash_near_dups job operator): degenerate band
    # buckets are chunk-bounded through the triangle join (r4 VERDICT
    # Wrong #3) and the Hamming verify runs map-side so the
    # over-generated candidate relation never shuffles.  Round 6 shape:
    # collapse_fps=True + first-band exactly-once emission — all pair
    # work runs over DISTINCT fingerprints (sf1: 32,645 fps vs 50,000
    # docs -> 29M raw bucket pairs instead of 294M; 223k verified fp
    # pairs) and the final 27.4M doc pairs stream out of two
    # output-bounded expansion joins with NO cross-band distinct
    # (bench_extra.py simhash_ab: 21.1 s -> 2.7 s noop at sf1, 0.59 ->
    # 0.46 s at sf0.1, identical pair-set checksums at both scales).
    # tests/test_dedup.py pins the exact pair set and the bound.
    from engine.dedup import hamming_pairs_from_fps

    cand = hamming_pairs_from_fps(
        fp, N_SIMHASH_BANDS, SIMHASH_BAND_BITS, N_SIMHASH_BANDS - 1, cap=256,
        collapse_fps=True,
    )
    # No persist/exchange inserted before the global sort: the range
    # sampler does re-run the expansion joins, but they are broadcast
    # joins over the (persisted) docs relation and recomputing them
    # measured cheaper than materializing a 27.4M-row cache (r6 A/B at
    # sf1: none 112.4 s, persist 115.8 s, repartition 149.8 s; parity
    # at sf0.1).
    return cand.select("doc_a", "doc_b", "hamming").orderBy("doc_a", "doc_b")


COSINE_NEARDUP_THRESHOLD = 0.42


@q(
    "dedup_embedding_cosine",
    f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 600 AND b.vec_id < 600
    )
    SELECT id_a, id_b, round(cos, 4) AS cos
    FROM pairs WHERE cos >= {COSINE_NEARDUP_THRESHOLD} ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs: exact pairwise cosine inside the
    bounded block, computed as ONE numpy ``V @ V.T`` per bucket via
    ``engine.dedup.cosine_pairs_within_buckets`` (round 3 paid 31 s at
    sf0.1 — 35% of the whole bench — evaluating an interpreted
    zip_with/aggregate HOF per pair; the BLAS kernel is <1 s).  The
    threshold is calibrated to this synthetic corpus (near-orthogonal
    random unit vectors, max pairwise cos 0.513; nearest pair sits
    0.0017 from the cut, far beyond float-associativity jitter) — real
    near-dup sweeps use ~0.95 on model embeddings; the operator is
    threshold-agnostic.  This is the bounded exact-verify primitive
    (vec_id < 600 block — covers every row at the driver's sf0.01,
    bounds the quadratic at larger sf); at 100 TB the buckets come from
    the sign-LSH tables and the SAME kernel runs per bucket — that
    composition is now a real operator,
    ``engine.dedup.cosine_near_dup_lsh`` (recall measured in
    BENCH/ANN_RECALL.json), not just this docstring."""
    from engine.dedup import cosine_pairs_within_buckets

    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 600)
        .withColumn("bucket", F.lit(0))
    )
    return (
        cosine_pairs_within_buckets(
            e, "bucket", "vec_id", "embedding", COSINE_NEARDUP_THRESHOLD
        )
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cos"))
        .orderBy("id_a", "id_b")
    )


@q(
    "dedup_cosine_lsh",
    f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos, 4) AS cos
    FROM pairs WHERE cos >= {COSINE_NEARDUP_THRESHOLD} ORDER BY id_a, id_b
    """,
)
def dedup_cosine_lsh(spark, sf_dir):
    """Composed bucket-candidates -> exact-verify near-dup over the FULL
    embeddings table (round 3's VERDICT: the composition existed only in
    a docstring).  ``engine.dedup.cosine_near_dup_lsh``: 32 independent
    4-plane sign-LSH bucketings computed in ONE Arrow matmul ->
    posexplode to (table, bucket) shuffle keys -> distinct candidate
    pairs -> exact cosine re-verified per candidate (einsum batch).

    The oracle is the exact all-pairs answer: precision is exact by
    construction (every emitted pair is re-verified against the
    threshold), and the banding parameters are sized so measured recall
    is 1.0 on these corpora (16 tables missed 13/441 true pairs at
    sf0.1; 32 tables missed 0 at sf0.001/0.01/0.1 — the driver compare
    at sf0.01 would catch any regression).  On real 100 TB corpora the
    OR-of-bands recall<1 tradeoff is tuned per threshold and measured —
    BENCH/ANN_RECALL.json carries the recall-vs-tables curve; the plan
    never compares all pairs (candidate generation shuffles only on
    (table, bucket) short keys; verify touches candidate rows only)."""
    from engine.dedup import cosine_near_dup_lsh

    e = t(spark, sf_dir, "embeddings")
    return (
        cosine_near_dup_lsh(
            e, "vec_id", "embedding", COSINE_NEARDUP_THRESHOLD,
            n_tables=32, n_planes=4, dim=64,
        )
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cos"))
        .orderBy("id_a", "id_b")
    )


@q(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(substr(text, 1, 64)) AS head_print,
           md5(substr(reverse(text), 1, 64)) AS tail_print,
           length(text) AS n
    FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.substring("text", 1, 64)).alias("head_print"),
        F.md5(F.substring(F.reverse(F.col("text")), 1, 64)).alias("tail_print"),
        F.length("text").alias("n"),
    ).orderBy("doc_id")


# =========================================================================
# Similarity search over embeddings
# =========================================================================


@q(
    "cosine_topk",
    """
    WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id,
             list_sum(list_transform(list_zip(embedding, (SELECT qe FROM qv)),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform((SELECT qe FROM qv),
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_raw
      FROM embeddings WHERE vec_id != 0
    )
    SELECT vec_id, round(cos_raw, 4) AS cos FROM scored
    ORDER BY cos_raw DESC, vec_id LIMIT 10
    """,
)
def cosine_topk(spark, sf_dir):
    """T1/F15: brute-force exact cosine top-k, computed JVM-side with
    zip_with/aggregate on the array column — no Python in the hot path.
    (The reference uses approximate HNSW at ~95% recall; exact top-k is
    a correctness superset.)"""
    e = t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    # the scoring leg evaluates a 64-element HOF dot per row — spread
    # the single-file scan; the 1-row query-vector leg stays plain
    ew = t_wide(spark, sf_dir, "embeddings")
    j = ew.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qv))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    norm = lambda a: F.sqrt(dot(a, a))
    cos = dot(F.col("embedding"), F.col("qe")) / (
        norm(F.col("embedding")) * norm(F.col("qe"))
    )
    return (
        j.withColumn("cos_raw", cos)
        .orderBy(F.desc("cos_raw"), "vec_id")
        .limit(10)
        .select("vec_id", F.round("cos_raw", 4).alias("cos"))
    )


@q(
    "ann_ivf_topk",
    """
    WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id,
             list_sum(list_transform(list_zip(embedding, (SELECT qe FROM qv)),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform((SELECT qe FROM qv),
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_raw
      FROM embeddings WHERE vec_id != 0
    )
    SELECT vec_id, round(cos_raw, 4) AS cos FROM scored
    ORDER BY cos_raw DESC, vec_id LIMIT 10
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """T1 scale path, driver-verified: the FULL IVF-Flat pipeline —
    bounded-sample k-means training, per-row cell assignment (one BLAS
    matmul per Arrow batch), probe-cell pruning, exact cosine verify on
    survivors (engine.embedding.ann_topk_ivf) — run at nprobe = n_cells.

    Probing every cell makes IVF EXACT (the probe filter passes all
    rows), so the brute-force top-k SQL is a true oracle and the result
    is independent of centroid initialization — this driver row checks
    the plumbing (training collect bounds, assignment UDF, probe
    selection, verify arithmetic) with a hash-exact guarantee.  The
    approximate regimes (nprobe < n_cells) trade recall for pruned
    scans; their recall@10 curves are measured in BENCH/ANN_RECALL.json
    (clustered fixture: 1.00 at nprobe>=1; i.i.d. worst case 0.58 at
    nprobe=4).  At 100 TB ``ivf_cell`` is the partition key, so a probe
    prunes to nprobe cells' files instead of scanning every vector.

    Ref parity: the reference's vector search is approximate HNSW at
    ~95% recall (README.md:666-668); IVF-Flat is the same
    shortlist->exact-verify contract re-expressed as DataFrame ops."""
    from engine.embedding import ann_topk_ivf

    e = t(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return (
        ann_topk_ivf(
            e.filter(F.col("vec_id") != 0), qvec, k=10, id_col="vec_id",
            n_cells=16, nprobe=16,
        )
        .select("vec_id", F.round("cos", 4).alias("cos"))
    )


@q(
    "knn_by_label",
    """
    WITH pairs AS (
      SELECT a.label AS la, b.label AS lb,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 60 AND b.vec_id < 60
    )
    SELECT la, lb, round(avg(cos), 4) AS avg_cos, count(*) AS n
    FROM pairs GROUP BY la, lb ORDER BY la, lb
    """,
)
def knn_by_label(spark, sf_dir):
    """Pairwise label-block similarity matrix over a bounded subset —
    the all-pairs building block of embedding-cosine near-dup."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.sqrt(dot(F.col("a.embedding"), F.col("a.embedding")))
        * F.sqrt(dot(F.col("b.embedding"), F.col("b.embedding")))
    )
    return (
        pairs.select(
            F.col("a.label").alias("la"), F.col("b.label").alias("lb"), cos.alias("cos")
        )
        .groupBy("la", "lb")
        .agg(F.round(F.avg("cos"), 4).alias("avg_cos"), F.count("*").alias("n"))
        .orderBy("la", "lb")
    )


# =========================================================================
# Text analysis
# =========================================================================


@q(
    "token_count",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z_][a-zA-Z0-9_]*')) AS ident_tokens
    FROM documents ORDER BY doc_id
    """,
)
def token_count(spark, sf_dir):
    """F10 identifier tokenizer + whitespace token count."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-zA-Z_][a-zA-Z0-9_]*"), F.lit(0))
        ).alias("ident_tokens"),
    ).orderBy("doc_id")


@q(
    "quality_score",
    """
    SELECT doc_id,
           round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text), 4) AS punct_ratio,
           round(CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|is|in)\\b')) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS len_ok
    FROM documents ORDER BY doc_id
    """,
)
def quality_score(spark, sf_dir):
    """Quality scoring: punctuation ratio, stopword ratio, length gate.

    punct_ratio counts removed characters with ``translate`` (a plain
    char-table lookup) instead of ``regexp_replace`` over the same
    63-char class — byte-identical result, no regex engine in the inner
    loop; the oracle keeps the regex formulation as the independent
    cross-check."""
    d = t_wide(spark, sf_dir, "documents")
    punct = F.length(
        F.translate(
            "text",
            "abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ",
            "",
        )
    ).cast("double") / F.length("text")
    stop = F.size(
        F.regexp_extract_all("text", F.lit(r"\b(the|a|of|and|is|in)\b"), F.lit(0))
    ).cast("double") / F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        F.round(punct, 4).alias("punct_ratio"),
        F.round(stop, 4).alias("stopword_ratio"),
        F.when(F.length("text").between(100, 2000), 1).otherwise(0).alias("len_ok"),
    ).orderBy("doc_id")


@q(
    "lang_id_heuristic",
    """
    SELECT doc_id,
           CASE WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of)\\b')) >= 1
                THEN 'en' ELSE 'other' END AS lang_guess,
           lang AS lang_label
    FROM documents ORDER BY doc_id
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """Language-ID n-gram heuristic (stopword evidence -> 'en')."""
    d = t(spark, sf_dir, "documents")
    guess = F.when(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\b(the|and|of)\b"), F.lit(0))
        )
        >= 1,
        "en",
    ).otherwise("other")
    return d.select(
        "doc_id", guess.alias("lang_guess"), F.col("lang").alias("lang_label")
    ).orderBy("doc_id")


def _training_funnel_sql() -> str:
    """Oracle for the composed prep pipeline (engine.prep): cumulative
    gate flags, sha-window keep-first, the shared minhash pair CTE over
    the exact survivors, greedy drop, one funnel aggregate."""
    from engine.prep import LANG_STOPWORDS, MAX_LEN, MAX_PUNCT, MIN_LEN

    # DuckDB string literals are not C-escaped: embed the \b pattern
    # verbatim (matching the lang_id_heuristic oracle).
    stops = LANG_STOPWORDS
    return f"""
    WITH gates AS (
      SELECT doc_id, text,
             (length(text) BETWEEN {MIN_LEN} AND {MAX_LEN}) AS f_len,
             ((length(text) BETWEEN {MIN_LEN} AND {MAX_LEN}) AND
              len(regexp_extract_all(lower(text), '{stops}')) >= 1) AS f_lang
      FROM documents
    ), quality AS (
      SELECT *, f_lang AND
             (CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
              / length(text) <= {MAX_PUNCT}) AS f_q,
             sha256(text) AS sha
      FROM gates
    ), ek AS (
      SELECT *, f_q AND doc_id = min(CASE WHEN f_q THEN doc_id END)
                          OVER (PARTITION BY sha) AS f_exact
      FROM quality
    ), surv AS (
      SELECT doc_id, text FROM ek WHERE f_exact
    ), {_minhash_pairs_cte('surv')}, fin AS (
      SELECT ek.*,
             f_exact AND doc_id NOT IN (SELECT DISTINCT doc_b FROM prs)
               AS f_near
      FROM ek
    )
    SELECT 'ingested' AS stage, CAST(count(*) AS BIGINT) AS n FROM fin
    UNION ALL SELECT 'len_ok',
      CAST(sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS BIGINT) FROM fin
    UNION ALL SELECT 'lang_ok',
      CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) FROM fin
    UNION ALL SELECT 'quality_ok',
      CAST(sum(CASE WHEN f_q THEN 1 ELSE 0 END) AS BIGINT) FROM fin
    UNION ALL SELECT 'exact_deduped',
      CAST(sum(CASE WHEN f_exact THEN 1 ELSE 0 END) AS BIGINT) FROM fin
    UNION ALL SELECT 'near_deduped',
      CAST(sum(CASE WHEN f_near THEN 1 ELSE 0 END) AS BIGINT) FROM fin
    ORDER BY stage
    """


@q("training_funnel", _training_funnel_sql())
def training_funnel(spark, sf_dir):
    """The composed training-corpus prep pipeline (engine.prep.
    prepare_training_corpus, the engine of engine/jobs/prepare_corpus.py):
    length gate -> language-ID -> punctuation-quality gate -> exact
    dedup keep-first (one window over the content sha) -> MinHash
    near-dup sweep (greedy drop) — reported as the cumulative survivor
    funnel, computed with ONE aggregate over a flag frame rather than a
    count job per stage.

    This is the end-to-end composition check: every stage reuses an
    individually-verified operator (quality_score / lang_id_heuristic
    formulas, sha256_content digest, dedup_minhash_pairs machinery) and
    the oracle recomputes the whole funnel independently, so a
    composition bug (wrong gate order, dedup seeing pre-filter rows,
    drop set joined on the wrong side) breaks the hash match even when
    each piece is green in isolation."""
    from engine.prep import prepare_training_corpus

    d = t_wide(spark, sf_dir, "documents").select("doc_id", "text")
    _, funnel = prepare_training_corpus(d)
    return funnel.orderBy("stage")


# =========================================================================
# TPC-H-style analytics (scan/agg/join plans at benchmark scale)
# =========================================================================


@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide scan + partial/final hash aggregate."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY revenue DESC, nation
    """,
)
def revenue_by_nation(spark, sf_dir):
    """Multi-join star query: fact-fact sort-merge + broadcast dims."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@q(
    "window_running_total",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
    FROM events WHERE user_id < 10 ORDER BY user_id, rn
    """,
)
def window_running_total(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            F.row_number().over(w).cast("long").alias("rn"),
            F.round(
                F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
            ).alias("running"),
        )
        .orderBy("user_id", "rn")
    )
