"""End-to-end training-corpus preparation: the composed pipeline a
100 TB pretraining sweep runs over a raw document corpus.

One operator chains the stages every large-scale data-prep recipe uses
(length gate -> language-ID -> punctuation-quality gate -> exact dedup
keep-first -> MinHash near-dup sweep) and reports the funnel — how many
documents survive each stage — WITHOUT per-stage count jobs:

- the three text gates are pure codegen projections (flag columns);
- exact dedup keep-first is ONE window over the content sha256 (shuffle
  key = sha, the same digest the maintenance path verifies);
- the near-dup stage reuses engine.dedup.minhash_near_dups on the exact
  survivors (chunk-bounded candidates, map-side Jaccard estimate) with
  either drop policy (greedy keep-smallest-id, or exact component
  semantics via connected_components);
- the funnel is ONE aggregate over the flag frame (six conditional
  sums), and the kept rows are a filter of the same persisted frame —
  the corpus is scanned once, not once per stage.

Cumulative-stage semantics: each gate sees the previous gate's
survivors, so the flags are ANDed prefixes (a doc failing the length
gate is not counted by the language stage even if its text is English),
and exact dedup picks each sha group's smallest id AMONG the quality
survivors — a duplicate pair where one copy failed quality does not
shadow the surviving copy.

Ref parity: the reference dedups at re-index time by content identity
(src/client/indexing/mod.rs incremental_index); the gates + near-dup
composition is the training-data-pipeline extension SURVEY.md §2 scopes
in.  Oracle: the `training_funnel` catalog query pins every stage count
against a DuckDB formulation built from the same formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import connected_components, minhash_near_dups, track_persist

# Gate defaults — shared with the training_funnel oracle f-string
# (engine.queries.pipeline) so both engines embed identical numbers.
MIN_LEN = 100
MAX_LEN = 2000
MAX_PUNCT = 0.30
NEARDUP_THRESHOLD = 0.5
LANG_STOPWORDS = r"\b(the|and|of)\b"  # lang_id_heuristic's evidence set

FUNNEL_STAGES = [
    "ingested",
    "len_ok",
    "lang_ok",
    "quality_ok",
    "exact_deduped",
    "near_deduped",
]


def prepare_training_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = MIN_LEN,
    max_len: int = MAX_LEN,
    max_punct: float = MAX_PUNCT,
    neardup_threshold: float = NEARDUP_THRESHOLD,
    drop_policy: str = "greedy",
) -> tuple[DataFrame, DataFrame]:
    """Run the full prep pipeline; returns ``(kept, funnel)``.

    ``kept``: the surviving rows, original columns — ready to re-ingest.
    ``funnel``: ``(stage: string, n: long)`` — cumulative survivor
    counts for the six stages in ``FUNNEL_STAGES`` order.

    Scale shape: three codegen gates, one window shuffle on the content
    sha, the bounded near-dup candidate machinery, one flag-frame
    aggregate.  Only pair survivors and the drop set cross extra
    stage boundaries; nothing collects to the driver.
    """
    tc = F.col(text_col)
    f_len = F.length(tc).between(min_len, max_len)
    f_lang = (
        F.size(
            F.regexp_extract_all(F.lower(tc), F.lit(LANG_STOPWORDS), F.lit(0))
        )
        >= 1
    )
    # punctuation count via translate (char-table lookup) — byte-
    # identical to regexp_replace over the same 63-char class, no regex
    # engine per row (the funnel oracle keeps the regex formulation)
    punct = (
        F.length(
            F.translate(
                tc,
                "abcdefghijklmnopqrstuvwxyz"
                "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ",
                "",
            )
        ).cast("double")
        / F.length(tc)
    )
    base = (
        df.withColumn("_sha", F.sha2(tc, 256))
        .withColumn("f_len", f_len)
        .withColumn("f_lang", F.col("f_len") & f_lang)
        .withColumn("f_q", F.col("f_lang") & (punct <= F.lit(max_punct)))
    )
    # keep-first among quality survivors: min id of the sha group's
    # passing members (min ignores the nulls the CASE leaves for
    # non-survivors)
    min_pass_id = F.min(F.when(F.col("f_q"), F.col(id_col))).over(
        W.partitionBy("_sha")
    )
    flags = base.withColumn(
        "f_exact", F.col("f_q") & (F.col(id_col) == min_pass_id)
    ).persist()

    survivors = flags.filter("f_exact").select(*df.columns)
    pairs = minhash_near_dups(
        survivors, id_col, text_col, threshold=neardup_threshold
    )
    if drop_policy == "components":
        drops = (
            # pairs_unique: minhash_near_dups emits exactly-once pairs
            connected_components(pairs, "doc_a", "doc_b", pairs_unique=True)
            .filter(F.col("id") != F.col("comp"))
            .select(F.col("id").alias(id_col))
        )
    elif drop_policy == "greedy":
        drops = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    else:
        raise ValueError(drop_policy)
    # registered AFTER minhash_near_dups so its entry-time eviction of
    # the PREVIOUS operator's persists does not evict this frame
    track_persist(flags)

    # flagged is persisted too: callers consuming BOTH outputs (the
    # prepare_corpus CLI collects the funnel and writes the kept rows)
    # would otherwise re-run the pair machinery + drop join per action.
    flagged = track_persist(
        flags.join(
            drops.withColumn("_dropped", F.lit(True)), id_col, "left"
        )
        .withColumn("f_near", F.col("f_exact") & F.col("_dropped").isNull())
        .persist()
    )

    def n(flag):
        return F.sum(F.when(F.col(flag), 1).otherwise(0)).cast("long")

    funnel = flagged.agg(
        F.count("*").cast("long").alias("ingested"),
        n("f_len").alias("len_ok"),
        n("f_lang").alias("lang_ok"),
        n("f_q").alias("quality_ok"),
        n("f_exact").alias("exact_deduped"),
        n("f_near").alias("near_deduped"),
    ).selectExpr(
        "stack(6, "
        + ", ".join(f"'{s}', {s}" for s in FUNNEL_STAGES)
        + ") as (stage, n)"
    )
    kept = flagged.filter("f_near").select(*df.columns)
    return kept, funnel
