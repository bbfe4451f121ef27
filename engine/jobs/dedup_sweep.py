"""spark-submit entrypoint for the near-duplicate sweep family.

Deployment shape mirrors ``engine/jobs/maintain.py``::

    zip -r engine.zip engine/
    spark-submit --py-files engine.zip engine/jobs/dedup_sweep.py \
        --input /data/documents.parquet --method minhash \
        --threshold 0.5 --output /out/dup_pairs --emit pairs

One job = one sweep over a corpus (a parquet path or an engine table)
with one of the four near-dup operators, writing the result as parquet
and printing a one-line JSON summary:

- ``exact``      content-sha256 identity.  Pairs are STAR pairs to the
                 group's canonical (min-id) member — |group|-1 rows per
                 group, never the quadratic within-group explode.
- ``minhash``    MinHash-LSH 3-shingle candidates, map-side Jaccard
                 estimate >= --threshold (engine.dedup.minhash_near_dups;
                 degenerate buckets chunk-bounded).
- ``simhash``    64-bit SimHash banding, Hamming <= --max-hamming
                 (engine.dedup.simhash_near_dups; degenerate buckets
                 chunk-bounded, Hamming verified map-side).
- ``cosine-lsh`` sign-LSH bucketed exact-cosine verify over an embedding
                 column, cos >= --threshold
                 (engine.dedup.cosine_near_dup_lsh).

``--emit`` picks the output relation:

- ``pairs``       the near-dup pair relation (doc_a < doc_b + score).
- ``drops``       the ids the drop policy removes (``--drop-policy``).
- ``keep``        the surviving input rows (anti-join of the input
                  against the drop set) — full columns, ready to
                  re-ingest.
- ``signatures``  the signature index — exact: ``(doc_id, sha)``,
                  minhash: ``(doc_id, fp array<long>)``, simhash:
                  ``(doc_id, fp long)``, cosine-lsh: ``(doc_id, vec,
                  bks array<long> + the banding params)`` — persist
                  once, then sweep each new delta against it with
                  ``--against``.

``--against SIGS``: INCREMENTAL sweep — compare the input batch
against a previously emitted signature index (same method) instead of
against itself; the corpus text is never re-read (only the indexed
signatures participate; cosine-lsh additionally re-reads the indexed
vectors it stored for the exact verify, and bands the batch with the
params stored IN the index).  ``pairs`` emits (doc_a = index id,
doc_b = batch id + score); ``drops`` emits the batch ids
near-duplicating the index; ``keep`` the batch survivors.

``--drop-policy`` (for drops/keep):

- ``greedy``      drop every id appearing as the LARGER side of a pair —
                  one distinct, no iteration; the standard web-scale
                  shortcut (over-drops nothing, keeps exactly the ids
                  that are no pair's larger member).
- ``components``  exact dedup-group semantics: connected components of
                  the pair graph by iterative min-label propagation
                  (engine.dedup.connected_components, oracle-checked as
                  the ``dedup_connected_components`` catalog query);
                  keeps each component's smallest id.

Every mode is pure DataFrame composition: the only driver-side action is
the final row count of the parquet just written.  Scale shape per
method is documented on the underlying operators; the drop/keep joins
shuffle on the id column only (AQE broadcasts the drop side when small).

Reference parity: the reference's dedup surface is content-identity at
re-index time (src/client/indexing/mod.rs incremental_index; dedup
tests); the near-dup methods are the training-data-pipeline extension
the survey scopes in (SURVEY.md §2, LLM-pipeline operators).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .source import add_source_args, load_corpus, resolve_text_col


def _content_sha(text_col: str):
    """The content digest shared by the self-sweep, the signature
    index, and the against-sweep — the sha equi-join only ever matches
    if all three hash identically, so the expression is structural."""
    return F.sha2(F.col(text_col).cast("binary"), 256)


def sweep(df: DataFrame, args) -> DataFrame:
    """The pair relation for the chosen method, normalized to
    (doc_a, doc_b, score) with doc_a < doc_b."""
    id_col = args.id_col_resolved
    if args.method == "exact":
        hashed = df.select(
            F.col(id_col).alias("id"), _content_sha(args.text_col).alias("sha")
        )
        canon = (
            hashed.groupBy("sha")
            .agg(F.min("id").alias("doc_a"), F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        return (
            hashed.join(canon, "sha")
            .filter(F.col("id") != F.col("doc_a"))
            .select("doc_a", F.col("id").alias("doc_b"), F.lit(1.0).alias("score"))
        )
    if args.method == "minhash":
        from ..dedup import minhash_near_dups, ngram_jaccard_verify

        cand = minhash_near_dups(
            df, id_col, args.text_col,
            # with exact verify on, shortlist at HALF the threshold so
            # estimator granularity (1/8) doesn't drop true borderline
            # pairs before the exact stage judges them
            threshold=args.threshold / 2 if args.verify_exact else args.threshold,
            cap=args.bucket_cap,
        )
        if args.verify_exact:
            return ngram_jaccard_verify(
                df, cand, id_col, args.text_col, threshold=args.threshold
            ).withColumnRenamed("jaccard", "score")
        return cand.withColumnRenamed("est_jaccard", "score")
    if args.method == "simhash":
        from ..dedup import simhash_near_dups

        return simhash_near_dups(
            df, id_col, args.text_col, max_hamming=args.max_hamming,
            cap=args.bucket_cap, collapse_fps=args.collapse_fps,
        ).select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.col("hamming").cast("double").alias("score"),
        )
    if args.method == "cosine-lsh":
        from ..dedup import cosine_near_dup_lsh

        return cosine_near_dup_lsh(
            df, id_col, args.vec_col, threshold=args.threshold,
            n_tables=args.lsh_tables, n_planes=args.lsh_planes,
            dim=args.dim, seed=args.seed,
        ).select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.col("cos_raw").alias("score"),
        )
    raise ValueError(args.method)


def _signatures(df: DataFrame, args) -> DataFrame:
    """The persistable signature index for --emit signatures."""
    id_col = args.id_col_resolved
    if args.method == "exact":
        return df.select(
            F.col(id_col).alias("doc_id"),
            _content_sha(args.text_col).alias("sha"),
        )
    if args.method == "minhash":
        from ..dedup import minhash_signatures

        return minhash_signatures(df, id_col, args.text_col)
    if args.method == "simhash":
        from ..dedup import with_simhash

        return with_simhash(
            df.select(id_col, args.text_col), args.text_col
        ).select(
            F.col(id_col).alias("doc_id"), F.col("simhash").alias("fp")
        )
    if args.method == "cosine-lsh":
        from ..dedup import lsh_bucket_udf

        # vectors travel with the buckets (the exact verify needs them)
        # and the banding params are stored IN the index so a later
        # --against cannot silently band the batch differently
        return (
            df.select(
                F.col(id_col).alias("doc_id"),
                F.col(args.vec_col).alias("vec"),
            )
            .withColumn(
                "bks",
                lsh_bucket_udf(
                    args.lsh_tables, args.lsh_planes, args.dim, args.seed
                )(F.col("vec")),
            )
            .withColumn("n_tables", F.lit(args.lsh_tables))
            .withColumn("n_planes", F.lit(args.lsh_planes))
            .withColumn("dim", F.lit(args.dim))
            .withColumn("seed", F.lit(args.seed))
        )
    raise ValueError(args.method)


def _sweep_against(index_sigs: DataFrame, df: DataFrame, args) -> DataFrame:
    """Incremental sweep: (doc_a = index id, doc_b = batch id, score)."""
    id_col = args.id_col_resolved
    if args.method == "exact":
        batch = df.select(
            F.col(id_col).alias("doc_b"), _content_sha(args.text_col).alias("sha")
        )
        return (
            index_sigs.select(F.col("doc_id").alias("doc_a"), "sha")
            .join(batch, "sha")
            .select("doc_a", "doc_b", F.lit(1.0).alias("score"))
        )
    if args.method == "minhash":
        from ..dedup import minhash_near_dups_against

        return minhash_near_dups_against(
            index_sigs, df, id_col, args.text_col,
            threshold=args.threshold,
        ).withColumnRenamed("est_jaccard", "score")
    if args.method == "simhash":
        from ..dedup import simhash_near_dups_against

        return simhash_near_dups_against(
            index_sigs, df, id_col, args.text_col,
            max_hamming=args.max_hamming,
        ).withColumn("score", F.col("hamming").cast("double")).drop("hamming")
    if args.method == "cosine-lsh":
        from ..dedup import cosine_near_dup_lsh_against

        # band the batch with the params the index was BUILT with
        # (empty index -> no row to read; any banding yields no pairs,
        # so fall back to the CLI flags instead of crashing)
        stored = index_sigs.select(
            "n_tables", "n_planes", "dim", "seed"
        ).first() or {"n_tables": args.lsh_tables, "n_planes": args.lsh_planes,
                      "dim": args.dim, "seed": args.seed}
        return cosine_near_dup_lsh_against(
            index_sigs, df, id_col, args.vec_col,
            threshold=args.threshold,
            n_tables=stored["n_tables"], n_planes=stored["n_planes"],
            dim=stored["dim"], seed=stored["seed"],
        ).withColumnRenamed("cos_raw", "score")
    raise ValueError(args.method)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="near-duplicate sweep job")
    add_source_args(p)
    p.add_argument("--output", required=True, help="parquet output path")
    p.add_argument(
        "--method", required=True,
        choices=["exact", "minhash", "simhash", "cosine-lsh"],
    )
    p.add_argument("--emit",
                   choices=["pairs", "drops", "keep", "signatures"],
                   default="pairs")
    p.add_argument("--against", default=None,
                   help="parquet path of a SAME-METHOD signature index "
                        "(--emit signatures); sweep the input batch "
                        "AGAINST it instead of against itself")
    p.add_argument("--drop-policy", choices=["greedy", "components"],
                   default="greedy")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="minhash est-Jaccard / cosine threshold")
    p.add_argument("--verify-exact", action="store_true",
                   help="minhash only: re-score the LSH shortlist with "
                        "EXACT 3-shingle-set Jaccard (candidate-bounded "
                        "joins) and apply --threshold to the exact value")
    p.add_argument("--max-hamming", type=int, default=3)
    p.add_argument("--bucket-cap", type=int, default=256)
    p.add_argument("--collapse-fps", action="store_true",
                   help="simhash only: run the quadratic banding over "
                        "DISTINCT fingerprints (pays on exact-"
                        "duplication-heavy corpora; see "
                        "engine.dedup.hamming_pairs_from_fps)")
    # defaults match the dedup_cosine_lsh catalog query's banding, the
    # configuration with MEASURED recall 1.0 on the test corpora
    # (BENCH/ANN_RECALL.json recall-vs-tables curve); fewer/longer
    # tables trade recall for candidate volume.
    p.add_argument("--lsh-tables", type=int, default=32)
    p.add_argument("--lsh-planes", type=int, default=4)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    resolve_text_col(args)

    from ..session import get_spark

    if args.against and args.emit == "signatures":
        p.error("--against and --emit signatures are mutually exclusive")
    if args.against and args.drop_policy == "components":
        p.error("--against implies the greedy policy (index docs are "
                "not droppable; every matching batch doc drops)")
    if args.against and args.verify_exact:
        p.error("--verify-exact needs both sides' text; the signature "
                "index carries none (run the exact re-score on the "
                "emitted pairs with hydrated text instead)")

    spark = get_spark(app_name=f"dedup-{args.method}", master=args.master)
    df, args.id_col_resolved = load_corpus(spark, args)

    if args.emit == "signatures":
        out_df = _signatures(df, args)
        out_df.write.mode("overwrite").parquet(args.output)
        rows = spark.read.parquet(args.output).count()
        print(json.dumps({
            "op": "dedup-sweep", "method": args.method,
            "emit": args.emit, "rows": rows, "output": args.output,
        }))
        return 0

    if args.against:
        # Exclude pairs where both sides are the SAME document.  For
        # the synthesized \x1f identity (repo\x1fpath\x1fcommit) the
        # first two fields are the document key, so a new VERSION of
        # an indexed file is an update, not a near-dup of its own
        # previous version — without this, the changes->sweep->delete
        # loop would delete every edited row (the bug the streaming
        # sink fixed; same exclusion, same altitude).  For ids with no
        # \x1f, substring_index returns the whole id and this reduces
        # exactly to the old doc_a != doc_b degenerate-self-pair
        # filter.
        pairs = _sweep_against(
            spark.read.parquet(args.against), df, args
        ).filter(
            F.substring_index("doc_a", "\x1f", 2)
            != F.substring_index("doc_b", "\x1f", 2)
        )
    else:
        pairs = sweep(df, args)
    if args.emit == "pairs":
        out_df = pairs
    else:
        if args.drop_policy == "components":
            from ..dedup import connected_components

            drops = (
                # self-sweep pairs are exactly-once (first-band
                # emission); against-sweep pairs may contain reversed
                # duplicates when a doc sits in both index and batch,
                # so only the self-sweep skips the edge distinct
                connected_components(pairs, pairs_unique=not args.against)
                .filter(F.col("id") != F.col("comp"))
                .select(F.col("id").alias(args.id_col_resolved))
            )
        else:
            drops = pairs.select(
                F.col("doc_b").alias(args.id_col_resolved)
            ).distinct()
        if args.emit == "drops":
            out_df = drops
        else:  # keep: surviving input rows, full columns
            out_df = df.join(drops, args.id_col_resolved, "left_anti")

    out_df.write.mode("overwrite").parquet(args.output)
    rows = spark.read.parquet(args.output).count()
    print(json.dumps({
        "op": "dedup-sweep", "method": args.method, "emit": args.emit,
        "rows": rows, "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
