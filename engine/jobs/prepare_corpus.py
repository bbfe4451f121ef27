"""spark-submit entrypoint for end-to-end training-corpus preparation.

Deployment shape mirrors ``engine/jobs/maintain.py``::

    zip -r engine.zip engine/
    spark-submit --py-files engine.zip engine/jobs/prepare_corpus.py \
        --input /data/documents.parquet --output /out/prepped

One job = the full prep pipeline (engine.prep.prepare_training_corpus)
over a corpus — length gate -> language-ID -> punctuation-quality gate
-> exact dedup keep-first -> MinHash near-dup sweep — writing the
surviving rows as parquet and printing ONE JSON line with the stage
funnel (cumulative survivor counts), computed with a single aggregate
over the flag frame rather than a count job per stage.

``--emit funnel`` writes the funnel relation itself instead of the
surviving rows (for auditing a corpus without rewriting it).

The composition is oracle-checked end-to-end as the
``training_funnel`` catalog query; per-stage operators carry their own
oracles (quality_score, lang_id_heuristic, sha256_content,
dedup_minhash_pairs, dedup_connected_components).
"""

from __future__ import annotations

import argparse
import json
import sys

from .source import add_source_args, load_corpus, resolve_text_col


def main(argv: list[str] | None = None) -> int:
    from ..prep import (
        MAX_LEN,
        MAX_PUNCT,
        MIN_LEN,
        NEARDUP_THRESHOLD,
        prepare_training_corpus,
    )

    p = argparse.ArgumentParser(description="training-corpus prep job")
    add_source_args(p)
    p.add_argument("--output", required=True, help="parquet output path")
    p.add_argument("--emit", choices=["kept", "funnel"], default="kept")
    p.add_argument("--min-len", type=int, default=MIN_LEN)
    p.add_argument("--max-len", type=int, default=MAX_LEN)
    p.add_argument("--max-punct", type=float, default=MAX_PUNCT)
    p.add_argument("--neardup-threshold", type=float,
                   default=NEARDUP_THRESHOLD)
    p.add_argument("--drop-policy", choices=["greedy", "components"],
                   default="greedy")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    resolve_text_col(args)

    from ..session import get_spark

    spark = get_spark(app_name="prepare-corpus", master=args.master)
    df, id_col = load_corpus(spark, args)

    kept, funnel = prepare_training_corpus(
        df,
        id_col=id_col,
        text_col=args.text_col,
        min_len=args.min_len,
        max_len=args.max_len,
        max_punct=args.max_punct,
        neardup_threshold=args.neardup_threshold,
        drop_policy=args.drop_policy,
    )
    # The funnel plan is executed ONCE (its 6 collected rows serve both
    # the printed summary and, under --emit funnel, the written
    # relation); under --emit kept the write still shares the persisted
    # flag frame, so the near-dup machinery is not re-run per emit.
    funnel_rows = funnel.collect()
    if args.emit == "funnel":
        out_df = spark.createDataFrame(funnel_rows, funnel.schema)
    else:
        out_df = kept
    out_df.write.mode("overwrite").parquet(args.output)
    stages = {r["stage"]: r["n"] for r in funnel_rows}
    print(json.dumps({
        "op": "prepare-corpus", "emit": args.emit, "funnel": stages,
        "output": args.output,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
