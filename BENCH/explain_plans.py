"""Dump physical plans of the load-bearing operators -> BENCH/PLANS.md.

Plan-shape evidence the scale claims rest on:
- parquet scans show PushedFilters + pruned ReadSchema (Catalyst
  pushdown under our manifest pruning),
- dimension joins go broadcast; big joins stay sort-merge under AQE,
- hot paths sit inside WholeStageCodegen spans,
- the clustering write is one range shuffle (no global sort).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from engine import corpus, tablefmt  # noqa: E402
from engine.ops.cluster import with_curve_key  # noqa: E402
from engine.queries import QUERIES  # noqa: E402
from engine.session import get_spark  # noqa: E402
from engine.tablefmt import Table  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import tempfile

    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=8)
    sections: list[tuple[str, str, str]] = []

    # 1. pruned + pushed table scan
    with tempfile.TemporaryDirectory() as d:
        t = Table.create(os.path.join(d, "t"))
        df = corpus.generate_corpus(spark, n_files=2000, n_repos=10, partitions=8)
        for r in range(10):
            tablefmt.append(
                spark, t, df.filter(F.col("repo") == f"repo_{r:04d}"),
                num_files=1, partition=f"repo_{r:04d}",
            )
        pred = [("repo", "==", "repo_0003")]
        scan = t.scan(spark, pred=pred, columns=["repo", "path", "commit"])
        n_pruned = len(t.files(pred=pred))
        sections.append(
            (
                "Manifest-pruned table scan (repo = 'repo_0003')",
                f"manifest pruning kept {n_pruned} of {len(t.files())} files; "
                "residual filter pushed to parquet (PushedFilters), projection "
                "pruned to 3 columns (ReadSchema):",
                cap(scan),
            )
        )

        # 2. clustering layout plan: one UDF pass + one hash exchange
        from engine.ops.cluster import _sample_boundaries_pairs, _zbin_quantiles

        bounds, pairs = _sample_boundaries_pairs(
            df.select("repo", "path"), ["repo", "path"]
        )
        keyed = with_curve_key(df, "zorder", bounds["repo"], bounds["path"])
        zq = _zbin_quantiles(pairs, "zorder", bounds["repo"], bounds["path"], 8)
        arr = ", ".join(str(b) for b in zq)
        keyed = keyed.withColumn(
            "zbin",
            F.expr(
                f"aggregate(array({arr}), 0, (acc, b) -> acc + CAST(zkey >= b AS INT))"
            ),
        )
        layout = keyed.repartition(len(zq) + 1, "zbin").sortWithinPartitions(
            "zbin", "zkey"
        )
        sections.append(
            (
                "Z-order layout write plan (single-pass quantile routing)",
                "curve key in ONE ArrowEvalPython (vectorized UDF) node; output-"
                "file routing (zbin) is a JVM codegen'd searchsorted over driver-"
                "sampled quantiles — no range-sampler second pass; one hash "
                "exchange + in-partition sort, no global sort:",
                cap(layout),
            )
        )

    # 3. broadcast dim join
    sections.append(
        (
            "Star join (customer x nation x region)",
            "both dims broadcast (BroadcastHashJoin), fact scan stays columnar:",
            cap(QUERIES["broadcast_dim_join"](spark, SF_DIR)),
        )
    )

    # 4. big fact-fact join under AQE
    sections.append(
        (
            "Fact-fact join (lineitem x orders x customer)",
            "AQE plans sort-merge for fact-fact, broadcast for dims:",
            cap(QUERIES["revenue_by_nation"](spark, SF_DIR)),
        )
    )

    # 5. pricing summary — whole-stage codegen agg
    sections.append(
        (
            "Pricing summary (TPC-H Q1 shape)",
            "partial+final HashAggregate inside WholeStageCodegen; filter pushed:",
            cap(QUERIES["pricing_summary"](spark, SF_DIR)),
        )
    )

    # 6. BM25: tf columns projected in ONE content pass, tiny broadcasts
    sections.append(
        (
            "BM25 top-k",
            "per-term tfs computed as projected columns in one codegen'd scan "
            "(one regexp per term per doc); df and corpus stats are broadcast "
            "(BroadcastExchange of |terms| rows / 1 row); the only shuffle "
            "carries (doc_id, term, tf) short rows:",
            cap(QUERIES["bm25_topk"](spark, SF_DIR)),
        )
    )

    # 7. MinHash bands: no row multiplication before aggregation
    sections.append(
        (
            "MinHash-LSH band dedup",
            "all 8 band minima are aggregate columns of ONE groupBy over the "
            "shingle relation (no crossJoin with a band table — round 1 "
            "multiplied the shingle relation 8x); the trailing explode is "
            "8 rows per doc:",
            cap(QUERIES["dedup_minhash_bands"](spark, SF_DIR)),
        )
    )

    out = ["# Physical-plan evidence (explain formatted)\n"]
    for title, note, plan in sections:
        out.append(f"## {title}\n\n{note}\n\n```\n{plan}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
