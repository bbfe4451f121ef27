"""Extra benchmarks for optimization round 6 (bench.py is FROZEN — this
file holds the noop-sink isolation runs per the optimization guide §1.4).

Usage: python bench_extra.py <case> [sf_dir]

Each case times one query or one stage of a query against
$SPARK_GRAFT_SF_DIR (or argv[2]), using the noop sink so the computation
is timed without the collect, unless the case name ends in `_collect`
(which times the exact thing bench.py times).  Prints one JSON line per
timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from engine.queries import QUERIES  # noqa: E402
from engine.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(label: str, fn, n: int = 2) -> float:
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        if best is None or dt < best:
            best = dt
    print(json.dumps({"case": label, "sec": round(best, 3), "runs": n}), flush=True)
    return best


def main() -> None:
    case = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"bench-extra-{case}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setJobDescription(case)

    if case.startswith("q_"):
        # q_<name>[,<name>...] — noop-sink each declared query in one
        # session; a name ending in `:collect` times the bench's
        # methodology (rebuild the plan via fn(), then df.collect() —
        # rebuilding matters: operators persist intermediates that a
        # second collect of the SAME df would reuse, which bench.py's
        # per-pass fn() calls do not).
        for name in case[2:].split(","):
            if name.endswith(":collect"):
                qn = name[: -len(":collect")]

                def run(qn=qn):
                    QUERIES[qn](spark, sf_dir).collect()

                timed(f"{qn}:collect", run)
            else:
                qn = name

                def run(qn=qn):
                    noop(QUERIES[qn](spark, sf_dir))

                timed(qn, run)
        return

    if case == "simhash_stages":
        # Stage isolation for dedup_simhash at this sf.
        from engine.queries.pipeline import (
            N_SIMHASH_BANDS,
            N_SIMHASH_BITS,
            SIMHASH_BAND_BITS,
            t_wide,
        )

        d = t_wide(spark, sf_dir, "documents")
        toks = d.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
        )
        h = toks.select(
            "doc_id",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("hv"),
        )
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
            bit = (
                F.when(F.col(f"s_{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
            )
            term = F.shiftleft(bit, i)
            fp_col = term if fp_col is None else fp_col + term
        fp = votes.select("doc_id", fp_col.alias("fp"))
        timed("simhash_fp_only", lambda: noop(fp))

        from engine.dedup import hamming_pairs_from_fps

        cand = hamming_pairs_from_fps(
            fp, N_SIMHASH_BANDS, SIMHASH_BAND_BITS, N_SIMHASH_BANDS - 1, cap=256
        )
        pairs = cand.select("doc_a", "doc_b", "hamming")
        timed("simhash_pairs_noop", lambda: noop(pairs))
        ordered = pairs.orderBy("doc_a", "doc_b")
        timed("simhash_ordered_noop", lambda: noop(ordered))
        timed("simhash_full_collect", lambda: ordered.collect(), n=1)
        return

    if case == "simhash_ab":
        # direct vs collapsed fp-pair shape, both with first-band
        # exactly-once emission; checksum proves identical output.
        from engine.dedup import hamming_pairs_from_fps
        from engine.queries.pipeline import (
            N_SIMHASH_BANDS,
            N_SIMHASH_BITS,
            SIMHASH_BAND_BITS,
            t_wide,
        )

        d = t_wide(spark, sf_dir, "documents")
        toks = d.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
        )
        h = toks.select(
            "doc_id",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("hv"),
        )
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
            bit = (
                F.when(F.col(f"s_{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
            )
            term = F.shiftleft(bit, i)
            fp_col = term if fp_col is None else fp_col + term
        fp = votes.select("doc_id", fp_col.alias("fp"))

        def checksum(df):
            return df.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(doc_a, doc_b, hamming))").alias("x"),
            ).collect()[0]

        for label, flag in (("direct", False), ("collapsed", True)):
            cand = hamming_pairs_from_fps(
                fp, N_SIMHASH_BANDS, SIMHASH_BAND_BITS, N_SIMHASH_BANDS - 1,
                cap=256, collapse_fps=flag,
            )
            timed(f"simhash_{label}_noop", lambda c=cand: noop(c))
            row = checksum(cand)
            print(json.dumps({"case": f"simhash_{label}_checksum",
                              "n": row["n"], "x": row["x"]}), flush=True)
        return

    raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
