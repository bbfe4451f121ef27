"""Shared corpus-source plumbing for the job CLIs.

``dedup_sweep`` and ``prepare_corpus`` accept the same mutually
exclusive ``--input`` (parquet path) / ``--table`` (engine table root)
source, the same ``--id-col`` / ``--text-col`` conventions, and the
same synthesized row identity for tables whose schema lacks the id
column.  Single-sourced here so the identity scheme cannot drift
between jobs: two sweeps over the same table MUST agree on row
identity for their drop sets to compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tablefmt import ROW_IDENTITY_SQL


def add_source_args(p) -> None:
    """Register the shared source/column arguments on ``p``."""
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet path of the corpus")
    src.add_argument(
        "--table", help="engine table root (scans current snapshot)"
    )
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--text-col",
        default=None,
        help="default: 'content' with --table, else 'text'",
    )


def resolve_text_col(args) -> None:
    if args.text_col is None:
        args.text_col = "content" if args.table else "text"


def _spread_narrow_scan(spark, df: DataFrame) -> DataFrame:
    """Spread a narrow (few-file) scan across the cluster before the
    compute-heavy per-row work every sweep does (md5 per shingle,
    simhash votes, LSH matmuls).  A single-file corpus otherwise runs
    the whole hash pipeline on ONE core (r6 measurement: the minhash
    sweep CLI took 39.6 s at sf1 vs ~6 s spread — the identical query
    path already spreads via t_wide).  At real scale the scan has more
    splits than cores and this is a no-op."""
    p = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < p:
        df = df.repartition(p)
    return df


def load_corpus(spark, args) -> tuple[DataFrame, str]:
    """Return ``(input df, id column name)`` for the parsed args.

    Engine tables without the id column get a stable STRING row
    identity synthesized from the natural key ``(repo, path, commit)``
    — \\x1f-joined so no path component can collide with the separator.
    """
    if args.table:
        from ..tablefmt import Table

        df = _spread_narrow_scan(spark, Table.load(args.table).scan(spark))
        id_col = args.id_col
        if id_col not in df.columns:
            df = df.withColumn(id_col, F.expr(ROW_IDENTITY_SQL))
        return df, id_col
    df = _spread_narrow_scan(spark, spark.read.parquet(args.input))
    id_col = args.id_col
    if "_change_type" in df.columns:
        # a CDC changelog (`maintain --op changes`): only insert-typed
        # rows are LIVE documents — a delete-typed row is content the
        # table just removed, and feeding it to a sweep would generate
        # spurious drops (or, with --emit keep, resurrect deleted rows)
        df = df.filter(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
    if id_col not in df.columns and {"repo", "path", "commit"}.issubset(
        df.columns
    ):
        # a changelog (`maintain --op changes`) or table export carries
        # the natural key but no id column — synthesize the SAME
        # identity an engine-table scan gets, so a sweep over a CDC
        # delta composes with signature indexes built from the table
        df = df.withColumn(id_col, F.expr(ROW_IDENTITY_SQL))
    return df, id_col
