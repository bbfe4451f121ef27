"""Row-level DELETE WHERE / UPDATE WHERE — copy-on-write at file
granularity.

The reference deletes at coarser granularities (whole files on re-index,
whole tables on clear: src/client/indexing/mod.rs removed-file path;
S11/S12 in SURVEY.md §2); this adds the row-level member of the same
family, the operation a dedup sweep needs to APPLY its drop set to a
live table (``dedup_sweep --emit drops`` -> ``maintain --op delete``).

Shape (the Iceberg/Delta COW DELETE):

1. ONE job finds the files that physically contain a matching row —
   only touched files reach the driver (an untouched-file row never
   leaves the executors), and the same aggregate yields the per-file
   deleted-row counts.
2. Touched files are re-read in FULL and their surviving rows written
   as new files (untouched files are never read); survivor row count
   comes from manifest stats minus the matched counts, so an
   everything-matched delete skips the write entirely.
3. ONE atomic commit swaps touched files for rewrites.  A crash before
   the commit leaves only staged orphans (age-guarded sweep reclaims
   them); replaying the same predicate is a no-op once nothing matches.

NULL semantics follow SQL DELETE: a row is deleted where the predicate
is TRUE; rows where it evaluates NULL survive.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession  # noqa: F401 (typing)
from pyspark.sql import functions as F

from ..tablefmt import ROW_IDENTITY_SQL, Table
from .merge import rel_path


@dataclass
class DeleteResult:
    rows_deleted: int
    files_rewritten: int
    files_added: int
    snapshot_id: int | None
    duration_s: float


def delete_where(
    spark: SparkSession,
    table: Table,
    predicate: str | None = None,
    num_files: int | None = None,
    keys: DataFrame | None = None,
    key_expr: str | None = None,
    key_col: str = "doc_id",
) -> DeleteResult:
    """Delete rows of ``table`` matched by exactly one of:

    - ``predicate``: a SQL boolean expression over the table's columns
      (rows where it is TRUE are deleted; NULL survives).
    - ``keys``: a relation of row identities to delete — the
      composition that APPLIES a dedup drop set (``dedup_sweep --emit
      drops``) to a live table.  ``key_expr`` is the SQL expression
      computing the table-side identity (default: the sweep CLI's
      synthesized key ``concat_ws('\\x1f', repo, path, commit)``) and
      ``key_col`` names the identity column in ``keys``.  The match is
      a semi-join on the distinct key set — Catalyst/AQE broadcast it
      when small, shuffle otherwise; never an IN-list on the driver.

    Returns a no-op result (snapshot_id None) when nothing matches.
    """
    assert (predicate is None) != (keys is None), (
        "exactly one of predicate / keys"
    )
    t0 = time.monotonic()
    expected_parent = table.current_snapshot_id

    if predicate is not None:
        hit = F.coalesce(F.expr(predicate).cast("boolean"), F.lit(False))

        def _mark(df: DataFrame) -> DataFrame:
            return df.withColumn("_hit", hit)

        summary_match = {"predicate": predicate}
    else:
        key_expr = key_expr or ROW_IDENTITY_SQL
        keyset = keys.select(
            F.col(key_col).alias("_k")
        ).distinct().withColumn("_hitflag", F.lit(True))

        def _mark(df: DataFrame) -> DataFrame:
            return (
                df.withColumn("_k", F.expr(key_expr))
                .join(keyset, "_k", "left")
                .withColumn("_hit", F.coalesce("_hitflag", F.lit(False)))
                .drop("_k", "_hitflag")
            )

        summary_match = {"key_expr": key_expr}

    # one job: per-file matched counts, touched files only (untouched
    # rows never leave the executors).  The predicate path filters on
    # the RAW expression — in a Filter, NULL already behaves as FALSE
    # (exactly DELETE's matching side) and the un-wrapped predicate
    # reaches the parquet reader as PushedFilters, so non-matching
    # row groups are skipped at the scan; the coalesce wrapper is only
    # needed on the survivor side's negation.
    scan = table.scan(spark, with_file_path=True)
    if predicate is not None:
        matching = scan.filter(F.expr(predicate).cast("boolean"))
    else:
        matching = _mark(scan).filter("_hit")
    per_file = matching.groupBy("_file").count().collect()
    if not per_file:
        return DeleteResult(0, 0, 0, None, time.monotonic() - t0)
    touched_rel = sorted(rel_path(table, r["_file"]) for r in per_file)
    rows_deleted = sum(r["count"] for r in per_file)

    # survivor count from manifest stats — no second scan job
    touched_set = set(touched_rel)
    touched_total = sum(e.rows for e in table.files() if e.path in touched_set)
    survivors_n = touched_total - rows_deleted

    added = []
    if survivors_n > 0:
        touched_abs = [os.path.join(table.root, p) for p in touched_rel]
        survivors = (
            _mark(spark.read.schema(table.schema).parquet(*touched_abs))
            .filter(~F.col("_hit"))
            .drop("_hit")
        )
        added = table.write_data_files(
            spark, survivors, num_files=num_files or len(touched_rel)
        )
    snap = table.commit(
        "delete",
        added,
        removed_paths=touched_set,
        summary={
            "rows_deleted": rows_deleted,
            "files_rewritten": len(touched_rel),
            "files_added": len(added),
            **summary_match,
        },
        expected_parent=expected_parent,
    )
    return DeleteResult(
        rows_deleted,
        len(touched_rel),
        len(added),
        snap.snapshot_id,
        time.monotonic() - t0,
    )


def update_where(
    spark: SparkSession,
    table: Table,
    set_exprs: dict[str, str],
    predicate: str,
    num_files: int | None = None,
) -> DeleteResult:
    """Row-level UPDATE ... SET col = expr WHERE predicate — the same
    COW shape as ``delete_where``: one pushdown-friendly job finds the
    files containing a matching row, touched files are rewritten with
    the SET expressions applied to matching rows (others byte-for-byte
    unchanged), one atomic commit swaps them.  ``set_exprs`` maps
    column name -> SQL expression (evaluated against the PRE-update
    row, so swaps like {'a': 'b', 'b': 'a'} behave as SQL UPDATE).
    NULL predicate rows are not updated, as in SQL.

    Returns a DeleteResult whose rows_deleted field counts the rows
    UPDATED (files_added / files_rewritten as in delete)."""
    unknown = set(set_exprs) - {f.name for f in table.schema.fields}
    assert not unknown, f"SET targets not in schema: {sorted(unknown)}"
    t0 = time.monotonic()
    expected_parent = table.current_snapshot_id
    pred = F.expr(predicate).cast("boolean")

    per_file = (
        table.scan(spark, with_file_path=True)
        .filter(pred)
        .groupBy("_file")
        .count()
        .collect()
    )
    if not per_file:
        return DeleteResult(0, 0, 0, None, time.monotonic() - t0)
    touched_rel = sorted(rel_path(table, r["_file"]) for r in per_file)
    rows_updated = sum(r["count"] for r in per_file)

    touched_abs = [os.path.join(table.root, p) for p in touched_rel]
    hit = F.coalesce(pred, F.lit(False))
    base = spark.read.schema(table.schema).parquet(*touched_abs)
    # all SET expressions evaluate against the pre-update row: compute
    # them in ONE select so no assignment sees another's result
    rewritten = base.select(
        *[
            F.when(hit, F.expr(set_exprs[c]).cast(base.schema[c].dataType))
            .otherwise(F.col(c))
            .alias(c)
            if c in set_exprs
            else F.col(c)
            for c in base.columns
        ]
    )
    added = table.write_data_files(
        spark, rewritten, num_files=num_files or len(touched_rel)
    )
    snap = table.commit(
        "update",
        added,
        removed_paths=set(touched_rel),
        summary={
            "rows_updated": rows_updated,
            "files_rewritten": len(touched_rel),
            "files_added": len(added),
            "predicate": predicate,
            "set": dict(set_exprs),
        },
        expected_parent=expected_parent,
    )
    return DeleteResult(
        rows_updated,
        len(touched_rel),
        len(added),
        snap.snapshot_id,
        time.monotonic() - t0,
    )
