"""Incremental (CDC) read between two snapshots of an engine table.

The lakehouse capability the batch jobs compose with: feed ONLY the
rows that changed since the last run into a downstream pipeline —
e.g. ``dedup_sweep --against`` (sweep a delta against the persisted
signature index) or an embedding refresh — without rescanning the
corpus.  Iceberg analog: the incremental/changelog read.  Reference
analog: its incremental indexing mode diffs a per-root hash cache of
files to decide what to re-embed
(/root/reference/src/client/indexing/mod.rs:336-343, surfaced as
``IndexMode::Incremental`` in /root/reference/src/types/mod.rs:40);
this operator is the table-format generalization — snapshot-level,
row-accurate, and change-TYPE aware (insert/delete, update = both).

Correctness argument (why this is exact, not append-only-approximate):
data files are immutable and every logical change is copy-on-write,
so a file present in BOTH snapshots contains byte-identical rows in
both.  Any row whose content differs between the snapshots must
therefore live in a file ADDED in the range, and its previous version
in a file REMOVED in the range:

    inserts = rows(files(to) - files(from))  anti-join  rows(files(from) - files(to))
    deletes = rows(files(from) - files(to))  anti-join  rows(files(to) - files(from))

An UPDATE appears as a delete + insert of the same (repo, path), the
standard CDC decomposition.  A pure physical rewrite (compact,
cluster, rewrite-manifests) adds and removes files carrying the same
row set, so both anti-joins are empty — maintenance emits ZERO
changes, which is the property that makes this usable as a pipeline
trigger.  A rollback emits the logical restore (re-appeared rows as
inserts, undone rows as deletes).

Scale shape: the file diff is driver-side metadata (two manifest
listings); the row diff reads ONLY the churned files — cost is
bounded by the churn between the snapshots, never by table size.  It
is ONE full-outer join keyed on a full-row fingerprint (sha256 of the
JSON-encoded row), so each churned side is scanned, hashed, and
shuffled exactly once; Catalyst/AQE pick the join strategy.

Semantics note: the diff is SET-based on full-row content.  Exact
duplicate rows (identical in every column) collapse — a multiplicity
change of an identical row does not emit.  The corpus key invariant
(one row per (repo, path), enforced by merge_into) makes this moot
for engine tables; documented for generic schemas.

Both snapshots must still exist: reading a range whose FROM end was
expired raises ``SnapshotNotFound`` (the caller's checkpoint is too
old — fall back to a full scan).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tablefmt import Table

CHANGE_TYPE_COL = "_change_type"


@dataclass
class FileDiff:
    added: list[str]    # file paths (table-relative) only in `to`
    removed: list[str]  # file paths only in `from`


def changes_file_diff(
    table: Table, from_snapshot: int, to_snapshot: int | None = None
) -> FileDiff:
    """Driver-side metadata diff: which data files churned in the range."""
    to_sid = (
        table.current_snapshot_id if to_snapshot is None else to_snapshot
    )
    if from_snapshot > to_sid:
        # a silently reversed range would swap the insert/delete labels
        # — a consumer applying the changelog would delete live data
        raise ValueError(
            f"changes range is reversed: from_snapshot={from_snapshot} "
            f"> to_snapshot={to_sid}"
        )
    from_paths = {e.path for e in table.files(from_snapshot)}
    to_paths = {e.path for e in table.files(to_sid)}
    return FileDiff(
        added=sorted(to_paths - from_paths),
        removed=sorted(from_paths - to_paths),
    )


def scan_changes(
    spark: SparkSession,
    table: Table,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Rows that changed between two snapshots, as a CDC changelog.

    Returns the table's columns plus ``_change_type`` ('insert' |
    'delete'); an update is a delete + insert pair.  Empty (zero rows)
    when only physical maintenance ran in the range.
    """
    diff = changes_file_diff(table, from_snapshot, to_snapshot)
    schema = table.schema
    cols = [f.name for f in schema.fields]
    # full-row fingerprint: to_json is deterministic (fixed field order,
    # null fields omitted consistently, binary -> base64), so equal rows
    # hash equal and differing rows differ up to sha256 collision
    fp = F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256)

    def read(paths: list[str]) -> DataFrame:
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(table.root, p) for p in paths]
        )

    # ONE full-outer join on the fingerprint instead of two anti-joins:
    # each churned side is read and hashed exactly once and shuffled
    # once (the anti-join pair would scan + fingerprint every churned
    # file twice).  A row present on both sides is unchanged (matched)
    # and drops out; added-only rows are inserts, removed-only deletes.
    added = read(diff.added).select(
        fp.alias("_fp"), F.struct(*cols).alias("_a")
    )
    removed = read(diff.removed).select(
        fp.alias("_fp"), F.struct(*cols).alias("_r")
    )
    j = added.join(removed, "_fp", "full_outer").withColumn(
        CHANGE_TYPE_COL,
        F.when(F.col("_r").isNull(), F.lit("insert")).when(
            F.col("_a").isNull(), F.lit("delete")
        ),
    )
    return (
        j.filter(F.col(CHANGE_TYPE_COL).isNotNull())
        .select(F.coalesce("_a", "_r").alias("_row"), CHANGE_TYPE_COL)
        .select("_row.*", CHANGE_TYPE_COL)
    )
