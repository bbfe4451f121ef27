"""Bin-packing small-file compaction, resumable from checkpoint.

The reference appends one table fragment per store_embeddings call
(/root/reference/src/vector_db/lance_client/mod.rs:308-371) — unbounded
small-file accumulation.  This operator repacks those files:

1. Plan (driver, metadata only): group current data files by manifest
   partition, first-fit-decreasing bin-pack every group's files into
   bins of ~``target_bytes`` (default 128 MB — one HDFS/parquet split,
   so a post-compaction scan task reads exactly one file).  Bins with a
   single already-right-sized file are skipped (no write amplification).
2. Execute (one Spark job per batch of bins): read the batch's files,
   tag each row with its bin via a broadcast file->bin lookup joined on
   ``input_file_name()``, hash-repartition on bin id so each bin lands
   in one task, write one parquet file per bin.  No global shuffle of
   untouched data; cost is proportional to bytes rewritten.
3. Commit once: swap all binned input files for bin outputs in a single
   atomic snapshot.

Resumability (the dirty-flag protocol, engine.checkpoint): every bin is
a ledger unit — marked dirty before its batch writes, clean (with
row/byte metrics + output lineage) after.  A restarted job revalidates
the ledger, reuses outputs of clean/complete bins, and redoes only the
rest (mirrors /root/reference/src/client/indexing/mod.rs:848-947).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..checkpoint import Ledger
from ..tablefmt import DataFile, Table

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass
class CompactResult:
    files_in: int
    files_out: int
    bytes_in: int
    bytes_out: int
    rows_rewritten: int
    snapshot_id: int | None
    duration_s: float = 0.0

    @property
    def files_per_s(self) -> float:
        return self.files_in / self.duration_s if self.duration_s else 0.0

    @property
    def bytes_per_s(self) -> float:
        return self.bytes_in / self.duration_s if self.duration_s else 0.0


def plan_bins(
    entries: list[DataFile],
    target_bytes: int,
    min_input_files: int = 2,
    small_file_fraction: float = 0.75,
) -> list[list[DataFile]]:
    """First-fit-decreasing bin-packing per partition group.

    Only files smaller than ``small_file_fraction * target_bytes`` are
    compaction candidates; bins that would contain a single file are
    dropped (rewriting one file buys nothing).  Pure metadata — runs on
    the driver over manifest entries, never touches data.
    """
    cutoff = target_bytes * small_file_fraction
    groups: dict[str, list[DataFile]] = {}
    for e in entries:
        if e.bytes < cutoff:
            groups.setdefault(e.partition, []).append(e)
    bins: list[list[DataFile]] = []
    for part in sorted(groups):
        files = sorted(groups[part], key=lambda e: -e.bytes)
        open_bins: list[tuple[int, list[DataFile]]] = []
        for e in files:
            placed = False
            for i, (free, members) in enumerate(open_bins):
                if e.bytes <= free:
                    members.append(e)
                    open_bins[i] = (free - e.bytes, members)
                    placed = True
                    break
            if not placed:
                open_bins.append((target_bytes - e.bytes, [e]))
        bins.extend(m for _, m in open_bins if len(m) >= min_input_files)
    return bins


def compact(
    spark: SparkSession,
    table: Table,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    bins_per_batch: int = 64,
    job_id: str | None = None,
    fail_after_batches: int | None = None,  # test hook: simulated crash
) -> CompactResult:
    """Run (or resume) a compaction job.  ``job_id`` identifies the
    ledger; rerunning with the same id resumes after a crash."""
    import time

    t0 = time.monotonic()
    base_snapshot = table.current_snapshot_id
    entries = table.files()
    bins = plan_bins(entries, target_bytes)
    if not bins:
        return CompactResult(0, 0, 0, 0, 0, None, time.monotonic() - t0)

    job_id = job_id or f"compact-{uuid.uuid4().hex[:12]}"
    ledger = Ledger.open(table.root, job_id, meta={"base_snapshot": base_snapshot})
    # deterministic bin ids from input membership => a resumed job with the
    # same snapshot re-derives identical units
    bin_ids = []
    for members in bins:
        bid = "bin-" + _stable_id(sorted(e.path for e in members))
        bin_ids.append(bid)
        ledger.register(bid, expected_outputs=1, inputs=[e.path for e in members])
    ledger.save()

    todo = set(ledger.units_to_redo(table.root))
    todo |= {u.unit_id for u in ledger.units.values() if u.state == "pending"}
    order = [b for b in bin_ids if b in todo]
    by_id = dict(zip(bin_ids, bins))

    # COMPLETE units (still "dirty" but kept by units_to_redo): the
    # crash hit between output rename and mark_clean.  Outputs are whole
    # files (rename is the last step) — trust them, recover metrics from
    # parquet footers, and mark clean instead of rewriting
    # (/root/reference/src/client/indexing/mod.rs:867-947's resume path).
    import os

    from ..tablefmt import _collect_file_stats

    for u in [u for u in ledger.units.values() if u.state == "dirty"]:
        if u.unit_id not in by_id:
            # A concurrent commit landed between crash and resume: bins
            # re-derived from the NEW snapshot no longer contain this
            # unit.  Its outputs are orphans (the age-guarded sweep
            # reclaims them); drop the unit so resume proceeds instead
            # of wedging the job_id on a KeyError (ADVICE r2).
            del ledger.units[u.unit_id]
            ledger.save()
            continue
        abs_outs = [os.path.join(table.root, o) for o in u.outputs]
        infos = _collect_file_stats(spark, abs_outs)
        u.meta["stats"] = infos[0]["stats"]
        u.meta["partition"] = by_id[u.unit_id][0].partition
        ledger.mark_clean(
            u.unit_id,
            u.outputs,
            sum(i["rows"] for i in infos),
            sum(i["bytes"] for i in infos),
            snapshot_id=base_snapshot,
        )

    schema = table.schema
    batches = [order[i : i + bins_per_batch] for i in range(0, len(order), bins_per_batch)]
    for batch_no, batch in enumerate(batches):
        if fail_after_batches is not None and batch_no >= fail_after_batches:
            raise RuntimeError("simulated crash during compaction")
        # pre-assign each bin's output path and record it on the dirty
        # mark, so a crash between rename and mark_clean validates
        # COMPLETE (outputs present) rather than CORRUPT
        dst_by_bid = {
            bid: os.path.join(table.data_dir, f"{uuid.uuid4().hex}.parquet")
            for bid in batch
        }
        for bid in batch:
            ledger.mark_dirty(
                bid,
                expected_paths=[os.path.relpath(dst_by_bid[bid], table.root)],
            )
        # file -> bin lookup (metadata-sized, broadcast)
        lookup = []
        for i, bid in enumerate(batch):
            for e in by_id[bid]:
                lookup.append((os.path.join(table.root, e.path), bid, i))
        lookup_df = F.broadcast(
            spark.createDataFrame(
                lookup, "abs_path string, bin_id string, bin_ord int"
            )
        )
        paths = [p for p, _, _ in lookup]
        df = (
            spark.read.schema(schema)
            .parquet(*paths)
            .withColumn("abs_path", _strip_file_uri(F.input_file_name()))
            .join(lookup_df, "abs_path")
            .drop("abs_path")
        )
        stage = os.path.join(table.root, f"_stage-{uuid.uuid4().hex}")
        # bijective bin->partition routing on the ordinal (plain
        # repartition(n, "bin_id") hash-collides bins: ~1/3 of tasks
        # idle, stragglers carrying 3 bins — engine/partitioning.py)
        from ..partitioning import repartition_by_bin

        (
            repartition_by_bin(df, "bin_ord", len(batch))
            .drop("bin_ord")
            .write.partitionBy("bin_id")
            .mode("overwrite")
            .parquet(stage)
        )
        # move each bin's output into data/ (the pre-assigned path the
        # ledger already knows), collect stats, ledger-clean
        moved: dict[str, str] = {}
        for bid in batch:
            bin_dir = os.path.join(stage, f"bin_id={bid}")
            parts = [
                f
                for f in os.listdir(bin_dir)
                if f.endswith(".parquet") and f.startswith("part-")
            ]
            assert len(parts) == 1, f"expected 1 file per bin, got {parts}"
            dst = dst_by_bid[bid]
            os.rename(os.path.join(bin_dir, parts[0]), dst)
            moved[bid] = dst
        _cleanup_dir(stage)
        infos = {i["path"]: i for i in _collect_file_stats(spark, list(moved.values()))}
        for bid in batch:
            info = infos[moved[bid]]
            rel = os.path.relpath(moved[bid], table.root)
            ledger.mark_clean(
                bid, [rel], info["rows"], info["bytes"], snapshot_id=base_snapshot
            )
            ledger.units[bid].meta["stats"] = info["stats"]
            ledger.units[bid].meta["partition"] = by_id[bid][0].partition
        ledger.save()

    # -- single atomic commit swapping inputs for outputs -------------------
    added: list[DataFile] = []
    removed: set[str] = set()
    rows_rewritten = 0
    bytes_out = 0
    bytes_in = 0
    files_in = 0
    for bid in bin_ids:
        u = ledger.units[bid]
        assert u.state == "clean"
        members = by_id[bid]
        removed.update(e.path for e in members)
        files_in += len(members)
        bytes_in += sum(e.bytes for e in members)
        rows_rewritten += u.rows_written
        bytes_out += u.bytes_written
        added.append(
            DataFile(
                path=u.outputs[0],
                rows=u.rows_written,
                bytes=u.bytes_written,
                partition=u.meta.get("partition", ""),
                stats=u.meta.get("stats", {}),
            )
        )
    snap = table.commit(
        "compact",
        added,
        removed_paths=removed,
        summary={
            "files_in": files_in,
            "files_out": len(added),
            "bytes_in": bytes_in,
            "bytes_out": bytes_out,
            "rows_rewritten": rows_rewritten,
        },
        expected_parent=base_snapshot,
    )
    ledger.delete()
    return CompactResult(
        files_in,
        len(added),
        bytes_in,
        bytes_out,
        rows_rewritten,
        snap.snapshot_id,
        time.monotonic() - t0,
    )


def _stable_id(parts: list[str]) -> str:
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _strip_file_uri(col):
    # input_file_name() -> "file:///abs/path"; manifests use plain paths
    return F.regexp_replace(col, "^file:/*", "/")


def _cleanup_dir(path: str) -> None:
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
