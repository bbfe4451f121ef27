"""Structured-Streaming ingest into the table format.

The reference has no continuous streaming — its incremental model is
micro-batch: an explicit index call diffs state and writes one batch
(SURVEY §2.10; /root/reference/src/client/indexing/mod.rs:1100-1143).
The Spark-native generalization is Structured Streaming with
``Trigger.AvailableNow``: drain whatever corpus deltas are pending as a
sequence of micro-batches, each committed through the same snapshot /
MERGE machinery, then stop.  State (which files are already absorbed)
lives in the table itself via commit-equality — a replayed batch
MERGEs to zero changes (the commit anti-join, J7), giving effective
exactly-once on top of at-least-once delivery.

``ingest_stream`` is the generic sink: any streaming DataFrame of
corpus rows -> foreachBatch -> MERGE INTO.  ``ingest_directory`` wires
it to a parquet-file source (new files under a drop directory are the
"pending deltas", the streaming analog of the reference's file walk).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .ops.merge import MergeResult, merge_into
from .tablefmt import CORPUS_SCHEMA, Table


def ingest_stream(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    output_mode: str = "append",
):
    """Attach a MERGE-INTO sink to a streaming corpus DataFrame.

    Returns the started StreamingQuery.  Each micro-batch is one
    atomic snapshot commit; batch replay after a crash is absorbed by
    commit-equality (MERGE no-op), so the pipeline is idempotent.

    ``output_mode`` must be "update" when the upstream plan contains an
    update-mode stateful operator (e.g. ``stateful_first_seen``) —
    Spark rejects Append-mode sinks over them.
    """
    checkpoint_dir = checkpoint_dir or os.path.join(table.root, "_stream_checkpoint")
    results: list[MergeResult] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        r = merge_into(spark, table, batch_df)
        results.append(r)

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q._merge_results = results  # introspection for tests/metrics
    return q


def ingest_directory(
    spark: SparkSession,
    drop_dir: str,
    table: Table,
    max_files_per_batch: int = 64,
    checkpoint_dir: str | None = None,
):
    """Stream parquet corpus files from a drop directory into the table
    (AvailableNow: drain pending files in rate-limited micro-batches,
    then stop — the reference's 'index whatever changed now' call)."""
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(drop_dir)
    )
    return ingest_stream(stream, table, checkpoint_dir=checkpoint_dir)


def windowed_commit_rollup(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed activity rollup with late-data handling.

    The streaming analog of A6 (per-repo commit counts): tumbling
    event-time windows, closed once the watermark passes — events later
    than ``watermark`` are dropped deterministically instead of
    reopening finalized windows.  Append output mode emits each
    (window, repo) row exactly once, which makes the result a clean
    streaming SINK into the table layer (one immutable rollup row per
    finalized window)."""
    from pyspark.sql import functions as F

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "repo")
        .agg(F.count("*").alias("n_commits"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "repo",
            "n_commits",
        )
    )


def stateful_first_seen(
    stream_df: DataFrame,
    group_col: str = "repo",
    dedup_col: str = "path",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Custom stateful operator: emit only the FIRST occurrence of each
    (group, dedup) key across ALL micro-batches — cross-batch streaming
    dedup via ``applyInPandasWithState``.

    State is partitioned by ``group_col`` (per-repo, matching the
    table's partitioning, so the state shuffle co-locates with the
    data's natural key) and holds the 64-bit hashes of seen values —
    bounded by distinct-keys-per-group, never by stream length.  Within
    a batch the kernel is vectorized (one hash pass + isin mask).  The
    1-in-2^64 hash-collision false-dedup rate is the standard
    streaming-dedup trade (equivalent to dropDuplicates on a digest).

    ``order_cols`` makes "first" DETERMINISTIC instead of
    arrival-order: the kernel sorts each micro-batch's group rows by
    these columns before deduplicating, so when batch boundaries
    respect the same order (an event log replayed in time order — the
    MERGE ingest path's shape), the streamed output is row-identical to
    the batch query ``first occurrence per key ordered by order_cols``
    (window row_number = 1).  That batch twin is the oracle-checked
    ``first_seen_dedup`` driver query; equality is pinned by
    tests/test_streaming.py::test_stateful_first_seen_matches_batch_twin.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = stream_df.schema
    state_schema = "seen array<long>"

    def fn(key, pdf_iter, state):
        seen = set(state.get[0]) if state.exists else set()
        chunks = list(pdf_iter)
        if order_cols and len(chunks) > 1:
            chunks = [pd.concat(chunks, ignore_index=True)]
        for pdf in chunks:
            if order_cols:
                pdf = pdf.sort_values(order_cols, kind="stable",
                                      ignore_index=True)
            h = pd.util.hash_pandas_object(pdf[dedup_col], index=False).astype(
                "int64"
            )
            fresh = (~h.isin(list(seen))) & (~h.duplicated())
            seen.update(int(x) for x in h)
            out = pdf[fresh.to_numpy()]
            if len(out):
                yield out
        state.update((list(seen),))

    return stream_df.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _signature_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("fp", T.ArrayType(T.LongType()), False),
        ]
    )


def reconcile_signature_index(spark, table: Table, sigs_table: Table):
    """Drop signature rows whose document no longer exists in the corpus.

    The ingest sink keeps the index mirroring the corpus for UPDATES,
    but other writers diverge it: row-level DELETE, rollback, and a
    MERGE with ``delete_missing`` all remove corpus rows without
    touching the index — the orphaned signatures would then silently
    veto re-ingestion of similar content forever.  This is the
    maintenance op that restores the mirror: one anti-join of index
    identities against corpus identities, then a keyed COW delete.
    Shape at scale: both sides are narrow single-column projections
    (the corpus side reads three key columns, never content), the join
    is a shuffle on doc_id AQE can plan, and the delete rewrites only
    files containing orphans.  Idempotent; safe to run on a schedule
    alongside compact/expire.
    """
    from pyspark.sql import functions as F

    from .ops.delete import delete_where
    from .tablefmt import ROW_IDENTITY_SQL

    corpus_ids = table.scan(spark).select(
        F.expr(ROW_IDENTITY_SQL).alias("doc_id")
    )
    orphans = (
        sigs_table.scan(spark)
        .select("doc_id")
        .join(corpus_ids, "doc_id", "left_anti")
    )
    return delete_where(spark, sigs_table, keys=orphans, key_expr="doc_id")


def ingest_stream_dedup(
    stream_df: DataFrame,
    table: Table,
    sigs_table: Table,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """MERGE-INTO sink with INLINE NEAR-DUP DEDUP at ingest time.

    Each micro-batch:

    0. last-writer-wins dedup to ONE row per (repo, path), mirroring
       ``merge_into``'s ordering (version/ts column when present, else
       max(commit)) — the sweep must judge only the version the merge
       would keep, or a within-batch near-dup pair of the SAME file
       could greedily drop the newer version;
    1. within-batch MinHash near-dup sweep across DIFFERENT files
       (greedy keep-smallest identity) — a delta often carries its own
       duplicates;
    2. sweep the remainder AGAINST the persistent signature index
       table (``minhash_near_dups_against`` — only the indexed
       signatures participate, the corpus text is never re-read).
       Pairs whose two sides share (repo, path) are EXCLUDED: a new
       version of an already-indexed file is an UPDATE, not a dup of
       its own previous version — without this the corpus could never
       take an edit through this sink;
    3. MERGE the survivors into the corpus table;
    4. reconcile the signature index so it MIRRORS the corpus (one
       signature per (repo, path), the current version): delete index
       rows superseded by an updated survivor, then append survivors'
       signatures anti-joined on doc_id (a replayed batch adds
       nothing).

    Crash ordering is corpus-first: a crash between 3 and 4 leaves
    rows whose signatures are missing from the index until the batch
    replays (replay re-MERGEs to a no-op and completes the signature
    reconcile).  The reverse order would be data loss: signatures
    landing before the corpus rows would make the replayed batch
    near-dup ITSELF out of existence.  Within 4, delete-before-append:
    an unreplayed crash then leaves a missing signature (the file is
    merely re-ingestible) rather than a ghost one (stale content
    silently vetoing future genuine documents).

    ``sigs_table``: an engine table created with ``_signature_schema()``
    (``create_signature_table``).  The signature index participates in
    the normal table lifecycle — compaction bounds its file count,
    expire/sweep reclaims superseded snapshots.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from .dedup import minhash_near_dups, minhash_near_dups_against
    from .dedup import minhash_signatures
    from .ops.delete import delete_where
    from .tablefmt import ROW_IDENTITY_SQL, append as tbl_append

    checkpoint_dir = checkpoint_dir or os.path.join(
        table.root, "_stream_dedup_checkpoint"
    )
    results: list[dict] = []
    SEP = "\x1f"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        n_in = batch_df.count()

        # 0. one row per (repo, path): same winner merge_into would pick
        order_col = next(
            (c for c in ("version", "ts", "ingest_ts")
             if c in batch_df.columns),
            None,
        )
        order = ([F.col(order_col).desc()] if order_col else []) + [
            F.desc("commit")
        ]
        w = W.partitionBy("repo", "path").orderBy(*order)
        batch = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_doc_id", F.expr(ROW_IDENTITY_SQL))
            .persist()
        )
        survivors = new_sigs = None
        try:
            # 1. within-batch sweep (greedy: drop larger-identity sides)
            self_pairs = minhash_near_dups(
                batch, "_doc_id", "content", threshold=threshold
            )
            self_drops = self_pairs.select(
                F.col("doc_b").alias("_doc_id")
            ).distinct()
            remaining = batch.join(self_drops, "_doc_id", "left_anti")

            # 2. against the signature index ((repo, path) self-pairs
            #    excluded: an indexed file's own newer version is an
            #    update, not a duplicate)
            index_sigs = sigs_table.scan(spark)
            x_pairs = minhash_near_dups_against(
                index_sigs, remaining, "_doc_id", "content",
                threshold=threshold,
            ).filter(
                F.substring_index("doc_a", SEP, 2)
                != F.substring_index("doc_b", SEP, 2)
            )
            x_drops = x_pairs.select(
                F.col("doc_b").alias("_doc_id")
            ).distinct()
            survivors = remaining.join(
                x_drops, "_doc_id", "left_anti"
            ).persist()

            # 3. corpus merge (idempotent on replay)
            r = merge_into(spark, table, survivors.drop("_doc_id"))

            # 4a. prune signatures superseded by an update: same
            #     (repo, path) as a survivor, different version
            surv_ids = survivors.select(
                F.col("_doc_id").alias("doc_id"),
                F.substring_index("_doc_id", SEP, 2).alias("_key"),
            )
            stale = (
                index_sigs.withColumn(
                    "_key", F.substring_index("doc_id", SEP, 2)
                )
                .join(surv_ids.select("_key").distinct(), "_key", "semi")
                .join(surv_ids.select("doc_id"), "doc_id", "left_anti")
                .select("doc_id")
            )
            d = delete_where(
                spark, sigs_table, keys=stale, key_expr="doc_id"
            )
            # 4b. append, replay-safe via anti-join on doc_id (scan
            #     re-read: the delete above may have rewritten files)
            new_sigs = (
                minhash_signatures(survivors, "_doc_id", "content")
                .join(
                    sigs_table.scan(spark).select("doc_id"),
                    "doc_id",
                    "left_anti",
                )
                .persist()
            )
            n_new_sigs = new_sigs.count()
            if n_new_sigs:
                tbl_append(spark, sigs_table, new_sigs)
            results.append(
                {
                    "batch_id": batch_id,
                    "rows_in": n_in,
                    "rows_ingested": r.rows_inserted + r.rows_updated,
                    "sigs_added": n_new_sigs,
                    "sigs_removed": d.rows_deleted,
                }
            )
        finally:
            batch.unpersist()
            for df in (survivors, new_sigs):
                if df is not None:
                    df.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q._dedup_results = results  # introspection for tests/metrics
    q._dedup_sink = sink  # replay simulation in tests
    return q


def create_signature_table(root: str) -> Table:
    """Create the signature-index side table for ingest_stream_dedup."""
    return Table.create(root, schema=_signature_schema())
