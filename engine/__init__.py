"""PySpark-native lakehouse table-maintenance engine.

A brand-new engine (not a port) re-expressing, on idiomatic Spark, the
table-maintenance semantics behind project-rag's incremental indexer
(reference: /root/reference, a Rust MCP code-search server):

- Iceberg-style table format: snapshot log + JSON manifests + parquet
  data files, per-file min/max column stats, time travel
  (``engine.tablefmt``).
- MERGE INTO upserts mirroring the reference's incremental re-index
  3-way diff (src/client/indexing/mod.rs:486-519) with commit anti-join
  dedup (src/git/walker.rs:102-105) — ``engine.ops.merge``.
- Bin-packing small-file compaction (fixes the reference's
  fragment-per-append pattern, src/vector_db/lance_client/mod.rs:308-371)
  — ``engine.ops.compact``.
- Z-order / Hilbert clustering over (repo, path) via vectorized Arrow
  UDFs — ``engine.ops.cluster``.
- Manifest rewrite, snapshot expiration + orphan sweep
  (``engine.ops.manifest``, ``engine.ops.expire``).
- Per-partition checkpoint ledger with the reference's
  mark-dirty-before-write / clear-on-success / 3-outcome validation
  protocol (src/client/indexing/mod.rs:848-947, 1087-1165)
  — ``engine.checkpoint``.
"""

__version__ = "0.1.0"
