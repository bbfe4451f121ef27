"""Chunking strategies: fixed-lines, sliding-window, AST (gated), hybrid.

Mirrors the reference's chunker family
(/root/reference/src/indexer/chunker.rs):

- C1 fixed-lines (chunker.rs:56-95): ceil(n/size) groups of ``size``
  lines, 1-based start/end, whitespace-only chunks dropped (P11).
- C2 sliding-window (chunker.rs:98-156): window ``size``, step =
  size - overlap (>= 1), trailing partial window kept.
- C3 AST (chunker.rs:159-233): tree-sitter node extraction — gated on
  the optional ``tree_sitter`` package (absent here); yields nothing
  when unavailable, exactly the reference's parse-failure behavior.
- C4 hybrid (chunker.rs:28-31, 43-52): AST first, fall back to
  FixedLines(50) when AST yields zero chunks.

Everything is expressed as DataFrame transforms over built-in functions
(posexplode/sequence/slice); the AST path alone would use mapInPandas.
Chunk identity = ``path:start_line``
(/root/reference/src/vector_db/lance_client/mod.rs:183-187).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional dependency — absent in this environment
    import tree_sitter  # type: ignore  # noqa: F401

    HAS_TREE_SITTER = True
except ImportError:
    HAS_TREE_SITTER = False

CHUNK_COLS = ["repo", "path", "chunk_id", "start_line", "end_line", "lang", "file_sha", "content"]


def _finish(chunks: DataFrame) -> DataFrame:
    """Attach chunk identity + drop whitespace-only chunks (P11,
    chunker.rs:74-77)."""
    return (
        chunks.withColumn(
            "chunk_id", F.concat_ws(":", F.col("path"), F.col("start_line"))
        )
        .filter(F.trim(F.col("content")) != "")
        .select(*CHUNK_COLS)
    )


def chunk_fixed_lines(df: DataFrame, size: int = 50) -> DataFrame:
    """C1: 50-line groups, start_line = idx*size + 1 (1-based)."""
    lines = df.select(
        "repo",
        "path",
        "lang",
        F.sha2("content", 256).alias("file_sha"),
        F.posexplode(F.split("content", "\n")).alias("pos0", "line"),
    )
    grouped = (
        lines.groupBy(
            "repo", "path", "lang", "file_sha",
            F.floor(F.col("pos0") / size).alias("grp"),
        )
        .agg(
            (F.min("pos0") + 1).cast("int").alias("start_line"),
            (F.max("pos0") + 1).cast("int").alias("end_line"),
            F.array_join(
                F.array_sort(F.collect_list(F.struct("pos0", "line"))).line, "\n"
            ).alias("content"),
        )
    )
    return _finish(grouped)


def chunk_sliding_window(df: DataFrame, size: int = 30, overlap: int = 10) -> DataFrame:
    """C2: step = max(size - overlap, 1); last partial window kept."""
    step = max(size - overlap, 1)
    with_lines = df.select(
        "repo",
        "path",
        "lang",
        F.sha2("content", 256).alias("file_sha"),
        F.split("content", "\n").alias("lines"),
    ).withColumn("n", F.size("lines"))
    starts = with_lines.select(
        "repo", "path", "lang", "file_sha", "lines", "n",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n") - size, F.lit(0)) + step - 1,
                F.lit(step),
            )
        ).alias("start0"),
    ).filter(F.col("start0") < F.col("n"))
    windows = starts.select(
        "repo", "path", "lang", "file_sha",
        (F.col("start0") + 1).cast("int").alias("start_line"),
        F.least(F.col("start0") + size, F.col("n")).cast("int").alias("end_line"),
        F.array_join(
            F.slice(
                "lines",
                F.col("start0") + 1,
                F.least(F.lit(size), F.col("n") - F.col("start0")),
            ),
            "\n",
        ).alias("content"),
    )
    return _finish(windows)


def chunk_ast(df: DataFrame) -> DataFrame:
    """C3: tree-sitter node chunks.  Without the package, returns an
    empty chunk set (the reference's parse-failure contract) so Hybrid
    falls back cleanly."""
    if not HAS_TREE_SITTER:
        return _finish(
            df.select(
                "repo", "path", "lang",
                F.sha2("content", 256).alias("file_sha"),
                F.lit(None).cast("int").alias("start_line"),
                F.lit(None).cast("int").alias("end_line"),
                F.lit("").alias("content"),
            ).filter(F.lit(False))
        )
    raise NotImplementedError(
        "tree_sitter present but grammar wiring not implemented; "
        "plug per-language node-kind table here "
        "(/root/reference/src/indexer/ast_parser.rs:74-183)"
    )


def chunk_hybrid(df: DataFrame, size: int = 50) -> DataFrame:
    """C4: AST-first, per-file fallback to fixed-lines when AST yields
    zero chunks for that file (chunker.rs:43-52)."""
    ast = chunk_ast(df)
    covered = ast.select("repo", "path").distinct()
    fallback = chunk_fixed_lines(
        df.join(covered, ["repo", "path"], "left_anti"), size
    )
    return ast.unionByName(fallback)


def reassemble(chunks: DataFrame) -> DataFrame:
    """Inverse of chunk_fixed_lines: original (repo, path, content) —
    the round-trip invariant used by tests."""
    return (
        chunks.groupBy("repo", "path")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("start_line", "content"))).content,
                "\n",
            ).alias("content")
        )
    )
