"""Chunking strategies: fixed-lines, sliding-window, AST (gated +
structural approximation), hybrid.

Mirrors the reference's chunker family
(/root/reference/src/indexer/chunker.rs):

- C1 fixed-lines (chunker.rs:56-95): ceil(n/size) groups of ``size``
  lines, 1-based start/end, whitespace-only chunks dropped (P11).
- C2 sliding-window (chunker.rs:98-156): window ``size``, step =
  size - overlap (>= 1), trailing partial window kept.
- C3 AST (chunker.rs:159-233; per-language node-kind tables
  ast_parser.rs:74-183): tree-sitter is NOT installable in this
  environment (no pip), so behind the same gate a *structural
  approximation* runs as a real mapInPandas UDTF: top-level
  declaration anchors (the per-language keyword table below — the
  node-kind table's analog) partition each file into declaration-to-
  declaration blocks, brace-depth-aware for brace languages and
  column-0-anchored for indent languages.  A language with no table
  entry (or a file with no anchors) yields zero chunks — exactly the
  reference's parse-failure contract — and Hybrid falls back per-file.
  ``approximate=False`` restores the strict gate (empty without
  tree_sitter).
- C4 hybrid (chunker.rs:28-31, 43-52): AST first, fall back to
  FixedLines(50) when AST yields zero chunks for that file.

Chunk identity = ``path:start_line``
(/root/reference/src/vector_db/lance_client/mod.rs:183-187).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional dependency — absent in this environment
    import tree_sitter  # type: ignore  # noqa: F401

    HAS_TREE_SITTER = True
except ImportError:
    HAS_TREE_SITTER = False

# per-language declaration-anchor table — the structural analog of the
# reference's tree-sitter node-kind sets (ast_parser.rs:74-183): the
# keyword starting a top-level declaration -> the node kind it yields.
AST_KINDS: dict[str, dict[str, str]] = {
    "rust": {
        "fn": "function_item", "struct": "struct_item", "enum": "enum_item",
        "impl": "impl_item", "trait": "trait_item", "mod": "mod_item",
    },
    "python": {"def": "function_definition", "class": "class_definition"},
    "javascript": {
        "function": "function_declaration", "class": "class_declaration",
    },
    "typescript": {
        "function": "function_declaration", "class": "class_declaration",
        "interface": "interface_declaration",
    },
    "go": {"func": "function_declaration", "type": "type_declaration"},
    "java": {"class": "class_declaration", "interface": "interface_declaration"},
}
INDENT_LANGS = {"python"}

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


def _empty_chunks(df: DataFrame) -> DataFrame:
    return _finish(
        df.select(
            "repo", "path", "lang",
            F.sha2("content", 256).alias("file_sha"),
            F.lit(None).cast("int").alias("start_line"),
            F.lit(None).cast("int").alias("end_line"),
            F.lit("").alias("content"),
        ).filter(F.lit(False))
    )


def _block_spans(lines: list[str], lang: str) -> list[tuple[int, int, str]]:
    """Top-level declaration spans of one file: (start0, end0, kind).

    Brace languages: an anchor is a keyword-led line at brace depth 0;
    its block runs to the line before the next depth-0 anchor.  Indent
    languages: anchors are column-0 keyword lines.  Depth is computed
    vectorized (per-line brace counts + cumsum); only the anchor scan
    is a per-LINE (never per-char) pass."""
    kinds = AST_KINDS.get(lang)
    if not kinds or not lines:
        return []
    arr = np.array(lines, dtype=object)
    if lang in INDENT_LANGS:
        at_top = np.array([not l[:1].isspace() for l in lines])
    else:
        opens = np.array([l.count("{") for l in lines])
        closes = np.array([l.count("}") for l in lines])
        depth_before = np.concatenate([[0], np.cumsum(opens - closes)[:-1]])
        at_top = depth_before == 0
    anchors: list[tuple[int, str]] = []
    for i in np.nonzero(at_top)[0]:
        first = arr[i].lstrip()
        word = first.split(" ", 1)[0].split("(", 1)[0] if first else ""
        # 'pub fn', 'export function', 'public class' prefixes
        if word in ("pub", "export", "public", "async"):
            rest = first[len(word) :].lstrip()
            word = rest.split(" ", 1)[0].split("(", 1)[0] if rest else ""
        if word in kinds:
            anchors.append((int(i), kinds[word]))
    if not anchors:
        return []
    spans = []
    for j, (start, kind) in enumerate(anchors):
        end = anchors[j + 1][0] - 1 if j + 1 < len(anchors) else len(lines) - 1
        spans.append((start, end, kind))
    return spans


def chunk_ast(
    df: DataFrame, approximate: bool = True, use_tree_sitter: bool | None = None
) -> DataFrame:
    """C3: AST node chunks.

    tree_sitter is not installable in this environment (no network —
    install attempt recorded in COVERAGE.md), so the structural
    approximation IS the production path here.  ``use_tree_sitter``
    makes the fidelity choice EXPLICIT (ADVICE r3: silently approximating
    when the real library is importable hides a divergence from the
    reference's real-grammar chunking): None (default) warns loudly when
    tree_sitter IS importable and then approximates; True raises
    NotImplementedError at the plug point (real-grammar wiring is the
    documented TODO, never a silent fallback); False approximates
    quietly.  ``approximate=False`` -> empty chunk set (the reference's
    strict parse-failure contract).  The approximation is a mapInPandas
    UDTF (one file row -> many chunk rows) anchored on the per-language
    declaration table AST_KINDS
    (/root/reference/src/indexer/ast_parser.rs:74-183 is the node-kind
    table the anchors re-express)."""
    if use_tree_sitter:
        raise NotImplementedError(
            "real tree_sitter grammar chunking is the plug point "
            "(ast_parser.rs:74-183); only the structural approximation "
            "is wired in this environment"
        )
    if HAS_TREE_SITTER and use_tree_sitter is None:
        import logging

        logging.getLogger(__name__).warning(
            "tree_sitter IS importable but chunk_ast is using the "
            "structural approximation — chunks will diverge from "
            "real-grammar AST chunking (ast_parser.rs:74-183); pass "
            "use_tree_sitter=False to silence or True to fail fast"
        )
    if not approximate:
        return _empty_chunks(df)

    schema = (
        "repo string, path string, lang string, file_sha string, "
        "start_line int, end_line int, node_kind string, content string"
    )

    def kernel(batches):
        import hashlib

        for pdf in batches:
            out = {k: [] for k in (
                "repo", "path", "lang", "file_sha",
                "start_line", "end_line", "node_kind", "content",
            )}
            for repo, path, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["lang"], pdf["content"]
            ):
                lines = (content or "").split("\n")
                spans = _block_spans(lines, lang)
                if not spans:
                    continue
                sha = hashlib.sha256((content or "").encode()).hexdigest()
                for s, e, kind in spans:
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["lang"].append(lang)
                    out["file_sha"].append(sha)
                    out["start_line"].append(s + 1)
                    out["end_line"].append(e + 1)
                    out["node_kind"].append(kind)
                    out["content"].append("\n".join(lines[s : e + 1]))
            yield pd.DataFrame(out)

    chunks = df.select("repo", "path", "lang", "content").mapInPandas(
        kernel, schema
    )
    return _finish(chunks.drop("node_kind"))


def chunk_hybrid(df: DataFrame, size: int = 50, approximate: bool = True) -> DataFrame:
    """C4: AST-first, per-file fallback to fixed-lines when AST yields
    zero chunks for that file (chunker.rs:43-52)."""
    ast = chunk_ast(df, approximate=approximate)
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
