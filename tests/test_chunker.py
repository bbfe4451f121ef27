"""Chunkers: C1/C2 shape + round-trip, C4 hybrid fallback, P8 guard."""

import pytest
from pyspark.sql import functions as F

from engine import chunker, corpus
from engine.checkpoint import DirtyTableError, Ledger, assert_clean
from engine.tablefmt import Table


@pytest.fixture(scope="module")
def files(spark):
    df = corpus.generate_corpus(spark, n_files=60, n_repos=3, partitions=2)
    df = df.persist()
    df.count()
    return df


def test_fixed_lines_shape(spark, files):
    chunks = chunker.chunk_fixed_lines(files, size=50)
    pdf = chunks.toPandas()
    # 1-based starts at multiples of 50 + 1
    assert set(pdf["start_line"] % 50) == {1}
    assert (pdf["end_line"] >= pdf["start_line"]).all()
    assert (pdf["chunk_id"] == pdf["path"] + ":" + pdf["start_line"].astype(str)).all()
    # ceil(n/50) chunks per file
    n_lines = files.select(
        "path", F.size(F.split("content", "\n")).alias("n")
    ).toPandas().set_index("path")["n"]
    per_file = pdf.groupby("path").size()
    for path, cnt in per_file.items():
        assert cnt == -(-n_lines[path] // 50)


def test_fixed_lines_roundtrip(spark, files):
    chunks = chunker.chunk_fixed_lines(files, size=50)
    rebuilt = chunker.reassemble(chunks)
    diff = (
        files.select("repo", "path", F.sha2("content", 256).alias("sha"))
        .join(
            rebuilt.select("repo", "path", F.sha2("content", 256).alias("sha2_")),
            ["repo", "path"],
        )
        .filter(F.col("sha") != F.col("sha2_"))
        .count()
    )
    assert diff == 0


def test_sliding_window_overlap(spark, files):
    chunks = chunker.chunk_sliding_window(files, size=30, overlap=10)
    pdf = chunks.toPandas()
    # starts advance by step=20; windows at most 30 lines
    assert set((pdf["start_line"] - 1) % 20) == {0}
    assert ((pdf["end_line"] - pdf["start_line"]) < 30).all()
    # every line covered: first window starts at 1, windows overlap by 10
    first = pdf.groupby("path")["start_line"].min()
    assert set(first) == {1}


def test_hybrid_falls_back_without_ast(spark, files):
    assert not chunker.HAS_TREE_SITTER
    # strict gate (approximate=False): AST yields nothing -> pure fixed-lines
    hybrid = chunker.chunk_hybrid(files, size=50, approximate=False)
    fixed = chunker.chunk_fixed_lines(files, size=50)
    assert hybrid.count() == fixed.count()


def test_dirty_guard(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"))
    assert_clean(t.root)  # clean table passes
    led = Ledger.open(t.root, "jobZ")
    led.register("u0")
    led.mark_dirty("u0")
    with pytest.raises(DirtyTableError, match="jobZ"):
        assert_clean(t.root)
    led.mark_clean("u0", [], 0, 0)
    assert_clean(t.root)


def test_ast_approx_block_spans_brace():
    """Brace-language structural spans: depth-0 declaration anchors,
    block = anchor to next-anchor-1, kind from the AST_KINDS table."""
    code = [
        "use x;",
        "pub fn foo() {",
        "  body();",
        "}",
        "",
        "struct Bar {",
        "  a: i32,",
        "}",
    ]
    spans = chunker._block_spans(code, "rust")
    assert spans == [(1, 4, "function_item"), (5, 7, "struct_item")]
    # nested braces don't anchor: fn inside impl is depth > 0
    code2 = ["impl Foo {", "  fn m() {", "  }", "}"]
    assert chunker._block_spans(code2, "rust") == [(0, 3, "impl_item")]
    # unknown language -> no spans (parse-failure contract)
    assert chunker._block_spans(code, "markdown") == []


def test_ast_approx_block_spans_indent():
    code = [
        "import os",
        "def f():",
        "    pass",
        "",
        "class C:",
        "    def m(self):",
        "        pass",
    ]
    spans = chunker._block_spans(code, "python")
    assert spans == [(1, 3, "function_definition"), (4, 6, "class_definition")]


def test_ast_chunker_udtf_and_hybrid(spark, files):
    """C3 is no longer an empty stub: the structural approximation runs
    as a mapInPandas UDTF; languages without a kind table fall back to
    fixed-lines per file inside Hybrid (the reference's contract)."""
    assert not chunker.HAS_TREE_SITTER
    # strict gate: empty without tree_sitter
    assert chunker.chunk_ast(files, approximate=False).count() == 0
    ast = chunker.chunk_ast(files)  # approximate path
    pdf = ast.toPandas()
    assert len(pdf) > 0
    covered_langs = set(pdf["lang"])
    assert covered_langs <= set(chunker.AST_KINDS)
    # corpus content anchors on every 'fn f_k() {...}' line
    assert (pdf["chunk_id"] == pdf["path"] + ":" + pdf["start_line"].astype(str)).all()
    # hybrid: every file is chunked by exactly one strategy
    hybrid = chunker.chunk_hybrid(files, size=50)
    files_total = files.select("repo", "path").distinct().count()
    files_chunked = hybrid.select("repo", "path").distinct().count()
    assert files_chunked == files_total
    # corpus content is 'fn ...' lines for every lang, so only rust files
    # anchor; all others (incl. kind-table langs whose anchors don't
    # appear) fall back PER FILE — the reference's zero-chunk contract
    assert covered_langs == {"rust"}
    fallback_files = hybrid.join(
        ast.select("repo", "path").distinct(), ["repo", "path"], "left_anti"
    )
    assert fallback_files.filter(F.col("lang") == "rust").count() == 0
