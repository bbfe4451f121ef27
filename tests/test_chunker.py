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
    hybrid = chunker.chunk_hybrid(files, size=50)
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
