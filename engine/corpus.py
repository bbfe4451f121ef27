"""Deterministic synthetic code-corpus generator.

Produces the engine's input table ``(repo, path, commit, lang, content)``
— the shape project-rag indexes (FileInfo,
/root/reference/src/indexer/file_info.rs:7-16) and the shape named by
BASELINE.json's input_hint.  Everything is derived arithmetically from a
``spark.range`` id, entirely with JVM-side ``pyspark.sql.functions`` —
no Python row code, no wall-clock — so any (n_files, seed) pair yields
byte-identical rows at every scale and partitioning.

Design notes for 100 TB scale: generation is embarrassingly parallel
(``spark.range`` splits the id space across executors), content size is
bounded per row, and the skew mode reproduces the "mega-repo" hot-key
pattern (one repo owning 30% of all rows) that the salting/AQE path in
``engine.skew`` must handle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> language, per the reference's detector
# (/root/reference/src/indexer/language.rs:4-54); a representative subset.
EXT_LANG = [
    ("rs", "rust"),
    ("py", "python"),
    ("js", "javascript"),
    ("ts", "typescript"),
    ("go", "go"),
    ("java", "java"),
    ("rb", "ruby"),
    ("md", "markdown"),
    ("toml", "toml"),
    ("json", "json"),
]
DIRS = ["core", "util", "api", "db", "ui"]


def _det(seed: int, *cols: Column) -> Column:
    """Deterministic positive 64-bit mix of seed + columns (xxhash64)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_corpus(
    spark: SparkSession,
    n_files: int,
    n_repos: int = 20,
    seed: int = 42,
    skew: bool = False,
    version_col: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Corpus of ``n_files`` unique (repo, path) rows.

    ``skew=True`` puts 30% of all files in repo_0000 (Zipf-ish hot key).
    ``version_col=True`` keeps the integer ``version`` column (used by
    delta generation); content+commit are version-dependent so bumping
    version models a file edit.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    df = spark.range(0, n_files, numPartitions=partitions)

    if skew:
        # ids [0, 0.3n) -> repo_0000; rest spread uniformly over repos 1..n_repos-1
        cut = int(n_files * 0.3)
        repo_idx = F.when(F.col("id") < cut, F.lit(0)).otherwise(
            (_det(seed, F.col("id")) % (n_repos - 1)) + 1
        )
    else:
        repo_idx = _det(seed, F.col("id")) % n_repos
    df = df.withColumn("repo", F.format_string("repo_%04d", repo_idx))

    # path: unique per id within repo — include the id so (repo, path) is a key
    h = _det(seed + 1, F.col("id"))
    ext_idx = (h % len(EXT_LANG)).cast("int")
    dir_idx = ((h / len(EXT_LANG)).cast("long") % len(DIRS)).cast("int")
    exts = F.array(*[F.lit(e) for e, _ in EXT_LANG])
    langs = F.array(*[F.lit(l) for _, l in EXT_LANG])
    dirs_arr = F.array(*[F.lit(d) for d in DIRS])
    df = (
        df.withColumn("ext", F.element_at(exts, ext_idx + 1))
        .withColumn("lang", F.element_at(langs, ext_idx + 1))
        .withColumn(
            "path",
            F.format_string(
                "src/%s/%s_%d.%s",
                F.element_at(dirs_arr, dir_idx + 1),
                F.lit("mod"),
                F.col("id"),
                F.col("ext"),
            ),
        )
    )

    df = df.withColumn("version", F.lit(1))
    df = with_content(df, seed)
    cols = ["repo", "path", "commit", "lang", "content"]
    if version_col:
        cols.append("version")
    return df.select(*cols)


def with_content(df: DataFrame, seed: int = 42) -> DataFrame:
    """Derive ``content`` (20-200 pseudo-code lines) and ``commit``
    (40-hex, content-addressed) from (repo, path, version).

    commit identity = content identity, mirroring the reference's
    SHA-256-of-content change predicate
    (/root/reference/src/indexer/file_walker/mod.rs:225-229) and commit
    hashing (/root/reference/src/git/walker.rs:8-25).
    """
    n_lines = (_det(seed + 2, F.col("repo"), F.col("path")) % 181 + 20).cast("int")
    content = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_lines),
            lambda k: F.format_string(
                "fn f_%d() { /* %s/%s v%d line %d */ }",
                k,
                F.col("repo"),
                F.col("path"),
                F.col("version"),
                k,
            ),
        ),
        "\n",
    )
    df = df.withColumn("content", content)
    return df.withColumn("commit", F.substring(F.sha2(F.col("content"), 256), 1, 40))


def bump_versions(df: DataFrame, seed: int = 42) -> DataFrame:
    """Return df with version+1 and regenerated content+commit (a 'file edit')."""
    out = df.withColumn("version", F.col("version") + 1)
    return with_content(out.drop("content", "commit"), seed)


def corpus_digest(df: DataFrame) -> str:
    """Order-insensitive content digest of a corpus DataFrame.

    Per-row invariant from BASELINE.json: sha2(content, 256) — xor-free
    commutative sum of row hashes, so any maintenance op that preserves
    row content preserves the digest.  Computed entirely JVM-side; the
    driver-side finalization is sha256 over the canonical (n, sum, xor)
    string so digests compare across processes and runs (Python hash()
    of a str is PYTHONHASHSEED-salted per process — ADVICE round 1).
    """
    import hashlib

    row_hash = F.xxhash64(
        F.col("repo"), F.col("path"), F.col("commit"), F.sha2(F.col("content"), 256)
    )
    r = df.select(
        F.count("*").alias("n"),
        F.sum(row_hash.cast("decimal(38,0)")).alias("s"),
        F.bit_xor(row_hash).alias("x"),
    ).collect()[0]
    canon = f"{r['n']}|{r['s']}|{r['x']}"
    return hashlib.sha256(canon.encode()).hexdigest()
