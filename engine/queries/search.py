"""Search-side operators: real BM25, glob-v2 path filtering, the full
language table, the 7-level reference-kind ladder, symbol extraction.

Round-2 additions closing VERDICT.md's "What's missing" list:

1. bm25_topk — actual BM25 relevance (tf, df, idf aggregations;
   k1=1.2, b=0.75 — Tantivy's defaults), the reference's most-used read
   operator after vector search (/root/reference/src/bm25_search/
   mod.rs:183-217, writer/schema :34-39,115-180).  Four aggregations in
   Spark, fully oracle-able.
2. filter_glob_v2 — glob→regex translation + suffix-match semantics +
   invalid-glob substring fallback via engine.glob
   (/root/reference/src/glob_utils.rs:17-65).
3. lang_detect_full — all 45 extensions of the reference's detector
   (/root/reference/src/indexer/language.rs:4-54) as one JVM-side map
   lookup (no join, no UDF).
4. ref_kind_full — the full 7-level priority classifier import >
   instantiation > inheritance > call > write > type-ref > read
   (/root/reference/src/relations/repomap/reference_finder.rs:99-157).
5. symbol_extraction — definition-site derivation from content
   (/root/reference/src/relations/repomap/symbol_extractor.rs): regex
   definition patterns -> (symbol, kind) rows via explode.

Scale notes: BM25 computes per-term tf as projected columns in the one
pass over content (regexp runs once per term per doc, inside codegen),
then shuffles only (doc_id, term, tf) short rows; df and corpus stats
are metadata-sized broadcasts.  Glob/lang/kind are pure projections.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..glob import glob_filter_expr, oracle_regex
from .catalog import q, t, t_wide

# =========================================================================
# 1. BM25 (k1=1.2, b=0.75 — Tantivy/Lucene defaults)
# =========================================================================

BM25_TERMS = ["data", "join", "window"]
K1, B = 1.2, 0.75

# Lucene/Tantivy idf: ln(1 + (N - df + 0.5) / (df + 0.5))
_BM25_SQL = f"""
    WITH docs AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl, lower(text) AS lt
      FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs
    ), long AS (
      SELECT doc_id, dl, term,
             len(regexp_extract_all(lt, '\\b' || term || '\\b')) AS tf
      FROM docs, (SELECT unnest(['{"','".join(BM25_TERMS)}']) AS term)
    ), dfreq AS (
      SELECT term, count(*) AS dfn FROM long WHERE tf > 0 GROUP BY term
    ), scored AS (
      SELECT l.doc_id,
             sum(CAST(CASE WHEN l.tf > 0 THEN
                   ln(1 + (s.n_docs - d.dfn + 0.5) / (d.dfn + 0.5))
                   * (l.tf * ({K1} + 1))
                   / (l.tf + {K1} * (1 - {B} + {B} * l.dl / s.avgdl))
                 ELSE 0.0 END AS DECIMAL(28,12))) AS s
      FROM long l LEFT JOIN dfreq d USING (term), stats s
      GROUP BY l.doc_id
    )
    SELECT doc_id, CAST(round(s, 6) AS DOUBLE) AS score FROM scored
    WHERE s > 0 ORDER BY score DESC, doc_id LIMIT 25
"""


@q("bm25_topk", _BM25_SQL)
def bm25_topk(spark, sf_dir):
    """Real BM25 top-k over `documents` for a 3-term query.

    Plan shape: one content scan computing all per-term tfs as projected
    columns (word-boundary regexp, codegen'd), explode to (doc_id, term,
    tf) short rows, df as a |terms|-row broadcast, corpus stats as a
    1-row broadcast, partial+final sum per doc.  Per-term contributions
    are cast to DECIMAL(28,12) before summing so the sum is exact and
    order-insensitive (cross-engine float determinism)."""
    d = t_wide(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.lower(F.col("text")).alias("lt"),
    )
    tf_structs = F.array(
        *[
            F.struct(
                F.lit(term).alias("term"),
                F.size(
                    F.regexp_extract_all("lt", F.lit(rf"\b{term}\b"), F.lit(0))
                ).alias("tf"),
            )
            for term in BM25_TERMS
        ]
    )
    long = docs.select("doc_id", "dl", F.explode(tf_structs).alias("x")).select(
        "doc_id", "dl", F.col("x.term").alias("term"), F.col("x.tf").alias("tf")
    )
    stats = docs.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfreq = long.filter(F.col("tf") > 0).groupBy("term").agg(
        F.count("*").alias("dfn")
    )
    j = long.join(F.broadcast(dfreq), "term", "left").crossJoin(F.broadcast(stats))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("dfn") + 0.5) / (F.col("dfn") + 0.5)
    )
    tfn = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.when(F.col("tf") > 0, idf * tfn).otherwise(F.lit(0.0))
    scored = j.groupBy("doc_id").agg(
        F.sum(contrib.cast("decimal(28,12)")).alias("s")
    )
    return (
        scored.filter(F.col("s") > 0)
        .select("doc_id", F.round("s", 6).cast("double").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(25)
    )


# =========================================================================
# 2. Glob v2 (translation + suffix semantics + fallback)
# =========================================================================

GLOB_PATTERNS = ["src1*/en/**", "*.md", "src2/de/f_4?.rs"]

_PATH_SQL = (
    "source || '/' || lang || '/f_' || CAST(doc_id AS VARCHAR) || '.' || "
    "CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'rs' WHEN 1 THEN 'py' "
    "WHEN 2 THEN 'md' ELSE 'ts' END"
)
_GLOB_CONDS = " OR ".join(
    f"regexp_matches(path, '{oracle_regex(p)}')" for p in GLOB_PATTERNS
)

_GLOB_SQL = f"""
    WITH paths AS (SELECT doc_id, {_PATH_SQL} AS path FROM documents)
    SELECT doc_id, path FROM paths WHERE {_GLOB_CONDS} ORDER BY doc_id
"""


@q("filter_glob_v2", _GLOB_SQL)
def filter_glob_v2(spark, sf_dir):
    """P7 done right: multi-pattern glob filter with globset semantics —
    `src1*/en/**` (wildcard + component recursion, exercised via the
    suffix trick), `*.md` (matches the last component of any path),
    `src2/de/f_4?.rs` (single-char wildcard).  One rlike per pattern,
    OR-composed, entirely JVM-side; the translator itself is
    property-tested against fnmatch in tests/test_glob.py."""
    d = t(spark, sf_dir, "documents")
    ext = F.element_at(
        F.array(F.lit("rs"), F.lit("py"), F.lit("md"), F.lit("ts")),
        (F.col("doc_id") % 4).cast("int") + 1,
    )
    path = F.concat(
        F.col("source"), F.lit("/"), F.col("lang"), F.lit("/f_"),
        F.col("doc_id").cast("string"), F.lit("."), ext,
    )
    paths = d.select("doc_id", path.alias("path"))
    return paths.filter(glob_filter_expr(F.col("path"), GLOB_PATTERNS)).orderBy(
        "doc_id"
    )


# =========================================================================
# 3. Full language table (45 extensions, language.rs:4-54)
# =========================================================================

EXT_LANG_FULL = {
    "rs": "Rust", "py": "Python",
    "js": "JavaScript", "mjs": "JavaScript", "cjs": "JavaScript",
    "ts": "TypeScript", "jsx": "JavaScript (JSX)", "tsx": "TypeScript (TSX)",
    "java": "Java", "cpp": "C++", "cc": "C++", "cxx": "C++", "c": "C",
    "h": "C/C++ Header", "hpp": "C/C++ Header", "go": "Go", "rb": "Ruby",
    "php": "PHP", "swift": "Swift", "kt": "Kotlin", "kts": "Kotlin",
    "scala": "Scala", "sh": "Shell", "bash": "Shell", "sql": "SQL",
    "html": "HTML", "htm": "HTML", "css": "CSS", "scss": "SCSS",
    "sass": "SCSS", "json": "JSON", "yaml": "YAML", "yml": "YAML",
    "toml": "TOML", "xml": "XML", "ini": "INI", "conf": "Config",
    "config": "Config", "cfg": "Config", "properties": "Properties",
    "env": "Environment", "md": "Markdown", "markdown": "Markdown",
    "rst": "reStructuredText", "adoc": "AsciiDoc", "asciidoc": "AsciiDoc",
    "org": "Org Mode", "txt": "Text", "log": "Log", "pdf": "PDF",
}

# mixed-case probe extensions cycled by doc_id: every mapped extension
# (case-insensitivity exercised by upper-casing every 3rd) + unknowns
_EXT_CYCLE = []
for _i, _e in enumerate(sorted(EXT_LANG_FULL)):
    _EXT_CYCLE.append(_e.upper() if _i % 3 == 0 else _e)
_EXT_CYCLE += ["xyz", "bin", "o"]  # unknown -> None in the reference

_LANG_CASE = " ".join(
    f"WHEN '{e}' THEN '{l}'" for e, l in sorted(EXT_LANG_FULL.items())
)
_EXT_CASE_SQL = "CASE CAST(doc_id % {n} AS INTEGER) {arms} END".format(
    n=len(_EXT_CYCLE),
    arms=" ".join(f"WHEN {i} THEN '{e}'" for i, e in enumerate(_EXT_CYCLE[:-1]))
    + f" ELSE '{_EXT_CYCLE[-1]}'",
)

_LANG_FULL_SQL = f"""
    SELECT doc_id, ext,
           CASE lower(ext) {_LANG_CASE} ELSE 'unknown' END AS language
    FROM (SELECT doc_id, {_EXT_CASE_SQL} AS ext FROM documents)
    ORDER BY doc_id
"""


@q("lang_detect_full", _LANG_FULL_SQL)
def lang_detect_full(spark, sf_dir):
    """S8 complete: the reference's full 45-extension table (language.rs
    :4-54), case-insensitive, unknown -> 'unknown' (the Option::None
    analog).  A literal JVM map lookup — one projection, no join, no
    UDF; at scale the mapping rides in the plan, not in a shuffle."""
    d = t(spark, sf_dir, "documents")
    ext = F.element_at(
        F.array(*[F.lit(e) for e in _EXT_CYCLE]),
        (F.col("doc_id") % len(_EXT_CYCLE)).cast("int") + 1,
    )
    mapping = F.create_map(
        *[F.lit(x) for e, l in sorted(EXT_LANG_FULL.items()) for x in (e, l)]
    )
    return (
        d.select("doc_id", ext.alias("ext"))
        .withColumn(
            "language",
            F.coalesce(
                F.element_at(mapping, F.lower(F.col("ext"))), F.lit("unknown")
            ),
        )
        .orderBy("doc_id")
    )


# =========================================================================
# 4. 7-level reference-kind ladder (reference_finder.rs:99-157)
# =========================================================================

# crafted lines covering each kind plus priority conflicts (the marker
# of a lower rung co-occurring with a higher one); identifier = 'foo'
REF_LINES = [
    "import foo from bar",        # import
    "use crate::foo;",            # import ('use ' beats type-ref ':')
    "let x = require(foo)",       # import (require( beats write/call)
    "obj = new foo()",            # instantiation ('new ' beats call)
    "class A extends foo {",      # inheritance
    "foo(1, 2)",                  # call
    "foo = 42",                   # write
    "foo == 42",                  # read (== is not assignment)
    "foo => bar",                 # read (arrow is not assignment)
    "fn f(x: foo)",               # type_ref (':' before)
    "a -> foo",                   # type_ref
    "Vec<foo>",                   # type_ref
    "let y: T = foo + 1",         # type_ref (':' before; '=' not after name)
    "return foo;",                # read
]

_LINE_CASE_SQL = "CASE CAST(doc_id % {n} AS INTEGER) {arms} END".format(
    n=len(REF_LINES),
    arms=" ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(REF_LINES[:-1]))
    + f" ELSE '{REF_LINES[-1]}'",
)

_REF_KIND_SQL = f"""
    WITH lines AS (
      SELECT doc_id, {_LINE_CASE_SQL} AS line FROM documents
    ), parts AS (
      SELECT doc_id, line,
             substr(line, 1, strpos(line, 'foo') - 1) AS before,
             ltrim(substr(line, strpos(line, 'foo') + 3)) AS after
      FROM lines
    )
    SELECT doc_id, line,
           CASE
             WHEN lower(line) LIKE '%import %' OR lower(line) LIKE '%from %'
                  OR lower(line) LIKE '%require(%' OR lower(line) LIKE '%use %'
               THEN 'import'
             WHEN before LIKE '%new %' THEN 'instantiation'
             WHEN before LIKE '%extends%' OR before LIKE '%implements%'
               THEN 'inheritance'
             WHEN after LIKE '(%' THEN 'call'
             WHEN after LIKE '=%' AND after NOT LIKE '==%'
                  AND after NOT LIKE '=>%' THEN 'write'
             WHEN before LIKE '%:%' OR before LIKE '%->%' OR before LIKE '%<%'
               THEN 'type_ref'
             ELSE 'read'
           END AS kind
    FROM parts ORDER BY doc_id
"""


@q("ref_kind_full", _REF_KIND_SQL)
def ref_kind_full(spark, sf_dir):
    """F11 complete: the reference's determine_reference_kind priority
    ladder — import > instantiation > inheritance > call > write >
    type-ref > read — including its position semantics (text BEFORE the
    identifier for new/extends/type markers, text AFTER it for call/
    assignment, == and => excluded from write).  Pure string expressions
    in one codegen'd projection."""
    d = t(spark, sf_dir, "documents")
    line = F.element_at(
        F.array(*[F.lit(s) for s in REF_LINES]),
        (F.col("doc_id") % len(REF_LINES)).cast("int") + 1,
    )
    rows = d.select("doc_id", line.alias("line"))
    before = F.expr("substr(line, 1, instr(line, 'foo') - 1)")
    after = F.ltrim(F.expr("substr(line, instr(line, 'foo') + 3)"))
    parts = rows.select(
        "doc_id", "line", before.alias("before"), after.alias("after")
    )
    low = F.lower(F.col("line"))
    kind = (
        F.when(
            low.contains("import ")
            | low.contains("from ")
            | low.contains("require(")
            | low.contains("use "),
            "import",
        )
        .when(F.col("before").contains("new "), "instantiation")
        .when(
            F.col("before").contains("extends")
            | F.col("before").contains("implements"),
            "inheritance",
        )
        .when(F.col("after").startswith("("), "call")
        .when(
            F.col("after").startswith("=")
            & ~F.col("after").startswith("==")
            & ~F.col("after").startswith("=>"),
            "write",
        )
        .when(
            F.col("before").contains(":")
            | F.col("before").contains("->")
            | F.col("before").contains("<"),
            "type_ref",
        )
        .otherwise("read")
    )
    return parts.select("doc_id", "line", kind.alias("kind")).orderBy("doc_id")


# =========================================================================
# 5. Symbol extraction (symbol_extractor.rs — definition derivation)
# =========================================================================

_SNIPPET_SQL = """
    CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN 'fn alpha_' || CAST(doc_id AS VARCHAR)
                  || '() {} struct Beta_' || CAST(doc_id AS VARCHAR) || ' {}'
      WHEN 1 THEN 'def gamma_' || CAST(doc_id AS VARCHAR)
                  || '(x): class Delta_' || CAST(doc_id AS VARCHAR) || ':'
      ELSE 'function eps_' || CAST(doc_id AS VARCHAR)
           || '() {} const zeta_' || CAST(doc_id AS VARCHAR) || ' = 1'
    END
"""

_SYMBOL_SQL = f"""
    WITH code AS (SELECT doc_id, {_SNIPPET_SQL} AS content FROM documents),
    fns AS (
      SELECT doc_id, unnest(regexp_extract_all(content,
               '(fn|def|function) ([A-Za-z_][A-Za-z0-9_]*)', 2)) AS symbol,
             'function' AS kind
      FROM code
    ), types AS (
      SELECT doc_id, unnest(regexp_extract_all(content,
               '(struct|class) ([A-Za-z_][A-Za-z0-9_]*)', 2)) AS symbol,
             'type' AS kind
      FROM code
    ), consts AS (
      SELECT doc_id, unnest(regexp_extract_all(content,
               'const ([A-Za-z_][A-Za-z0-9_]*)', 1)) AS symbol,
             'const' AS kind
      FROM code
    )
    SELECT doc_id, symbol, kind FROM fns
    UNION ALL SELECT doc_id, symbol, kind FROM types
    UNION ALL SELECT doc_id, symbol, kind FROM consts
    ORDER BY doc_id, kind, symbol
"""


@q("symbol_extraction", _SYMBOL_SQL)
def symbol_extraction(spark, sf_dir):
    """Definition-site extraction: regex definition patterns over
    content -> exploded (symbol, kind) rows — the derivation step that
    feeds the repomap joins J4-J6 (symbol_extractor.rs).  Content here
    is a synthesized snippet (the corpus text is prose); the machinery
    (regexp_extract_all group capture + explode + union) is the real
    operator."""
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    snippet = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("fn alpha_"), did, F.lit("() {} struct Beta_"), did,
                F.lit(" {}"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("def gamma_"), did, F.lit("(x): class Delta_"), did,
                F.lit(":"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("function eps_"), did, F.lit("() {} const zeta_"), did,
                F.lit(" = 1"),
            )
        )
    )
    code = d.select("doc_id", snippet.alias("content"))

    def extract(pat: str, group: int, kind: str):
        return code.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("content", F.lit(pat), F.lit(group))
            ).alias("symbol"),
            F.lit(kind).alias("kind"),
        )

    fns = extract(r"(fn|def|function) ([A-Za-z_][A-Za-z0-9_]*)", 2, "function")
    types = extract(r"(struct|class) ([A-Za-z_][A-Za-z0-9_]*)", 2, "type")
    consts = extract(r"const ([A-Za-z_][A-Za-z0-9_]*)", 1, "const")
    return (
        fns.unionByName(types)
        .unionByName(consts)
        .orderBy("doc_id", "kind", "symbol")
    )


# =========================================================================
# 6. Windowed rollup (batch semantics of streaming.windowed_commit_rollup)
# =========================================================================


@q(
    "windowed_rollup",
    """
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start, event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2 ORDER BY win_start, event_type
    """,
)
def windowed_rollup(spark, sf_dir):
    """Batch ground truth of the streaming event-time rollup
    (engine.streaming.windowed_commit_rollup): epoch-aligned tumbling
    windows — Spark's window() and DuckDB's time_bucket() agree on
    bucket starts, so the streaming operator's output is directly
    oracle-checkable."""
    from pyspark.sql import functions as F

    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
        .orderBy("win_start", "event_type")
    )


# =========================================================================
# 7. Composed hybrid-search lifecycle (SURVEY §3.2 end-to-end)
# =========================================================================

HY_K = 15
HY_OVERFETCH = 3  # ref fetches 3x the requested k before fusion
HY_LIM = HY_K * HY_OVERFETCH
HY_RRF_K = 60
HY_ROOTS = ["src1", "src3", "src5", "src7"]
HY_TERM = "join"

_HYBRID_SQL = f"""
    WITH d AS (
      SELECT * FROM documents WHERE source IN ('src1','src3','src5','src7')
    ), vec AS (
      SELECT doc_id, vector_score,
             row_number() OVER (ORDER BY vector_score DESC, doc_id) AS vrnk
      FROM (SELECT doc_id,
                   1.0 / (1.0 + abs(n_chars - 300) / 100.0) AS vector_score
            FROM d)
      ORDER BY vector_score DESC, doc_id LIMIT {HY_LIM}
    ), docs AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             len(regexp_extract_all(lower(text), '\\b{HY_TERM}\\b')) AS tf
      FROM d
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl,
             sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS dfn FROM docs
    ), kw AS (
      SELECT doc_id, keyword_score,
             row_number() OVER (ORDER BY keyword_score DESC, doc_id) AS krnk
      FROM (SELECT doc_id,
                   ln(1 + (s.n_docs - s.dfn + 0.5) / (s.dfn + 0.5))
                   * (tf * ({K1} + 1))
                   / (tf + {K1} * (1 - {B} + {B} * dl / s.avgdl)) AS keyword_score
            FROM docs, stats s WHERE tf > 0)
      ORDER BY keyword_score DESC, doc_id LIMIT {HY_LIM}
    ), fused AS (
      SELECT coalesce(v.doc_id, k.doc_id) AS doc_id,
             coalesce(v.vector_score, 0.0) AS vector_score,
             coalesce(k.keyword_score, 0.0) AS keyword_score,
             coalesce(1.0 / ({HY_RRF_K} + v.vrnk), 0.0)
               + coalesce(1.0 / ({HY_RRF_K} + k.krnk), 0.0) AS fused
      FROM vec v FULL OUTER JOIN kw k ON v.doc_id = k.doc_id
    ), ladder AS (SELECT unnest([0.8, 0.6, 0.5, 0.4, 0.3]) AS th),
    counts AS (
      SELECT l.th, (SELECT count(*) FROM fused f
                    WHERE f.vector_score >= l.th OR f.keyword_score >= l.th) AS cnt
      FROM ladder l
    ), used AS (SELECT max(th) AS th FROM counts WHERE cnt > 0)
    SELECT f.doc_id, d.lang, d.source,
           round(f.vector_score, 6) AS vector_score,
           round(f.keyword_score, 6) AS keyword_score,
           round(f.fused, 8) AS score,
           round((SELECT th FROM used), 2) AS threshold_used
    FROM fused f JOIN d ON f.doc_id = d.doc_id
    WHERE f.vector_score >= (SELECT th FROM used)
       OR f.keyword_score >= (SELECT th FROM used)
    ORDER BY score DESC, f.doc_id LIMIT {HY_K}
"""


@q("search_hybrid", _HYBRID_SQL)
def search_hybrid(spark, sf_dir):
    """The COMPOSED §3.2 read lifecycle in one operator, mirroring the
    reference's query_codebase chain (/root/reference/src/client/
    mod.rs:500-570 over /root/reference/src/vector_db/lance_client/
    mod.rs:373-702): root filter (pushed to the scan) -> vector-proxy
    top-3k and real-BM25 top-3k legs (the 3x over-fetch at
    lance_client/mod.rs:388) -> RRF fusion (k=60) -> hydration join ->
    either-score min_score filter (mod.rs:524-534) -> adaptive
    threshold ladder (client/mod.rs:516-562) -> final top-k.

    Exercises P2+P4+J2+J3+T1-T3+F14 as a chain.  Scale shape: each leg
    is a distributed TakeOrderedAndProject (per-partition top-45, no
    global window); fusion/hydration operate on <=2*45 rows (broadcast
    joins); the ladder is a driver loop of cheap filters over the tiny
    persisted fused set."""
    d = t_wide(spark, sf_dir, "documents").filter(F.col("source").isin(HY_ROOTS))

    vec_order = [F.desc("vector_score"), F.asc("doc_id")]
    vs = 1.0 / (1.0 + F.abs(F.col("n_chars") - 300) / 100.0)
    vec = (
        d.select("doc_id", vs.alias("vector_score"))
        .orderBy(*vec_order)
        .limit(HY_LIM)
        .withColumn("vrnk", F.row_number().over(W.orderBy(*vec_order)))
    )

    docs = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(rf"\b{HY_TERM}\b"), F.lit(0)
            )
        ).alias("tf"),
    )
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum((F.col("tf") > 0).cast("long")).alias("dfn"),
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("dfn") + 0.5) / (F.col("dfn") + 0.5))
    tfn = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
    )
    kw_order = [F.desc("keyword_score"), F.asc("doc_id")]
    kw = (
        docs.filter(F.col("tf") > 0)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * tfn).alias("keyword_score"))
        .orderBy(*kw_order)
        .limit(HY_LIM)
        .withColumn("krnk", F.row_number().over(W.orderBy(*kw_order)))
    )

    rrf_v = 1.0 / (HY_RRF_K + F.col("vrnk"))
    rrf_k = 1.0 / (HY_RRF_K + F.col("krnk"))
    fused = (
        vec.join(kw, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("vector_score", F.lit(0.0)).alias("vector_score"),
            F.coalesce("keyword_score", F.lit(0.0)).alias("keyword_score"),
            (F.coalesce(rrf_v, F.lit(0.0)) + F.coalesce(rrf_k, F.lit(0.0))).alias(
                "fused"
            ),
        )
        .persist()
    )
    try:
        used = None
        for th in [0.8, 0.6, 0.5, 0.4, 0.3]:
            hit = (
                fused.filter(
                    (F.col("vector_score") >= th) | (F.col("keyword_score") >= th)
                )
                .limit(1)
                .count()
            )
            if hit > 0:
                used = th
                break
        if used is None:
            out = (
                fused.filter(F.lit(False))
                .join(d.select("doc_id", "lang", "source"), "doc_id")
                .select(
                    "doc_id", "lang", "source",
                    F.col("vector_score"), F.col("keyword_score"),
                    F.col("fused").alias("score"),
                    F.lit(None).cast("double").alias("threshold_used"),
                )
            )
            return out.localCheckpoint()
        out = (
            d.select("doc_id", "lang", "source")
            .join(
                F.broadcast(
                    fused.filter(
                        (F.col("vector_score") >= used)
                        | (F.col("keyword_score") >= used)
                    )
                ),
                "doc_id",
            )
            .select(
                "doc_id",
                "lang",
                "source",
                F.round("vector_score", 6).alias("vector_score"),
                F.round("keyword_score", 6).alias("keyword_score"),
                F.round("fused", 8).alias("score"),
                F.round(F.lit(used), 2).alias("threshold_used"),
            )
            .orderBy(F.desc("score"), "doc_id")
            .limit(HY_K)
        )
        return out.localCheckpoint()
    finally:
        fused.unpersist()
