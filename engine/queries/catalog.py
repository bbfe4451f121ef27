"""Driver-contract query catalog: Spark impl + DuckDB oracle per operator.

Each entry maps one operator family from SURVEY.md §2 onto the driver's
testdata tables (region nation customer supplier part orders lineitem
events documents embeddings).  The Spark side is the idiomatic
DataFrame plan (built-in functions, broadcast hints for dims, window
functions); the oracle is equivalent ANSI SQL for DuckDB.  Column names
and ordering-insensitive values must match exactly — every computed
column is aliased identically on both sides, floats are rounded to
fixed precision so dual-engine float formatting can't diverge.

Conventions:
- Spark callables take (spark, sf_dir) and return a DataFrame.
- Deterministic output: every query has a total ordering or is a pure
  set (the driver compares order-insensitively, but ranks/limits need
  deterministic tie-breaks — always break ties on a key column).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def t_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan a table, spreading a narrow (few-file) scan across the
    cluster before compute-heavy per-row work (regex extraction, sha256
    per row, md5 per token/shingle, HOF dot products).  At bench scale
    several tables are ONE small parquet file — a single input split
    serializes the whole per-row pipeline on one core (r6 measurement:
    the regex-heavy document queries spent 2-3 s single-threaded at
    sf1).  At 100 TB the scan already has thousands of splits and this
    is a no-op — the repartition only fires when the source is narrower
    than the cluster."""
    df = t(spark, sf_dir, name)
    p = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < p:
        df = df.repartition(p)
    return df


# =========================================================================
# Aggregations (SURVEY §2.5)
# =========================================================================


@q(
    "lang_breakdown",  # A1: groupBy(language).count().orderBy desc
    """
    SELECT lang, count(*) AS cnt FROM documents
    GROUP BY lang ORDER BY cnt DESC, lang
    """,
)
def lang_breakdown(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "lang")
    )


@q(
    "row_counts",  # A2: total + filtered counts in one pass
    """
    SELECT count(*) AS n_rows,
           count(*) FILTER (WHERE n_chars > 200) AS n_large,
           count(DISTINCT source) AS n_sources
    FROM documents
    """,
)
def row_counts(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("n_chars") > 200, 1)).alias("n_large"),
        F.countDistinct("source").alias("n_sources"),
    )


@q(
    "minmax_stats",  # A7: per-group min/max column stats (manifest stats analog)
    """
    SELECT source, min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           count(*) AS cnt
    FROM documents GROUP BY source ORDER BY source
    """,
)
def minmax_stats(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.count("*").alias("cnt"),
        )
        .orderBy("source")
    )


@q(
    "commit_counts",  # A6: per-repo distinct commits -> per-type distinct users
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def commit_counts(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


# =========================================================================
# Projections / filters (SURVEY §2.2)
# =========================================================================


@q(
    "filter_lang",  # P6: languages.contains()
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang IN ('en', 'de') ORDER BY doc_id
    """,
)
def filter_lang(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "de"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@q(
    "filter_suffix",  # P5: file_path.ends_with(ext)
    """
    SELECT doc_id, source FROM documents
    WHERE source LIKE '%3' OR source LIKE '%7' ORDER BY doc_id
    """,
)
def filter_suffix(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source").endswith("3") | F.col("source").endswith("7"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@q(
    "filter_glob",  # P7: glob -> regex rlike
    """
    SELECT doc_id, source, lang FROM documents
    WHERE regexp_matches(source, '^src[0-9]*[02468]$') ORDER BY doc_id
    """,
)
def filter_glob(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").rlike("^src[0-9]*[02468]$"))
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


@q(
    "size_cap",  # S3: skip files over max size
    """
    SELECT count(*) AS kept, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents
    WHERE length(text) <= 300
    """,
)
def size_cap(spark, sf_dir):
    # DuckDB sum(BIGINT) yields HUGEINT (int128); Spark yields BIGINT.
    # Values match but the driver's value-hash is type-sensitive — cast
    # the oracle side (round-1 red row, VERDICT.md "What's wrong" #1).
    return (
        t(spark, sf_dir, "documents")
        .filter(F.length("text") <= 300)
        .agg(F.count("*").alias("kept"), F.sum("n_chars").alias("total_chars"))
    )


@q(
    "date_range_filter",  # P9: commit_time between since/until
    """
    SELECT event_type, count(*) AS cnt FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type ORDER BY event_type
    """,
)
def date_range_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy("event_type")
    )


@q(
    "regex_filter",  # P10: author/file regex
    """
    SELECT doc_id FROM documents
    WHERE regexp_matches(text, 'join.*(window|agg)') ORDER BY doc_id
    """,
)
def regex_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("join.*(window|agg)"))
        .select("doc_id")
        .orderBy("doc_id")
    )


@q(
    "projection_pruning",  # P12: narrow column projection
    """
    SELECT source FROM documents GROUP BY source ORDER BY source
    """,
)
def projection_pruning(spark, sf_dir):
    return t(spark, sf_dir, "documents").select("source").distinct().orderBy("source")


# =========================================================================
# Scalar functions (SURVEY §2.8)
# =========================================================================


@q(
    "sha256_content",  # F1/S7: per-row content hash — THE invariant function
    """
    SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id
    """,
)
def sha256_content(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.sha2(F.col("text"), 256).alias("sha"))
        .orderBy("doc_id")
    )


@q(
    "row_id_synthesis",  # F5: id = file_path:start_line
    """
    SELECT source || ':' || CAST(doc_id AS VARCHAR) AS row_id, n_chars
    FROM documents ORDER BY row_id
    """,
)
def row_id_synthesis(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .select(
            F.concat_ws(":", F.col("source"), F.col("doc_id")).alias("row_id"),
            "n_chars",
        )
        .orderBy("row_id")
    )


@q(
    "partition_salt",  # F2: sha256(root)[..16] — per-root salting key
    """
    SELECT DISTINCT source, substr(sha256(source), 1, 16) AS salt
    FROM documents ORDER BY source
    """,
)
def partition_salt(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .withColumn("salt", F.substring(F.sha2(F.col("source"), 256), 1, 16))
        .orderBy("source")
    )


@q(
    "score_transform",  # F3: score = 1/(1+distance)
    """
    SELECT vec_id, round(1.0 / (1.0 + label), 6) AS score
    FROM embeddings ORDER BY vec_id
    """,
)
def score_transform(spark, sf_dir):
    return (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.col("label")), 6).alias("score"),
        )
        .orderBy("vec_id")
    )


@q(
    "truncation",  # F13: truncate long content + marker
    """
    SELECT doc_id,
           CASE WHEN length(text) > 200
                THEN substr(text, 1, 200) || '...[truncated]'
                ELSE text END AS doc,
           length(text) > 200 AS truncated
    FROM documents ORDER BY doc_id
    """,
)
def truncation(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.when(
                F.length("text") > 200,
                F.concat(F.substring("text", 1, 200), F.lit("...[truncated]")),
            )
            .otherwise(F.col("text"))
            .alias("doc"),
            (F.length("text") > 200).alias("truncated"),
        )
        .orderBy("doc_id")
    )


@q(
    "lang_detect",  # S8: extension -> language mapping (case-insensitive)
    """
    SELECT doc_id,
           CASE lower(CASE CAST(doc_id % 5 AS INTEGER)
                      WHEN 0 THEN 'RS' WHEN 1 THEN 'py' WHEN 2 THEN 'Js'
                      WHEN 3 THEN 'go' ELSE 'md' END)
                WHEN 'rs' THEN 'rust' WHEN 'py' THEN 'python'
                WHEN 'js' THEN 'javascript' WHEN 'go' THEN 'go'
                ELSE 'markdown' END AS language
    FROM documents ORDER BY doc_id
    """,
)
def lang_detect(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ext = F.element_at(
        F.array(F.lit("RS"), F.lit("py"), F.lit("Js"), F.lit("go"), F.lit("md")),
        (F.col("doc_id") % 5).cast("int") + 1,
    )
    lang = (
        F.when(F.lower(ext) == "rs", "rust")
        .when(F.lower(ext) == "py", "python")
        .when(F.lower(ext) == "js", "javascript")
        .when(F.lower(ext) == "go", "go")
        .otherwise("markdown")
    )
    return d.select("doc_id", lang.alias("language")).orderBy("doc_id")


@q(
    "ref_kind_classifier",  # F11: priority rules on surrounding text
    """
    SELECT doc_id,
           CASE WHEN text LIKE '%join%'   THEN 'call'
                WHEN text LIKE '%window%' THEN 'type_ref'
                WHEN text LIKE '%agg%'    THEN 'write'
                ELSE 'read' END AS kind
    FROM documents ORDER BY doc_id
    """,
)
def ref_kind_classifier(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("text").contains("join"), "call")
        .when(F.col("text").contains("window"), "type_ref")
        .when(F.col("text").contains("agg"), "write")
        .otherwise("read")
    )
    return d.select("doc_id", kind.alias("kind")).orderBy("doc_id")


# =========================================================================
# Sorts / limits / top-k (SURVEY §2.6)
# =========================================================================


@q(
    "topk_by_score",  # T2/T3: orderBy desc + limit with deterministic ties
    """
    SELECT event_id, round(value, 2) AS score FROM events
    ORDER BY value DESC, event_id LIMIT 25
    """,
)
def topk_by_score(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .select("event_id", F.round("value", 2).alias("score"), "value")
        .orderBy(F.desc("value"), "event_id")
        .limit(25)
        .drop("value")
    )


@q(
    "newest_first_limit",  # T5: commit time+topo ordering, max_count cut
    """
    SELECT event_id, user_id FROM events
    ORDER BY ts DESC, event_id LIMIT 50
    """,
)
def newest_first_limit(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .orderBy(F.desc("ts"), "event_id")
        .select("event_id", "user_id", "ts")
        .limit(50)
        .drop("ts")
    )


# =========================================================================
# Joins (SURVEY §2.4)
# =========================================================================


@q(
    "merge_diff_classify",  # J1: the 3-way incremental diff as a query
    """
    WITH current_files AS (
      SELECT doc_id AS fid, sha256(text) AS sha FROM documents WHERE doc_id % 3 != 0
    ), cached AS (
      SELECT doc_id AS fid, sha256(substr(text, 1, n_chars - (n_chars % 2))) AS sha
      FROM documents WHERE doc_id % 2 = 0
    )
    SELECT CASE WHEN c.fid IS NULL THEN 'added'
                WHEN f.fid IS NULL THEN 'removed'
                WHEN f.sha != c.sha THEN 'updated'
                ELSE 'unchanged' END AS op,
           count(*) AS cnt
    FROM current_files f FULL OUTER JOIN cached c ON f.fid = c.fid
    GROUP BY 1 ORDER BY op
    """,
)
def merge_diff_classify(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    current = d.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("fid"), F.sha2("text", 256).alias("sha")
    )
    cached = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("fid"),
        F.sha2(
            F.expr("substr(text, 1, n_chars - (n_chars % 2))"), 256
        ).alias("sha"),
    )
    j = current.alias("f").join(
        cached.alias("c"), F.col("f.fid") == F.col("c.fid"), "full_outer"
    )
    op = (
        F.when(F.col("c.fid").isNull(), "added")
        .when(F.col("f.fid").isNull(), "removed")
        .when(F.col("f.sha") != F.col("c.sha"), "updated")
        .otherwise("unchanged")
    )
    return j.select(op.alias("op")).groupBy("op").agg(F.count("*").alias("cnt")).orderBy("op")


@q(
    "rrf_fusion",  # J2/A4/F4/T3: reciprocal rank fusion of two ranked lists
    r"""
    WITH vec AS (
      SELECT * FROM (
        SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
        FROM documents) WHERE rnk <= 60
    ), kw AS (
      SELECT * FROM (
        SELECT doc_id, row_number() OVER (ORDER BY
                 (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) DESC,
                 doc_id) AS rnk
        FROM (SELECT doc_id,
                     len(regexp_extract_all(lower(text), '\bjoin\b')) AS tf,
                     len(string_split(text, ' ')) AS dl
              FROM documents),
             (SELECT avg(len(string_split(text, ' '))) AS avgdl FROM documents)
      ) WHERE rnk <= 60
    ), unioned AS (
      SELECT doc_id, 1.0/(60+rnk) AS rrf FROM vec
      UNION ALL SELECT doc_id, 1.0/(60+rnk) FROM kw
    )
    SELECT doc_id, round(sum(rrf), 8) AS score FROM unioned
    GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def rrf_fusion(spark, sf_dir):
    """RRF of a vector-proxy ranking and a REAL BM25 keyword ranking
    (tf normalized by k1=1.2, b=0.75 length normalization — the idf
    factor is constant for a single-term query and thus rank-invariant,
    so it is omitted from the ordering key).  Round 1 fused a raw
    substring-count proxy; the reference's keyword leg is Tantivy BM25
    (/root/reference/src/bm25_search/mod.rs:183-217)."""
    d = t(spark, sf_dir, "documents")
    # Each leg's top-60 is taken with orderBy().limit() — Catalyst plans a
    # distributed TakeOrderedAndProject (per-partition top-60, merge on the
    # driver) instead of the single-task global-window sort that
    # row_number().over(Window.orderBy(...)) would force.  row_number then
    # ranks only the 60-row survivor set (trivially small by construction).
    vec_order = [F.desc("n_chars"), F.asc("doc_id")]
    vec = (
        d.select("doc_id", "n_chars")
        .orderBy(*vec_order)
        .limit(60)
        .withColumn("rnk", F.row_number().over(W.orderBy(*vec_order)))
        .select("doc_id", "rnk")
    )
    k1, b = 1.2, 0.75
    # the keyword leg runs a word-boundary regex + split over every
    # document — spread the narrow single-file scan first (the vec leg
    # above touches only doc_id/n_chars and keeps the plain scan)
    dw = t_wide(spark, sf_dir, "documents")
    kw_tf = dw.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\bjoin\b"), F.lit(0))
        ).alias("tf"),
        F.size(F.split("text", " ")).alias("dl"),
    )
    avgdl = dw.select(F.size(F.split("text", " ")).alias("dl")).agg(
        F.avg("dl").alias("avgdl")
    )
    bm25 = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    kw_order = [F.desc("bm25"), F.asc("doc_id")]
    kw = (
        kw_tf.crossJoin(F.broadcast(avgdl))
        .select("doc_id", bm25.alias("bm25"))
        .orderBy(*kw_order)
        .limit(60)
        .withColumn("rnk", F.row_number().over(W.orderBy(*kw_order)))
        .select("doc_id", "rnk")
    )
    rrf = F.lit(1.0) / (F.lit(60) + F.col("rnk"))
    unioned = vec.select("doc_id", rrf.alias("rrf")).unionByName(
        kw.select("doc_id", rrf.alias("rrf"))
    )
    return (
        unioned.groupBy("doc_id")
        .agg(F.round(F.sum("rrf"), 8).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@q(
    "broadcast_dim_join",  # J4: symbol lookup = broadcast hash join on small dim
    """
    SELECT n.n_name AS nation, r.r_name AS region, count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name ORDER BY nation
    """,
)
def broadcast_dim_join(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("nation")
    )


@q(
    "range_containment_join",  # J5/J6: non-equi containment join
    """
    WITH spans AS (
      SELECT r_regionkey AS span_id,
             CAST(r_regionkey * 20 AS BIGINT) AS lo,
             CAST(r_regionkey * 20 + 20 AS BIGINT) AS hi
      FROM region
    )
    SELECT s.span_id, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN spans s ON e.value >= s.lo AND e.value < s.hi
    GROUP BY s.span_id ORDER BY s.span_id
    """,
)
def range_containment_join(spark, sf_dir):
    # half-open integer bounds: fractional literals parse as DECIMAL in
    # DuckDB but DOUBLE in Spark — boundary rows would diverge
    e = t(spark, sf_dir, "events")
    spans = (
        t(spark, sf_dir, "region")
        .select(
            F.col("r_regionkey").alias("span_id"),
            (F.col("r_regionkey") * 20).cast("long").alias("lo"),
            (F.col("r_regionkey") * 20 + 20).cast("long").alias("hi"),
        )
    )
    # small side broadcast => non-equi predicate evaluated as BNL join
    j = e.join(
        F.broadcast(spans),
        (e.value >= spans.lo) & (e.value < spans.hi),
    )
    return (
        j.groupBy("span_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("span_id")
    )


@q(
    "commit_anti_join",  # J7: skip already-indexed commits
    """
    SELECT count(*) AS n_new FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
    """,
)
def commit_anti_join(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_new"))
    )


@q(
    "hydration_join",  # J3: fused (id, score) hydrated back to rows
    """
    WITH top_ids AS (
      SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 15
    )
    SELECT d.doc_id, d.source, d.lang, t.n_chars AS score
    FROM top_ids t JOIN documents d ON t.doc_id = d.doc_id
    ORDER BY score DESC, d.doc_id
    """,
)
def hydration_join(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    top = d.orderBy(F.desc("n_chars"), "doc_id").limit(15).select("doc_id", "n_chars")
    return (
        F.broadcast(top.withColumnRenamed("n_chars", "score"))
        .join(d, "doc_id")
        .select("doc_id", "source", "lang", "score")
        .orderBy(F.desc("score"), "doc_id")
    )


# =========================================================================
# Set operations & dedup (SURVEY §2.7)
# =========================================================================


@q(
    "union_distinct",  # U1/U4: union across partitions + distinct
    """
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      UNION
      SELECT user_id FROM events WHERE event_type = 'view'
    ) ORDER BY user_id
    """,
)
def union_distinct(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    return a.union(b).distinct().orderBy("user_id")


@q(
    "distinct_dedup_by_key",  # U2: HashSet-dedupe by name
    """
    SELECT lang, min(doc_id) AS first_doc FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def distinct_dedup_by_key(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


@q(
    "anti_semi_exclusion",  # U5: definition-site exclusion (left anti on range)
    """
    SELECT e.event_id FROM events e
    WHERE e.event_type = 'error'
      AND NOT EXISTS (SELECT 1 FROM region r
                      WHERE e.value >= CAST(r.r_regionkey * 20 AS BIGINT)
                        AND e.value <  CAST(r.r_regionkey * 20 + 1 AS BIGINT))
    ORDER BY e.event_id
    """,
)
def anti_semi_exclusion(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    r = t(spark, sf_dir, "region").select(
        (F.col("r_regionkey") * 20).cast("long").alias("lo"),
        (F.col("r_regionkey") * 20 + 1).cast("long").alias("hi"),
    )
    return (
        e.join(F.broadcast(r), (e.value >= r.lo) & (e.value < r.hi), "left_anti")
        .select("event_id")
        .orderBy("event_id")
    )
