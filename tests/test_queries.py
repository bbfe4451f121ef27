"""Self-check of the driver contract: every queries() entry vs its
DuckDB oracle at sf0.001 — row count, schema width, and
order-insensitive value equality (the driver's comparison, reproduced
here so mismatches surface before the driver runs)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("QUERY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def _rows_to_set(rows, columns):
    # sort columns by name (driver semantics), normalize values
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


NAMES = sorted(entrymod.queries().keys())


def test_all_queries_have_oracles():
    missing = set(NAMES) - set(entrymod.oracle_sql().keys())
    assert not missing, f"queries without oracle SQL: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = qfn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    ddf = duck.sql(sql)
    drows = ddf.fetchall()
    dcols = ddf.columns
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in dcols
    ), f"{name}: schema {scols} != {dcols}"
    got = _rows_to_set([tuple(r) for r in srows], [c.lower() for c in scols])
    want = _rows_to_set(drows, [c.lower() for c in dcols])
    if got != want:
        diff_g = [r for r in got if r not in want][:5]
        diff_w = [r for r in want if r not in got][:5]
        raise AssertionError(
            f"{name}: value mismatch\n only-spark: {diff_g}\n only-duck:  {diff_w}"
        )


def test_hash_cache_digest_partial_agg(spark):
    """r4 VERDICT Wrong #1: the digest must be commutative so Catalyst
    emits a map-side partial HashAggregate — under the skew corpus's
    mega-repo, per-key aggregation state stays three scalars instead of
    a whole-repo collect_list array in one task."""
    sdf = entrymod.queries()["hash_cache_digest"](spark, SF_DIR)
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan and "partial_sum" in plan
    assert "partial_bit_xor" in plan
    assert "collect_list" not in plan
