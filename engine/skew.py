"""Skew handling: salting for mega-repo hot keys + AQE configuration.

One repo holding 30% of a 10^12-file corpus turns any
partition-by-repo layout into a straggler (the reference sidesteps
this per-process with one index per root keyed sha256(root)[..16],
/root/reference/src/vector_db/lance_client/mod.rs:76-88 — that hash
prefix is exactly a salting key).  Two complementary mechanisms:

- **Explicit salting** (our code): append a per-row salt bucket derived
  from sha2(path) so a hot repo splits into ``n_salts`` shuffle keys;
  downstream aggregations do partial-per-salt then final-merge.
- **AQE skew-join splitting** (built-in): enabled in engine.session for
  every job; splits oversized sort-merge partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col: str = "path") -> DataFrame:
    """Deterministic salt bucket in [0, n_salts) from sha2(col).

    Mirrors the reference's sha256(root)[..16] partition key (F2) —
    content-derived, stable across runs, no RNG.
    """
    return df.withColumn(
        "salt",
        (F.conv(F.substring(F.sha2(F.col(col), 256), 1, 4), 16, 10) % n_salts).cast(
            "int"
        ),
    )


def salted_repartition(
    df: DataFrame, n_partitions: int, key: str = "repo", n_salts: int = 16
) -> DataFrame:
    """Repartition on (key, salt): hot keys spread over n_salts tasks."""
    return with_salt(df, n_salts).repartition(n_partitions, key, "salt")


def skew_metrics(df: DataFrame, key: str = "repo") -> dict:
    """Rows per key vs median — quantifies the imbalance salting fixes."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    row = counts.agg(
        F.max("n").alias("mx"),
        F.expr("percentile_approx(n, 0.5)").alias("med"),
        F.count("*").alias("keys"),
    ).collect()[0]
    return {
        "max_key_rows": row["mx"],
        "median_key_rows": row["med"],
        "n_keys": row["keys"],
        "skew_ratio": row["mx"] / max(row["med"], 1),
    }


def partition_row_counts(df: DataFrame) -> list[int]:
    """Rows per Spark partition (task input balance evidence)."""
    return [
        r["n"]
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
