"""Skew handling: deterministic salting + AQE, for heavy-hitter keys.

The north rule requires explicit skew handling for hot ``doc_id``/entity
keys (BASELINE.json; SURVEY §4). Two complementary mechanisms:

* **AQE skew-split** (``spark.sql.adaptive.skewJoin.enabled=true``, set in
  core/session.py) — covers shuffle-join skew at runtime.
* **Deterministic salting** (here) — covers cases AQE cannot split:
  aggregation hot keys and replicated joins. Salt is derived from a
  deterministic column hash, never ``rand()`` (reproducibility,
  SURVEY §7.3).

Pattern for a skewed groupBy: two-phase aggregation —
``groupBy(key, salt).partial -> groupBy(key).final`` — turns one hot
partition into ``n_salts`` even ones.

Pattern for a skewed join: salt the big side, replicate the small side
``n_salts`` times, join on ``(key, salt)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, from_col: str, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from an existing high-cardinality
    column (e.g. event_id / frame_id) — stable across runs and parallelism."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(from_col)), F.lit(n_salts)).cast("int")
    )


def replicate_for_salt(
    df: DataFrame, n_salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Explode the (small) side once per salt value so a salted equi-join
    on (key, salt) sees every row."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int,
    big_salt_from: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join immune to hot keys on the big side.

    The small side is replicated n_salts× — keep it broadcast-sized
    (n_salts * |small| rows). For dimension joins prefer plain
    ``broadcast()``; salting matters when the small side is too big to
    broadcast but the key distribution is skewed.
    """
    b = with_salt(big, n_salts, big_salt_from)
    s = replicate_for_salt(small, n_salts)
    return b.join(s, on + ["_salt"], how).drop("_salt")


def skewed_group_count(
    df: DataFrame, key: str, n_salts: int, salt_from: str
) -> DataFrame:
    """Two-phase count for hot grouping keys: partial per (key, salt),
    final per key. Identical result to a plain groupBy count."""
    partial = (
        with_salt(df, n_salts, salt_from)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))


def partition_histogram(df: DataFrame) -> DataFrame:
    """Rows per physical partition — the evidence table for skew metrics
    (north rule: 'document per-partition row counts')."""
    return df.withColumn("partition_id", F.spark_partition_id()).groupBy(
        "partition_id"
    ).count()
