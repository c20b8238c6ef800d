"""Deterministic train/val/test split (≙ DatasetSplitter, tasks.md:688-709;
ratios 0.8/0.1/0.1 design.md:2173-2176).

NOT ``randomSplit`` — the assignment must be identical across runs,
engines, and parallelism levels (SURVEY §2.1 S11), so the bucket is a
pure-SQL affine hash of the numeric doc id, computable identically in
DuckDB.  Disjointness and full coverage hold by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# affine mixing constants: doc_id * MULT + OFF stays < 2^62 for any
# realistic id, so no overflow divergence between engines
MULT = 9973
OFF = 12345
BUCKETS = 100
TRAIN_LT, VAL_LT = 80, 90


def bucket_sql(id_expr: str) -> str:
    """Works verbatim in both Spark SQL and DuckDB."""
    return f"(({id_expr} * {MULT} + {OFF}) % {BUCKETS})"


def split_case_sql(id_expr: str) -> str:
    b = bucket_sql(id_expr)
    return (
        f"CASE WHEN {b} < {TRAIN_LT} THEN 'train' "
        f"WHEN {b} < {VAL_LT} THEN 'val' ELSE 'test' END"
    )


def assign_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Add a ``split`` column. For string ids of the form 'doc_<n>' the
    numeric suffix is used (keeps Spark and DuckDB hashing identical)."""
    id_expr = (
        f"CAST(regexp_replace({id_col}, '[^0-9]', '') AS BIGINT)"
        if dict(df.dtypes)[id_col] == "string"
        else id_col
    )
    return df.withColumn("split", F.expr(split_case_sql(id_expr)))


def split_oracle_sql(from_clause: str = "documents", id_expr: str = "doc_id") -> str:
    return (
        f"SELECT {split_case_sql(id_expr)} AS split, count(*) AS n, "
        f"min({id_expr}) AS min_id, max({id_expr}) AS max_id "
        f"FROM {from_clause} GROUP BY 1"
    )
