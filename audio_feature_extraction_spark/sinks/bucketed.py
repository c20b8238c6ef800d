"""Bucketed (hash-clustered, sorted) table layout for the token table.

At 100 TB the token table is re-joined and re-grouped by ``doc_id``
constantly (reconstruction, dedup verify, feature joins). Writing it
``bucketBy(doc_id)`` once makes every later doc_id shuffle disappear:
the scan itself reports hash partitioning, so groupBy/join reuse it
(zero Exchange — plan-asserted in tests). This is the parquet analog of
an Iceberg bucket-partitioned table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 16,
    key: str = "doc_id",
    sort_cols: tuple[str, ...] = (),
) -> None:
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key, *sort_cols)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
