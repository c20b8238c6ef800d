"""Gap-based sessionization via cumulative-sum-of-gap-flags.

≙ the reference's silence-gap span detection (`_trim_silence`,
design.md:837-859) generalized per the north star: a new session starts
whenever the time since the previous event exceeds ``gap``.

The canonical Spark sessionize:
    gap_flag  = (ts - lag(ts) > gap)::int      -- first event => flag 0
    session_n = sum(gap_flag) over (partition by entity order by ts)

One shuffle (partitionBy entity), two chained window functions over the
same sort — a single Exchange in the physical plan. Streaming twin:
``session_window(ts, gap)`` (see streaming/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    entity: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Tag every event with a per-entity session number (0-based)."""
    w = Window.partitionBy(entity).orderBy(ts_col, "event_id")
    # integer-microsecond gap arithmetic: exact and identical in DuckDB
    # (epoch_us) — float-seconds subtraction would round differently.
    # cast handles TIMESTAMP_NTZ inputs (session TZ is pinned to UTC)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(micros, 1).over(w)
    gap_us = int(gap_seconds * 1_000_000)
    gap_flag = F.when(
        prev.isNotNull() & (micros - prev > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = df.withColumn("gap_flag", gap_flag)
    w2 = (
        Window.partitionBy(entity)
        .orderBy(ts_col, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn("session_id", F.sum("gap_flag").over(w2).cast("long")).drop(
        "gap_flag"
    )


def session_summary(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    entity: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session aggregate: bounds, event count, value sum.

    The groupBy reuses the sessionize shuffle partitioning (same leading
    key), so AQE keeps it to one wide stage + a cheap partial agg.
    """
    tagged = sessionize(df, gap_seconds, entity, ts_col)
    # sum in integer cents: float summation order differs across engines,
    # integer summation is exact and order-free
    return tagged.groupBy(entity, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("value_sum"),
    )


def sessionize_oracle_sql(
    gap_seconds: float = 1800.0, from_clause: str = "events"
) -> str:
    """DuckDB SQL: identical session tagging (integer-microsecond gap
    arithmetic — exact, matches Spark's unix_micros)."""
    w = "PARTITION BY user_id ORDER BY ts, event_id"
    gap_us = int(gap_seconds * 1_000_000)
    return (
        f"SELECT * EXCLUDE (gap_flag), "
        f"CAST(sum(gap_flag) OVER ({w} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        f" AS session_id FROM ("
        f"SELECT *, CASE WHEN lag(ts, 1) OVER ({w}) IS NOT NULL AND "
        f"epoch_us(ts) - lag(epoch_us(ts), 1) OVER ({w}) > {gap_us} "
        f"THEN 1 ELSE 0 END AS gap_flag FROM {from_clause})"
    )


def session_summary_oracle_sql(
    gap_seconds: float = 1800.0, from_clause: str = "events"
) -> str:
    inner = sessionize_oracle_sql(gap_seconds, from_clause)
    return (
        f"SELECT user_id, session_id, count(*) AS n_events, "
        f"min(ts) AS session_start, max(ts) AS session_end, "
        f"sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum "
        f"FROM ({inner}) GROUP BY user_id, session_id"
    )
