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


def segment_expr(threshold: int, spark: bool, col: str = "tokens") -> str:
    """Token-axis sessionization (≙ the sub-threshold gap detection in
    _trim_silence, design.md:837-859, generalized to SPLITTING): cut the
    sequence at every "separator" token (< threshold), drop separators,
    emit the non-empty segments in order as array<array<int>>."""
    if spark:
        seps = f"filter(sequence(1, size({col})), i -> element_at({col}, cast(i as int)) < {threshold})"
        bounds = f"concat(array(0), {seps}, array(size({col}) + 1))"
        segs = (
            f"transform(sequence(1, size({bounds}) - 1), k -> "
            f"slice({col}, element_at({bounds}, cast(k as int)) + 1, "
            f"element_at({bounds}, cast(k + 1 as int)) - element_at({bounds}, cast(k as int)) - 1))"
        )
        return f"filter({segs}, s -> size(s) > 0)"
    seps = f"list_filter(range(1, len({col}) + 1), i -> {col}[i] < {threshold})"
    bounds = f"list_concat(list_concat([0], {seps}), [len({col}) + 1])"
    segs = (
        f"list_transform(range(1, len({bounds})), k -> "
        f"{col}[({bounds})[k] + 1 : ({bounds})[k + 1] - 1])"
    )
    return f"list_filter({segs}, s -> len(s) > 0)"


def segment_table(
    df: DataFrame, threshold: int, col: str = "tokens"
) -> DataFrame:
    """Long form: one row per (doc_id, segment_id, segment_tokens)."""
    return df.selectExpr(
        "doc_id",
        f"posexplode({segment_expr(threshold, spark=True, col=col)}) "
        f"as (segment_id, segment_tokens)",
    )


def segments_oracle_sql(threshold: int, from_clause: str = "tokseq") -> str:
    segs = segment_expr(threshold, spark=False)
    return (
        f"SELECT doc_id, CAST(u.k - 1 AS INTEGER) AS segment_id, "
        f"s[u.k] AS segment_tokens FROM "
        f"(SELECT doc_id, {segs} AS s FROM {from_clause}) t, "
        f"unnest(range(1, len(t.s) + 1)) AS u(k)"
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
