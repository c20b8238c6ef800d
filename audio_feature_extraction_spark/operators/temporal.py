"""Windowed temporal operators over the event/timestamp axis.

≙ the reference's cross-frame temporal ops: MFCC delta/delta-delta are
lag-differences across frames (tasks.md:637-657), the StreamBuffer overlap
state is carry-forward (design.md:1882, 1959-1982), and the rolling
latency stats are bounded trailing windows (design.md:2005-2061).

All windows are **causal** — ``rowsBetween(-k, 0)`` / unbounded-preceding
only — which is the zero-temporal-leakage discipline of the north rule
(the reference's ``center=True`` padding would be leaky; we are the
``center=False`` analog, SURVEY §7.3).

Tie-breaking: every ordering is ``(ts, event_id)`` so results are
deterministic under duplicate timestamps (FIXTURES §2).

Scale: all ops share ONE shuffle — ``Window.partitionBy(user_id)``; Spark
reuses the exchange across the chained window functions (verify via
`.explain`: a single Exchange, then sorts).  Skewed entities: see
operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ("ts", "event_id")


def _w(entity: str = "user_id"):
    return Window.partitionBy(entity).orderBy(*ORDER_COLS)


def with_deltas(
    df: DataFrame, value_col: str = "value", entity: str = "user_id"
) -> DataFrame:
    """First/second discrete differences (≙ MFCC delta / delta-delta,
    tasks.md:637-657): delta = v - lag(v), delta2 = delta - lag(delta)."""
    w = _w(entity)
    out = df.withColumn("delta", F.col(value_col) - F.lag(value_col, 1).over(w))
    return out.withColumn("delta2", F.col("delta") - F.lag("delta", 1).over(w))


def backfill(
    df: DataFrame,
    value_col: str = "value",
    entity: str = "user_id",
    out_col: str = "filled",
) -> DataFrame:
    """Carry-forward last non-null value per entity in time order
    (≙ persistent overlap buffer, design.md:1882; the north-star
    ``last(ignorenulls)`` op). Entities with no prior value stay null
    (FIXTURES §2)."""
    w = _w(entity).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def rolling_stats(
    df: DataFrame,
    value_col: str = "value",
    entity: str = "user_id",
    k: int = 99,
) -> DataFrame:
    """Trailing-window avg/max/count over the last k+1 rows (causal)
    (≙ LatencyMonitor window of 100, design.md:2022-2026)."""
    w = _w(entity).rowsBetween(-k, 0)
    return (
        df.withColumn("roll_avg", F.avg(value_col).over(w))
        .withColumn("roll_max", F.max(value_col).over(w))
        .withColumn("roll_n", F.count(value_col).over(w))
    )


def frame_deltas(
    features: DataFrame, feature_col: str = "features", entity: str = "doc_id"
) -> DataFrame:
    """Elementwise delta of consecutive frame feature vectors
    (the true MFCC-delta analog, vector-valued; zip_with keeps it JVM-side)."""
    w = Window.partitionBy(entity).orderBy("frame_id")
    prev = F.lag(feature_col, 1).over(w)
    # first frame gets an empty array, not NULL — cross-engine comparisons
    # (and downstream writers) treat missing-vs-null arrays inconsistently
    return features.withColumn(
        "delta",
        F.when(prev.isNull(), F.expr("cast(array() as array<double>)")).otherwise(
            F.zip_with(F.col(feature_col), prev, lambda a, b: a - b)
        ),
    )


def backfill_bucketed(
    df: DataFrame,
    value_col: str = "value",
    entity: str = "user_id",
    out_col: str = "filled",
    bucket_seconds: float = 86400.0,
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Skew-proof carry-forward: the same segmented-scan shape as
    ``asof.asof_join_bucketed`` applied to backfill — local carry within
    (entity, time-bucket), boundary carries across buckets on the tiny
    per-bucket table, combine. A hot entity spreads over many partitions
    instead of one window straggler. Identical output to ``backfill``
    (tested)."""
    bucket_us = int(bucket_seconds * 1_000_000)
    u = df.withColumn(
        "_bucket",
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / bucket_us).cast("long"),
    )
    wloc = (
        Window.partitionBy(entity, "_bucket")
        .orderBy(ts_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("_lv", F.last(value_col, ignorenulls=True).over(wloc))

    bounds = (
        u.where(F.col(value_col).isNotNull())
        .groupBy(entity, "_bucket")
        .agg(F.max(F.struct(ts_col, seq_col, value_col)).alias("_m"))
        .select(entity, "_bucket", F.col(f"_m.{value_col}").alias("_bv"))
    )
    prev = bounds.select(
        F.col(entity), (F.col("_bucket") + 1).alias("_bucket"), F.col("_bv").alias("_pv")
    )
    all_buckets = (
        u.select(entity, "_bucket")
        .unionByName(prev.select(entity, "_bucket"))
        .distinct()
    )
    wfill = (
        Window.partitionBy(entity)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled_bounds = all_buckets.join(prev, [entity, "_bucket"], "left").withColumn(
        "_pv", F.last("_pv", ignorenulls=True).over(wfill)
    )
    return (
        local.join(F.broadcast(filled_bounds), [entity, "_bucket"], "left")
        .withColumn(out_col, F.coalesce("_lv", "_pv"))
        .drop("_bucket", "_lv", "_pv")
    )


# --- DuckDB oracle builders -------------------------------------------------

def deltas_oracle_sql(value_col: str = "value", from_clause: str = "events") -> str:
    w = "PARTITION BY user_id ORDER BY ts, event_id"
    return (
        f"SELECT *, delta - lag(delta, 1) OVER ({w}) AS delta2 FROM ("
        f"SELECT *, {value_col} - lag({value_col}, 1) OVER ({w}) AS delta "
        f"FROM {from_clause})"
    )


def backfill_oracle_sql(
    value_col: str = "value", from_clause: str = "events", out_col: str = "filled"
) -> str:
    w = (
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return (
        f"SELECT *, last_value({value_col} IGNORE NULLS) OVER ({w}) AS {out_col} "
        f"FROM {from_clause}"
    )


def rolling_oracle_sql(
    value_col: str = "value", from_clause: str = "events", k: int = 99
) -> str:
    w = (
        f"PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW"
    )
    return (
        f"SELECT *, avg({value_col}) OVER ({w}) AS roll_avg, "
        f"max({value_col}) OVER ({w}) AS roll_max, "
        f"count({value_col}) OVER ({w}) AS roll_n FROM {from_clause}"
    )
