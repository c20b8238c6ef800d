"""Range (interval) join — points matched to containing intervals.

≙ the reference's position-interval alignment (noise repeat/crop maps
positions into source ranges, design.md:1003-1043); SURVEY §2.3 names
range joins part of the engine's capability intersection. Canonical use
here: assign events to session intervals.

Two implementations:

* ``range_join`` — the declarative inequality join; Catalyst picks
  broadcast-nested-loop for small interval sides. Correct everywhere,
  O(|points| × |intervals-per-key|) worst case.
* ``range_join_bucketized`` — the scale shape: intervals explode to the
  coarse time buckets they cover, points bucketize once, equi-join on
  (key, bucket) + exact post-filter, dedupe. Turns the inequality join
  into a hash join whose fan-out is bounded by interval length /
  bucket_seconds. Equivalence-tested against the naive join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    point_ts: str = "ts",
    lo: str = "session_start",
    hi: str = "session_end",
) -> DataFrame:
    """Inclusive containment: point rows gain every interval row with
    lo <= ts <= hi for the same key."""
    p, iv = points.alias("p"), intervals.alias("iv")
    return p.join(
        iv,
        (F.col(f"p.{key}") == F.col(f"iv.{key}"))
        & (F.col(f"p.{point_ts}") >= F.col(f"iv.{lo}"))
        & (F.col(f"p.{point_ts}") <= F.col(f"iv.{hi}")),
    ).select("p.*", *[F.col(f"iv.{c}") for c in intervals.columns if c != key])


def range_join_bucketized(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    point_ts: str = "ts",
    lo: str = "session_start",
    hi: str = "session_end",
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Equi-join formulation of the same containment (identical output)."""
    bucket_us = int(bucket_seconds * 1_000_000)

    def b(col):
        return (F.unix_micros(F.col(col).cast("timestamp")) / bucket_us).cast("long")

    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(b(lo), b(hi)))
    )
    p = points.withColumn("_bucket", b(point_ts))
    joined = (
        p.alias("p")
        .join(
            iv.alias("iv"),
            (F.col(f"p.{key}") == F.col(f"iv.{key}"))
            & (F.col("p._bucket") == F.col("iv._bucket")),
        )
        .where(
            (F.col(f"p.{point_ts}") >= F.col(f"iv.{lo}"))
            & (F.col(f"p.{point_ts}") <= F.col(f"iv.{hi}"))
        )
    )
    out_cols = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"iv.{c}") for c in intervals.columns if c != key
    ]
    # no dedup needed: a point has exactly ONE bucket and an interval's
    # exploded buckets are distinct, so each (point row, interval row)
    # pair joins at most once — and a dropDuplicates over output columns
    # would wrongly collapse legitimately duplicated input rows
    # (ADVICE r01).
    return joined.select(*out_cols)
