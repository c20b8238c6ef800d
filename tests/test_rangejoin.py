"""Range (interval) join: naive vs bucketized equivalence + semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import EVENTS
from audio_feature_extraction_spark.operators import rangejoin, sessionize

T0 = dt.datetime(2024, 1, 1)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def _ivs(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id long, session_id long, session_start timestamp, session_end timestamp",
    )


@pytest.fixture(scope="module")
def data(spark):
    m = lambda x: T0 + dt.timedelta(minutes=x)  # noqa: E731
    pts = _pts(
        spark,
        [
            (1, 1, m(5)),     # inside interval A
            (2, 1, m(10)),    # boundary: == end of A (inclusive)
            (3, 1, m(11)),    # in gap -> no match
            (4, 1, m(130)),   # inside B (crosses an hour-bucket boundary)
            (5, 2, m(5)),     # other user, no intervals -> no match
            (6, 1, m(65)),    # inside long interval B start region
        ],
    )
    ivs = _ivs(
        spark,
        [
            (1, 0, m(0), m(10)),      # A: short
            (1, 1, m(60), m(200)),    # B: spans 3 hour-buckets
        ],
    )
    return pts, ivs


def test_naive_semantics(spark, data):
    pts, ivs = data
    got = {
        (r.event_id, r.session_id)
        for r in rangejoin.range_join(pts, ivs).collect()
    }
    assert got == {(1, 0), (2, 0), (4, 1), (6, 1)}


@pytest.mark.parametrize("bucket_seconds", [3600.0, 60.0, 7200.0])
def test_bucketized_equals_naive(spark, data, bucket_seconds):
    pts, ivs = data
    naive = {
        (r.event_id, r.session_id)
        for r in rangejoin.range_join(pts, ivs).collect()
    }
    fast = {
        (r.event_id, r.session_id)
        for r in rangejoin.range_join_bucketized(
            pts, ivs, bucket_seconds=bucket_seconds
        ).collect()
    }
    assert fast == naive


def test_range_join_on_real_sessions(spark):
    """Every event must land in exactly the session that sessionize
    assigned it to (self-consistency of the two formulations)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tagged = sessionize.sessionize(ev, 1800.0).select("event_id", "session_id")
    sessions = sessionize.session_summary(ev, 1800.0).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    joined = rangejoin.range_join_bucketized(
        ev.select("event_id", "user_id", "ts"), sessions
    ).select("event_id", F.col("session_id").alias("joined_session"))
    merged = tagged.join(joined, "event_id")
    # containment can overlap only if two sessions touch (gap == 0 never
    # happens with continuous ts), so each event maps to its own session
    assert merged.where(F.col("session_id") != F.col("joined_session")).count() == 0
    assert merged.count() == ev.count()


def test_bucketized_keeps_duplicate_points(spark, data):
    """Duplicated input point rows are legitimate rows — the bucketized
    formulation must emit one output row per input row, exactly like the
    naive join (ADVICE r01: the old dropDuplicates collapsed them)."""
    pts, ivs = data
    doubled = pts.unionByName(pts)
    naive = sorted(
        (r.event_id, r.session_id)
        for r in rangejoin.range_join(doubled, ivs).collect()
    )
    fast = sorted(
        (r.event_id, r.session_id)
        for r in rangejoin.range_join_bucketized(doubled, ivs).collect()
    )
    assert fast == naive
    assert len(naive) == 8  # 4 matches, each twice
