"""Segmented-scan (bucketed) as-of join == plain as-of join, including on
skewed entities."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import EVENTS
from audio_feature_extraction_spark.operators import asof

T0 = dt.datetime(2024, 1, 1)


def _events(spark, n_hot=500, n_cold=20):
    rows = []
    eid = 0
    # hot entity 1: dense alternating states/probes across many buckets
    for i in range(n_hot):
        typ = "click" if i % 3 != 2 else "view"
        rows.append((eid, T0 + dt.timedelta(minutes=17 * i), 1, typ, float(i), None))
        eid += 1
    # cold entities: sparse, probes before any state, dup timestamps
    for e in range(2, 2 + n_cold):
        rows.append((eid, T0 + dt.timedelta(minutes=1), e, "view", 0.0, None)); eid += 1
        rows.append((eid, T0 + dt.timedelta(hours=e), e, "click", 100.0 + e, None)); eid += 1
        rows.append((eid, T0 + dt.timedelta(hours=e), e, "click", 200.0 + e, None)); eid += 1
        rows.append((eid, T0 + dt.timedelta(hours=e, minutes=5), e, "view", 0.0, None)); eid += 1
    return spark.createDataFrame(rows, schema=EVENTS)


@pytest.mark.parametrize("bucket_seconds", [3600.0, 86400.0, 60.0])
def test_bucketed_equals_plain(spark, bucket_seconds):
    ev = _events(spark)
    probes = ev.where(F.col("event_type") == "view")
    states = ev.where(F.col("event_type") == "click")
    plain = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in asof.asof_join(probes, states).collect()
    }
    bucketed = {
        r.event_id: (r.asof_value, r.asof_ts)
        for r in asof.asof_join_bucketed(
            probes, states, bucket_seconds=bucket_seconds
        ).collect()
    }
    assert bucketed == plain


@pytest.mark.parametrize("bucket_seconds", [3600.0, 60.0])
def test_backfill_bucketed_equals_plain(spark, bucket_seconds):
    from audio_feature_extraction_spark.operators import temporal

    ev = _events(spark).withColumn(
        "value",
        F.when(F.col("event_type") == "view", None).otherwise(F.col("value")),
    )
    plain = {r.event_id: r.filled for r in temporal.backfill(ev).collect()}
    bucketed = {
        r.event_id: r.filled
        for r in temporal.backfill_bucketed(ev, bucket_seconds=bucket_seconds).collect()
    }
    assert bucketed == plain


def test_choose_bucketed_heuristic():
    # 10k rows over 16 partitions -> mean 625/partition
    assert not asof.choose_bucketed(1000, 10000, 16)      # 1.6x mean: plain
    assert asof.choose_bucketed(8000, 10000, 16)          # 12.8x mean: bucketed
    assert not asof.choose_bucketed(0, 0, 16)


def test_asof_auto_matches_plain(spark):
    ev = _events(spark, n_hot=80, n_cold=8)
    probes = ev.where(F.col("event_type") == "view")
    states = ev.where(F.col("event_type") == "click")
    plain = {
        r.event_id: r.asof_value for r in asof.asof_join(probes, states).collect()
    }
    auto = {
        r.event_id: r.asof_value
        for r in asof.asof_join_auto(probes, states).collect()
    }
    assert auto == plain


def test_bucketed_zero_leakage(spark):
    ev = _events(spark, n_hot=60, n_cold=5)
    probes = ev.where(F.col("event_type") == "view")
    states = ev.where(F.col("event_type") == "click")
    max_probe_ts = probes.agg(F.max("ts")).collect()[0][0]
    trimmed_states = states.where(F.col("ts") <= F.lit(max_probe_ts))
    a = {
        r.event_id: r.asof_value
        for r in asof.asof_join_bucketed(probes, states, 3600.0).collect()
    }
    b = {
        r.event_id: r.asof_value
        for r in asof.asof_join_bucketed(probes, trimmed_states, 3600.0).collect()
    }
    assert a == b
