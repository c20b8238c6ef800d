"""PIT ops: as-of join, backfill, deltas, sessionize — incl. the
zero-temporal-leakage property (SURVEY §5: deleting all rows after every
probe must not change any output)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import EVENTS
from audio_feature_extraction_spark.operators import asof, sessionize, temporal

from tests import oracle

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def events(spark):
    # entity 1: normal history; entity 2: duplicate timestamps (tie-break);
    # entity 3: probe before any state (null asof); plus a strictly-future
    # block (minutes >= 10000) after every probe — the leakage canary
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, _ts(0), 1, "click", 10.0, None),
        (2, _ts(5), 1, "view", 0.0, None),       # probe -> 10.0
        (3, _ts(10), 1, "purchase", 20.0, None),
        (4, _ts(10), 1, "view", 0.0, None),      # probe at state ts -> 20.0
        (5, _ts(60), 1, "view", 0.0, None),      # probe -> 20.0
        (6, _ts(0), 2, "click", 1.0, None),
        (7, _ts(0), 2, "click", 2.0, None),      # same ts, higher seq wins
        (8, _ts(1), 2, "view", 0.0, None),       # probe -> 2.0
        (9, _ts(3), 3, "view", 0.0, None),       # probe, no state -> null
        (10, _ts(4), 3, "click", 7.0, None),     # state AFTER the probe
        # future block
        (11, _ts(10000), 1, "click", 99.0, None),
        (12, _ts(10001), 2, "purchase", 98.0, None),
        (13, _ts(10002), 3, "click", 97.0, None),
    ]
    return spark.createDataFrame(rows, schema=EVENTS)


def _run_asof(ev, strict=False):
    probes = ev.where(F.col("event_type") == "view")
    states = ev.where(F.col("event_type").isin("click", "purchase"))
    out = asof.asof_join(probes, states, strict=strict)
    return {r.event_id: (r.asof_value, r.asof_ts) for r in out.collect()}


def test_asof_semantics(events):
    got = _run_asof(events)
    assert got[2][0] == 10.0
    assert got[4][0] == 20.0          # inclusive: state at ts == as_of visible
    assert got[5][0] == 20.0
    assert got[8][0] == 2.0           # duplicate-ts tie-break: max event_id
    assert got[9][0] is None          # no prior state
    assert got[9][1] is None


def test_asof_strict(events):
    got = _run_asof(events, strict=True)
    assert got[4][0] == 10.0          # strict: same-ts state invisible
    assert got[2][0] == 10.0


def test_asof_matches_oracle(events):
    ev = events.collect()
    probes = [(r.user_id, r.ts) for r in ev if r.event_type == "view"]
    states = [
        (r.user_id, r.ts, r.event_id, r.value)
        for r in ev
        if r.event_type in ("click", "purchase")
    ]
    exp = oracle.asof(probes, states)
    got = _run_asof(events)
    probe_ids = [r.event_id for r in ev if r.event_type == "view"]
    assert [got[i][0] for i in probe_ids] == exp


def test_asof_zero_leakage(spark, events):
    """Deleting every row strictly after the last probe changes nothing."""
    max_probe_ts = (
        events.where(F.col("event_type") == "view").agg(F.max("ts")).collect()[0][0]
    )
    trimmed = events.where(F.col("ts") <= F.lit(max_probe_ts))
    assert _run_asof(events) == _run_asof(trimmed)


def test_backfill_and_leakage(spark, events):
    masked = events.withColumn(
        "value", F.when(F.col("event_type") == "view", None).otherwise(F.col("value"))
    )
    got = {r.event_id: r.filled for r in temporal.backfill(masked).collect()}
    rows = [
        (r.user_id, r.ts, r.event_id, None if r.event_type == "view" else r.value)
        for r in events.collect()
    ]
    exp = oracle.backfill(rows)
    ids = [r.event_id for r in events.collect()]
    assert [got[i] for i in ids] == exp
    assert got[9] is None  # entity 3 has no prior value at its probe


def test_deltas(spark, events):
    got = {r.event_id: (r.delta, r.delta2) for r in temporal.with_deltas(events).collect()}
    assert got[1] == (None, None)                     # first row per entity
    assert got[3][0] == 20.0 - 0.0                    # vs event 2 (ts order)
    assert got[7][0] == 1.0                           # dup ts: ordered by event_id


def test_sessionize(spark):
    rows = [
        (1, _ts(0), 1, "click", 1.0, None),
        (2, _ts(10), 1, "click", 1.0, None),
        (3, _ts(50), 1, "click", 1.0, None),
        (4, _ts(55), 1, "click", 1.0, None),
        (5, _ts(200), 1, "click", 1.0, None),
        (6, _ts(0), 2, "click", 1.0, None),
    ]
    df = spark.createDataFrame(rows, schema=EVENTS)
    got = {r.event_id: r.session_id for r in sessionize.sessionize(df, 1800.0).collect()}
    assert [got[i] for i in [1, 2, 3, 4, 5]] == [0, 0, 1, 1, 2]
    assert got[6] == 0
    orc = oracle.sessionize(
        [(r[2], r[1].timestamp() * 1e6, r[0]) for r in rows], 1800.0
    )
    assert [got[r[0]] for r in rows] == orc


def test_asof_multi_matches_single(spark, events):
    """Multi-source result == two independent single-source as-ofs."""
    probes = events.where(F.col("event_type") == "view")
    multi = {
        r.event_id: (r.asof_click, r.asof_purchase)
        for r in asof.asof_join_multi(
            probes,
            {
                "click": events.where(F.col("event_type") == "click"),
                "purchase": events.where(F.col("event_type") == "purchase"),
            },
        ).collect()
    }
    for name, typ in (("click", "click"), ("purchase", "purchase")):
        single = {
            r.event_id: r.asof_value
            for r in asof.asof_join(
                probes, events.where(F.col("event_type") == typ)
            ).collect()
        }
        idx = 0 if name == "click" else 1
        assert {k: v[idx] for k, v in multi.items()} == single


def test_asof_null_states_are_transparent(spark, events):
    """Pinned semantics: a null-valued state row does NOT clobber the
    carried value (backfill-style), it is skipped."""
    states = events.where(F.col("event_type").isin("click", "purchase")).withColumn(
        "value",
        F.when(F.col("event_id") == 3, None).otherwise(F.col("value")),
    )
    probes = events.where(F.col("event_type") == "view")
    out = {r.event_id: r.asof_value for r in asof.asof_join(probes, states).collect()}
    # event 3 (value 20.0) became null -> probes 4 and 5 fall back to 10.0
    assert out[4] == 10.0 and out[5] == 10.0


def test_asof_struct_valued_state(spark, events):
    """Feature ROWS (struct of several values) carry through the as-of —
    the feature-store shape where each state is a whole vector."""
    states = events.where(F.col("event_type").isin("click", "purchase")).withColumn(
        "feature_row", F.struct(F.col("value"), (F.col("value") * 2).alias("v2"))
    )
    probes = events.where(F.col("event_type") == "view")
    out = {
        r.event_id: r.asof_value
        for r in asof.asof_join(probes, states, value_col="feature_row").collect()
    }
    assert out[2].value == 10.0 and out[2].v2 == 20.0
    assert out[9] is None


def test_segment_table(spark):
    from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES

    # threshold 10: tokens < 10 are separators
    df = spark.createDataFrame(
        [
            ("d0", [100, 200, 5, 300, 400, 500, 3, 2, 600], 9, "web"),
            ("d1", [1, 2, 3], 3, "web"),       # all separators -> no segments
            ("d2", [50, 60], 2, "web"),        # no separators -> one segment
        ],
        schema=TOKEN_SEQUENCES,
    )
    segs = {}
    for r in sessionize.segment_table(df, 10).collect():
        segs.setdefault(r.doc_id, {})[r.segment_id] = list(r.segment_tokens)
    assert segs["d0"] == {0: [100, 200], 1: [300, 400, 500], 2: [600]}
    assert "d1" not in segs
    assert segs["d2"] == {0: [50, 60]}


def test_rolling_causal(spark, events):
    out = temporal.rolling_stats(events, k=1).collect()
    by_id = {r.event_id: r for r in out}
    # event 2 (entity 1, second row): window = rows 1..2
    assert by_id[2].roll_n == 2
    assert by_id[2].roll_avg == (10.0 + 0.0) / 2
    # first row per entity sees only itself — causality
    assert by_id[1].roll_n == 1


@pytest.mark.parametrize("mode", ["strict", "ttl"])
def test_asof_multi_strict_and_ttl_match_single(spark, events, mode):
    """Multi-source strict/TTL semantics == independent single-source
    as-ofs with the same options, per source."""
    kw = {"strict": True} if mode == "strict" else {
        "max_staleness_seconds": 21600.0
    }
    probes = events.where(F.col("event_type") == "view")
    multi = {
        r.event_id: (r.asof_click, r.asof_click_ts,
                     r.asof_purchase, r.asof_purchase_ts)
        for r in asof.asof_join_multi(
            probes,
            {
                "click": events.where(F.col("event_type") == "click"),
                "purchase": events.where(F.col("event_type") == "purchase"),
            },
            **kw,
        ).collect()
    }
    for idx, typ in ((0, "click"), (2, "purchase")):
        single = {
            r.event_id: (r.asof_value, r.asof_ts)
            for r in asof.asof_join(
                probes, events.where(F.col("event_type") == typ), **kw
            ).collect()
        }
        assert {k: (v[idx], v[idx + 1]) for k, v in multi.items()} == single
