"""HyperLogLog sketch + exact-quota sampling."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import mixing, sketch

SF = "/root/testdata/sf0.001"


def _mkdf(spark, seqs, source="web"):
    return spark.createDataFrame(
        [(f"doc_{i}", t, len(t), source) for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )


# ---------------------------------------------------------------------------
# pure-python witness of the whole sketch (math.log == glibc == engines)
# ---------------------------------------------------------------------------

def _py_hll(values):
    m, vb = sketch.HLL_M, 34
    regs = {}
    for t in values:
        x = (t * sketch.HLL_A1 + sketch.HLL_B) % sketch.HLL_P
        h = ((x % 2147483647) ** 2 + x) % sketch.HLL_P
        b, v = h % m, h // m
        rho = vb + 1 if v == 0 else vb - v.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    rarr = [regs.get(j, 0) for j in range(m)]
    s = 0.0
    for r in rarr:
        s += 2.0 ** (-r)
    raw = sketch.HLL_ALPHA * m * m / s
    zeros = sum(1 for r in rarr if r == 0)
    if raw <= 2.5 * m and zeros > 0:
        return rarr, m * math.log(m / zeros)
    return rarr, raw


@settings(max_examples=15, deadline=None)
@given(
    seqs=st.lists(
        st.lists(st.integers(0, 32767), min_size=0, max_size=50),
        min_size=1,
        max_size=10,
    )
)
def test_hll_matches_python_witness(spark, seqs):
    ts = _mkdf(spark, seqs)
    got_regs = {
        r.bucket: r.register for r in sketch.hll_registers(ts).collect()
    }
    want_rarr, want_est = _py_hll([t for s in seqs for t in s])
    assert [got_regs.get(j, 0) for j in range(sketch.HLL_M)] == want_rarr
    rows = {r.k: r.n for r in sketch.hll_distinct_tokens(ts).collect()}
    assert rows["hll_tokens_est"] == math.floor(want_est)
    assert rows["distinct_tokens_exact"] == len(
        {t for s in seqs for t in s}
    )


def test_hll_registers_merge_by_max(spark):
    """The mergeability claim: sketch(A ∪ B) == element-wise max of
    sketch(A) and sketch(B) — shard sketches combine without rescans."""
    a = _mkdf(spark, [[i * 7 % 30000 for i in range(200)]])
    b = _mkdf(spark, [[i * 13 % 30000 for i in range(200, 500)]])
    both = a.unionByName(b)
    ra = {r.bucket: r.register for r in sketch.hll_registers(a).collect()}
    rb = {r.bucket: r.register for r in sketch.hll_registers(b).collect()}
    ru = {r.bucket: r.register for r in sketch.hll_registers(both).collect()}
    merged = {
        j: max(ra.get(j, 0), rb.get(j, 0))
        for j in set(ra) | set(rb)
    }
    assert ru == merged


def test_hll_estimate_accuracy_raw_regime(spark):
    """A few hundred distinct values (raw harmonic regime at m=64):
    the estimate must land within ~3 standard errors (1.04/sqrt(64) ≈
    13% each)."""
    n = 700
    ts = _mkdf(spark, [[(i * 31 + 7) % 32768 for i in range(n)]])
    rows = {r.k: r.n for r in sketch.hll_distinct_tokens(ts).collect()}
    exact = rows["distinct_tokens_exact"]
    est = rows["hll_tokens_est"]
    assert abs(est - exact) / exact < 0.3


# ---------------------------------------------------------------------------
# exact-quota stratified sampling
# ---------------------------------------------------------------------------

def test_sample_quota_exact_counts_and_determinism(spark):
    seqs = [[i, i + 1, i + 2] for i in range(60)]
    rows = [
        (f"doc_{i}", t, len(t), ["web", "wiki", "books"][i % 3])
        for i, t in enumerate(seqs)
    ]
    ts = spark.createDataFrame(rows, schema=TOKEN_SEQUENCES)
    out = mixing.sample_quota(ts, 7)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"web": 7, "wiki": 7, "books": 7}
    # quota above stratum size: whole stratum kept
    out_all = mixing.sample_quota(ts, 100)
    assert out_all.count() == 60
    # rerun-stable: identical doc sets and ranks
    a = sorted((r.doc_id, r.sample_rank) for r in out.collect())
    b = sorted(
        (r.doc_id, r.sample_rank)
        for r in mixing.sample_quota(ts, 7).collect()
    )
    assert a == b
    # ranks are 1..n within each source
    for src in ("web", "wiki", "books"):
        ranks = sorted(
            r.sample_rank for r in out.collect() if r.source == src
        )
        assert ranks == list(range(1, 8))


def test_sample_quota_is_prefix_stable(spark):
    """Carving a bigger quota keeps the smaller quota's picks (hash
    order is fixed): quota n is a prefix of quota n+k per source."""
    seqs = [[i] * 5 for i in range(40)]
    ts = _mkdf(spark, seqs)
    small = {r.doc_id for r in mixing.sample_quota(ts, 5).collect()}
    big = {r.doc_id for r in mixing.sample_quota(ts, 12).collect()}
    assert small < big


# ---------------------------------------------------------------------------
# count-min sketch (operators/sketch.py CMS section)
# ---------------------------------------------------------------------------

def _py_cms(pairs, width):
    """Pure-python witness: counters and min-of-d estimates."""
    cnt = {}
    for t, w in pairs:
        for r in range(sketch.CMS_D):
            x = (t * sketch.CMS_AS[r] + sketch.HLL_B) % sketch.HLL_P
            h = ((x % 2147483647) ** 2 + x) % sketch.HLL_P
            cnt[(r, h % width)] = cnt.get((r, h % width), 0) + w
    def est(t):
        vals = []
        for r in range(sketch.CMS_D):
            x = (t * sketch.CMS_AS[r] + sketch.HLL_B) % sketch.HLL_P
            h = ((x % 2147483647) ** 2 + x) % sketch.HLL_P
            vals.append(cnt.get((r, h % width), 0))
        return min(vals)
    return cnt, est


def _stream_df(spark, pairs):
    return spark.createDataFrame(pairs, schema="t long, w long")


@given(
    st.lists(
        st.tuples(st.integers(0, 5000), st.integers(1, 40)),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([16, 64]),
)
@settings(max_examples=8, deadline=None)
def test_cms_matches_python_witness_and_overestimates(spark, pairs, width):
    cnt, est = _py_cms(pairs, width)
    exact = {}
    for t, w in pairs:
        exact[t] = exact.get(t, 0) + w
    df = _stream_df(spark, pairs)
    got = {
        (r.r, r.b): r.cnt
        for r in sketch.cms_counters(df, width=width).collect()
    }
    assert got == cnt
    topk = sketch.cms_topk(df, k=len(exact), width=width).collect()
    assert len(topk) == len(exact)
    for row in topk:
        assert row.exact_freq == exact[row.token]
        assert row.cms_est == est(row.token)
        assert row.cms_est >= row.exact_freq  # one-sided CMS guarantee


def test_cms_counters_merge_by_sum(spark):
    pairs = [(t % 97, 1 + t % 5) for t in range(400)]
    whole = {
        (r.r, r.b): r.cnt
        for r in sketch.cms_counters(_stream_df(spark, pairs)).collect()
    }
    merged: dict = {}
    for half in (pairs[:200], pairs[200:]):
        for r in sketch.cms_counters(_stream_df(spark, half)).collect():
            merged[(r.r, r.b)] = merged.get((r.r, r.b), 0) + r.cnt
    assert merged == whole


def test_cms_narrow_width_overcounts_but_ranks_hitters(spark):
    # 64 distinct keys into width 16: collisions are guaranteed, so some
    # estimate strictly exceeds its exact count — yet the two planted
    # heavy keys must still lead the top-k (est >= exact ranks them
    # above any background key's inflated estimate only if separation
    # holds; weight 500 vs background <= 5*16 noise bound keeps it).
    pairs = [(t, 1 + t % 5) for t in range(64)] + [(7, 500), (23, 500)]
    df = _stream_df(spark, pairs)
    rows = sketch.cms_topk(df, k=4, width=16).collect()
    assert {rows[0].token, rows[1].token} == {7, 23}
    all_rows = sketch.cms_topk(df, k=64, width=16).collect()
    assert any(r.cms_est > r.exact_freq for r in all_rows)
    assert all(r.cms_est >= r.exact_freq for r in all_rows)
