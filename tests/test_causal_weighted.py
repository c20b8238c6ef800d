"""W7 causal (trailing) framing + W2 weighted histograms + A6 summary."""

from __future__ import annotations

import math

import pytest

from audio_feature_extraction_spark.core.config import FrameSpec
from audio_feature_extraction_spark.core.schemas import TOKEN_SEQUENCES
from audio_feature_extraction_spark.operators import framing

SPEC = FrameSpec(frame_len=16, hop=8)


def _mkdf(spark, seqs):
    return spark.createDataFrame(
        [(f"doc_{i}", t, len(t), "web") for i, t in enumerate(seqs)],
        schema=TOKEN_SEQUENCES,
    )


def test_trailing_frames_zero_lookahead(spark):
    """Frame f may only contain tokens at positions <= f*hop — the
    causal/streaming guarantee (design.md:594-609)."""
    seq = list(range(100, 140))
    df = _mkdf(spark, [seq])
    rows = framing.trailing_frame_table(df, SPEC).collect()
    for r in rows:
        horizon = r.frame_id * SPEC.hop
        assert all(tok - 100 <= horizon for tok in r.frame_tokens), r
        # covers exactly [max(0, horizon-15), horizon]
        lo = max(0, horizon - SPEC.frame_len + 1)
        assert list(r.frame_tokens) == [100 + p for p in range(lo, horizon + 1)]


def test_trailing_frames_match_future_deletion(spark):
    """Truncating the future tokens must not change any already-emitted
    frame (the framing-level zero-leakage property)."""
    seq = list(range(40))
    cut = 25  # keep frames whose horizon < cut
    full = {
        r.frame_id: list(r.frame_tokens)
        for r in framing.trailing_frame_table(_mkdf(spark, [seq]), SPEC).collect()
    }
    trunc = {
        r.frame_id: list(r.frame_tokens)
        for r in framing.trailing_frame_table(_mkdf(spark, [seq[:cut]]), SPEC).collect()
    }
    for fid, toks in trunc.items():
        assert full[fid] == toks


def test_triangle_weights_shape():
    w = framing.triangle_weights(16)
    assert len(w) == 15
    assert w == [1, 2, 3, 4, 5, 6, 7, 8, 7, 6, 5, 4, 3, 2, 1]
    assert framing.triangle_weights(5) == [1, 2, 2, 1]


def test_weighted_features_python_oracle(spark):
    seq = list(range(500, 540))
    df = _mkdf(spark, [seq])
    got = {
        r.frame_id: list(r.features)
        for r in framing.frame_features_weighted_sql(df, SPEC).collect()
    }
    w = framing.triangle_weights(SPEC.frame_len)
    for fid in got:
        fr = seq[fid * SPEC.hop : fid * SPEC.hop + SPEC.frame_len]
        counts = [0] * SPEC.n_buckets
        for i in range(len(fr) - 1):
            b = (fr[i] * SPEC.bigram_mult + fr[i + 1]) % SPEC.n_buckets
            counts[b] += w[i]
        db = [20.0 * math.log10(max(c, SPEC.amin)) for c in counts]
        floor = max(db) - SPEC.top_db
        exp = [max(d, floor) for d in db]
        assert got[fid] == pytest.approx(exp, rel=1e-12)


def test_dataset_summary(spark):
    df = _mkdf(spark, [list(range(40)), list(range(10))])
    s = framing.dataset_summary(framing.frame_features_flat(df, SPEC)).collect()[0]
    assert s.n_docs == 2
    assert s.n_frames == SPEC.n_frames(40) + SPEC.n_frames(10)
    assert s.n_feature_widths == 1 and s.feature_width == SPEC.n_buckets
