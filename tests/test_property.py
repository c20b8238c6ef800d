"""Property-based tests (hypothesis) — the kernel against the naive
oracle across randomized shapes, plus streaming-recurrence equivalence.

Kernel-level (no Spark session): hundreds of examples per run.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from audio_feature_extraction_spark.core.config import FrameSpec
from audio_feature_extraction_spark.operators.framing import featurize_batch
from audio_feature_extraction_spark.streaming.stream import _emit_frames

from tests import oracle

specs = st.sampled_from(
    [FrameSpec(16, 8), FrameSpec(16, 16), FrameSpec(16, 4), FrameSpec(5, 3),
     FrameSpec(2, 1), FrameSpec(7, 7)]
)
token_arrays = st.lists(
    st.lists(st.integers(min_value=0, max_value=32767), min_size=0, max_size=80),
    min_size=1,
    max_size=6,
)


@settings(max_examples=150, deadline=None)
@given(docs=token_arrays, spec=specs)
def test_kernel_matches_naive_oracle(docs, spec):
    ids = np.array([f"d{i}" for i in range(len(docs))], dtype=object)
    arrays = [np.asarray(d, dtype=np.int32) for d in docs]
    out = featurize_batch(ids, arrays, spec)
    got = {}
    for _, row in out.iterrows():
        got.setdefault(row["doc_id"], []).append(row)
    for i, d in enumerate(docs):
        exp = oracle.frame_features(d, spec.frame_len, spec.hop)
        rows = sorted(got.get(f"d{i}", []), key=lambda r: r["frame_id"])
        assert len(rows) == len(exp)
        for r, e in zip(rows, exp):
            assert list(r["frame_tokens"]) == e["frame_tokens"]
            np.testing.assert_allclose(
                list(r["features"]), e["features"], rtol=1e-12
            )
            np.testing.assert_allclose(r["stat_mean"], e["stats"]["mean"], rtol=1e-12)
            np.testing.assert_allclose(r["stat_std"], e["stats"]["std"], rtol=1e-9)
            assert r["stat_min"] == e["stats"]["min"]
            assert r["stat_max"] == e["stats"]["max"]


@settings(max_examples=150, deadline=None)
@given(
    tokens=st.lists(st.integers(0, 32767), min_size=1, max_size=120),
    spec=specs,
    chunks=st.lists(st.integers(1, 17), min_size=1, max_size=8),
)
def test_streaming_recurrence_equals_batch(tokens, spec, chunks):
    """Feeding arbitrary chunk splits through the stateful recurrence and
    flushing yields exactly the batch frame grid."""
    pos, tail, nf = 0, [], 0
    emitted = []
    i = 0
    for c in chunks:
        if i >= len(tokens):
            break
        buf = tail + tokens[i : i + c]
        i += c
        frames, pos, tail, nf = _emit_frames(buf, pos, nf, spec, flush=False)
        emitted.extend(frames)
    # feed remainder + flush
    buf = tail + tokens[i:]
    frames, _, _, _ = _emit_frames(buf, pos, nf, spec, flush=True)
    emitted.extend(frames)
    exp = oracle.frames(tokens, spec.frame_len, spec.hop)
    assert [f for _, f in sorted(emitted)] == exp


@settings(max_examples=150, deadline=None)
@given(
    tokens=st.lists(st.integers(0, 32767), min_size=1, max_size=120), spec=specs
)
def test_roundtrip_property(tokens, spec):
    frs = oracle.frames(tokens, spec.frame_len, spec.hop)
    assert oracle.reconstruct(frs, spec.frame_len, spec.hop) == tokens


# ---------------------------------------------------------------------------
# FLAC codec round-trip property (multimodal/flac.py)
# ---------------------------------------------------------------------------

flac_signals = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600
)
flac_modes = st.sampled_from(
    [("verbatim", 6), ("fixed1", 4), ("fixed2", None), ("lpc1", None)]
)


@settings(max_examples=60, deadline=None)
@given(sig=flac_signals, mode=flac_modes, block=st.sampled_from([64, 192, 600]))
def test_flac_roundtrip_property(sig, mode, block):
    from audio_feature_extraction_spark.multimodal.flac import (
        decode_flac,
        encode_flac,
    )

    subframe, rp = mode
    x = np.asarray(sig, dtype=np.int64)
    if subframe in ("fixed1", "lpc1") and len(x) <= 1:
        x = np.concatenate([x, [0]])
    if subframe == "fixed2" and len(x) <= 2:
        x = np.concatenate([x, [0, 0]])
    payload = encode_flac(x, 16000, subframe=subframe, rice_param=rp,
                          block_size=block)
    out, sr = decode_flac(payload)
    back = np.round(out * 32768).astype(np.int64)
    assert sr == 16000
    assert np.array_equal(back, x)
